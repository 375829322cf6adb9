"""Single-chip flagship span pipeline with sparse device→host extraction.

Production shape of the count→rank→scan→span-call flow:

  * ONE jitted program computes codes, spectrum, integer-mass ranks, an
    INTEGER upper-bound screen scan, and compacts the result to
    fixed-size outputs:
      - per-block integer max-plus summaries (tA, tB, maxA, maxB) for
        host-side EXACT candidate-run discovery (composed in int64 — no
        floating-point margins anywhere in the screen), and
      - a top-C gather of the blocks belonging to the highest-scoring
        positive runs (f32 composition, ordering only), with their
        per-position codes / scored flags.
  * the host then replays ONLY the candidate blocks sequentially in f64
    (spans/extract.py semantics) — regions, first-argmax, jump-back
    rescans — without ever pulling O(n) arrays off the device.

SOUNDNESS (replaces round-1's heuristic f32 margins): screen scores are
integers s_int >= SCREEN_SCALE * s_true (ops/gather.py class_scores_int),
per-block summaries are exact int32, and the cross-block composition is
exact int64 on the host.  Since max-plus scans are monotone, every
composed block_max is a true upper bound on the reference's running
score — a block whose bound is below SCREEN_SCALE*min_score provably
emits nothing.  The device's f32 composition only orders the top-C
gather; if it mis-ranks and a needed block wasn't pulled, the host's
exact bound detects it and flags fallback (never silently drops).

Fixed shapes matter doubly here: XLA compiles once per (n, k), and the
driver environment pays seconds-to-minutes per distinct compiled program.

Reference parity: this is the device form of kmer_low_comp_regions
(src/kmer_spans.c:548-621); emitted spans replay the exact semantics of
kmer_regions (src/kmer_spans.c:243-307) from integer mass.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.blocked import SCREEN_NEG
from ..ops.gather import SCREEN_SCALE

#: host int64 "-inf" for composed B-parts
_NEG64 = -(1 << 62)


def _seg_max_combine(left, right):
    """Segmented running max: (m, r) pairs; r=1 resets the chain."""
    ml, rl = left
    mr, rr = right
    import jax.numpy as jnp

    m = jnp.where(rr > 0, mr, jnp.maximum(ml, mr))
    return m, jnp.maximum(rl, rr)


def make_span_pipeline(
    k: int,
    block: int = 8192,
    cand_blocks: int = 128,
    screen: str = "auto",
    packed: bool = False,
    class_bits: int = 4,
    packed_counts: bool = True,
):
    """Build the jitted device step.

    Returns fn(nbases u8 [n]; thr f32) -> fixed-shape outputs.
    n must be a multiple of ``block``.  nbases encodes N as value 4.

    screen: "class" — packed rank-upper-bound classes; for
    k <= FUSED_CLASS_MAX_K and block >= 1024 the gather AND the scan
    summaries run in ONE fused Pallas kernel (ops/screen_scan.py,
    0.23 ns/element vs 0.88 + 0.32 for the round-2 three-pass form),
    otherwise the fori-loop word-gather kernel.  "sort" — the k >= 10
    sort-based screen (ops/sortscreen.py): positions sort by code, run
    lengths give exact per-position counts, classes come from a
    count-value rank-upper-bound table — no 4^k table, no count
    scatter, no device argsort (~3x the fine screen at k=12).  "fine" —
    int16 4096-level table via XLA gather (any k; kept for streaming
    parity tests).  "auto" — class for k <= PALLAS_CLASS_MAX_K, else
    sort.  All yield integer upper-bound scores; exact spans always
    come from the finisher's rank-chain replay.

    class_bits (class screen only): 4 (default) or 2 — 2-bit classes
    halve the fused kernel's table rows (~2x screen throughput), still
    sound at any thr but only *effective* (negative screen drift) for
    thr >= ~0.7; coarse classes can only add candidate blocks.

    packed: return ONE flat int32 vector instead of a dict — the device
    tunnel pays ~30 ms latency per D2H pull, so the finisher inputs are
    fused: counts, total, int32 block summaries, top_idx, bit-packed
    scored flags, and candidate codes (16-bit pairs for k <= 8, int32
    words above; the host rebuilds exact mass from counts — requires
    k <= 13 so the host mass table stays <= 0.5 GB).  Decode with
    unpack_outputs.

    On the fused path with k <= 8, candidate codes travel as 2-BIT BASES
    (16 per word) plus one seed code per block, 8x smaller than 16-bit
    code pairs — D2H through the dev tunnel runs at ~35 MB/s, so at
    800 Mb this alone cuts ~0.25 s/rep.  The host rebuilds exact codes
    from the bases (every scored position's window is N-free, so the
    rebuild is exact where it matters).  The returned fn carries
    ``fn.packed_bases`` — pass it to unpack_outputs.

    packed_counts=False omits the 4^k spectrum from the packed vector
    (for k >= 10 it dominates the pull: 67 MB at k=12).  The caller must
    then supply exact host counts to finish_spans (e.g. via the native
    C++ counter, utils.native.count_spectrum — faster than pulling
    device counts through the tunnel); the device still computes its own
    spectrum internally for the screen table.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.blocked import (
        blocked_codes,
        blocked_scan_summaries_int,
        blocked_scored,
        compose_summaries_f32,
    )
    from ..ops.gather import (
        PALLAS_CLASS_MAX_K,
        class_scores_int,
        class_table_from_mass,
        fine_class_table,
        fine_scores_int,
        pallas_word_gather,
        prerolled_table,
        screen_thr_q,
        CLASS_BITS,
        CLASS_LEVELS,
    )
    from ..ops.pallas_kernels import PALLAS_COUNT_MAX_K, pallas_count_spectrum
    from ..ops.screen_scan import FUSED_CLASS_MAX_K, fused_screen_scan
    from ..parallel.pipeline import _rank_mass

    if screen == "auto":
        screen = "class" if k <= PALLAS_CLASS_MAX_K else "sort"
    if screen == "sort" and packed_counts:
        # the sort screen never materializes a 4^k spectrum on device;
        # the finisher replays from a host recount (utils.native)
        packed_counts = False
    if packed and packed_counts and k > 13:
        raise ValueError(
            "packed_counts requires k <= 13 (device spectrum pull); use "
            "packed_counts=False + host recount for larger k")
    will_fuse = (
        screen == "class" and 4 <= k <= FUSED_CLASS_MAX_K and block >= 1024
    )
    # candidate blocks always travel as 2-bit bases + a seed code when
    # block is 16-aligned (8x fewer candidate bytes at k <= 8, 16x above)
    packed_bases = packed and block % 16 == 0

    @jax.jit
    def fn(nbases, thr):
        n = nbases.shape[0]
        nb = n // block
        # elementwise phases (codes/screen) run on wide rows for vreg
        # efficiency; scan summaries + the candidate gather run at the
        # ``block`` granularity (smaller blocks pull fewer useless bytes
        # through the slow D2H path).  Both views share one flat layout,
        # so the reshapes are free.
        W = 8192 if n % 8192 == 0 and block < 8192 else block
        b2 = (nbases & 3).reshape(n // W, W)
        v2 = (nbases < 4).reshape(n // W, W)
        codes, kmer_valid = blocked_codes(b2, v2, k)
        scored = blocked_scored(v2, kmer_valid).reshape(nb, block)
        # codes stay RAW rolling codes (N maps to base 0): every consumer
        # masks by kmer_valid/scored, and raw low bits ARE the 2-bit bases
        # (code & 3 == base at that position), which the packed_bases
        # candidate pull ships to the host
        size = 1 << (2 * k)
        thr_q = screen_thr_q(thr)
        fuse = will_fuse
        if fuse:
            # ONE aug tensor (code | valid<<16 | scored<<17) feeds count,
            # screen and candidate pull — codes/kmer_valid fuse away into
            # its construction, halving peak HBM at multi-100Mb scale
            aug = (
                codes.reshape(nb, block)
                | (kmer_valid.reshape(nb, block).astype(jnp.int32) << 16)
                | (scored.astype(jnp.int32) << 17)
            )
            # materialize aug ONCE: without the barrier XLA rematerializes
            # the whole codes+aug chain into each of its three consumers
            # (count kernel, screen kernel, candidate gather), re-paying
            # ~0.12 ns/el per copy (benchmarks/phase_profile3.py)
            aug = jax.lax.optimization_barrier(aug)
            from ..ops.pallas_kernels import pallas_count_aug

            counts = pallas_count_aug(aug, k, tile=16384)
            mass = _rank_mass(counts)
            total = jnp.sum(counts).astype(jnp.float32)
            # grid tiles of ~256 rows (32K codes) hit the measured sweet
            # spot of the fused kernel (benchmarks/kernel_lab3d.py)
            sb = max(1, min(8, 256 // (block // 128)))
            while sb > 1 and nb % sb:
                sb //= 2
            tabR = prerolled_table(
                class_table_from_mass(mass, total, class_bits))
            tA, tB, maxA, maxB = fused_screen_scan(
                tabR, aug.reshape(-1), thr_q, class_bits=class_bits,
                block=block, sub_blocks=sb)
            codes = aug  # candidate rows are masked after the gather
        elif screen == "sort":
            from ..ops.sortscreen import sort_screen_scores

            counts = None
            s_int, total_kmers = sort_screen_scores(
                codes.reshape(-1), kmer_valid.reshape(-1),
                scored.reshape(-1), k, thr_q)
            codes = codes.reshape(nb, block)
            s_int = s_int.reshape(nb, block)
            tA, tB, maxA, maxB = blocked_scan_summaries_int(s_int, scored)
        else:
            if 4 <= k <= PALLAS_COUNT_MAX_K:
                counts = pallas_count_spectrum(
                    codes, kmer_valid, k, tile=16384)
            else:
                counts = jnp.zeros(size, jnp.int32).at[codes].add(
                    kmer_valid.astype(jnp.int32)
                )
            mass = _rank_mass(counts)
            total = jnp.sum(counts).astype(jnp.float32)
            if screen == "class":
                tabR = prerolled_table(class_table_from_mass(mass, total))
                words = pallas_word_gather(tabR, codes >> 3)
                nib = (words >> ((codes & 7) * CLASS_BITS)) \
                    & (CLASS_LEVELS - 1)
                s_int = class_scores_int(nib, thr_q)
            else:
                tab = fine_class_table(mass, total)
                s_int = fine_scores_int(tab[codes], thr_q)
            codes = codes.reshape(nb, block)
            s_int = s_int.reshape(nb, block)
            tA, tB, maxA, maxB = blocked_scan_summaries_int(s_int, scored)
        if counts is not None:
            total_kmers = jnp.sum(counts)
        block_max, block_last = compose_summaries_f32(tA, tB, maxA, maxB)
        # positive-run segmentation over blocks: a block chains to the
        # previous one if S was positive crossing the boundary
        linked = jnp.concatenate(
            [jnp.zeros((1,), bool), block_last[:-1] > 0]
        )
        reset = (~linked).astype(jnp.float32)
        fwd, _ = jax.lax.associative_scan(
            _seg_max_combine, (block_max, reset)
        )
        linked_next = jnp.concatenate([linked[1:], jnp.zeros((1,), bool)])
        reset_b = (~linked_next).astype(jnp.float32)
        bwd, _ = jax.lax.associative_scan(
            _seg_max_combine, (jnp.flip(block_max), jnp.flip(reset_b))
        )
        run_max = jnp.maximum(fwd, jnp.flip(bwd))

        # top-C blocks by run-aware neediness (ties broken by index order)
        top_need, top_idx = jax.lax.top_k(run_max, min(cand_blocks, nb))
        top_idx = jnp.sort(top_idx)
        sc_cand = scored[top_idx]
        if not packed:
            return {
                "counts": counts,
                "total": total_kmers,
                "tA": tA,
                "tB": tB,
                "maxA": maxA,
                "maxB": maxB,
                "top_idx": top_idx,
                "codes": codes[top_idx] & 0xFFFF if fuse
                else codes[top_idx],
                "scored": sc_cand,
            }
        C = sc_cand.shape[0]
        bits32 = jnp.arange(32, dtype=jnp.uint32)
        sc_words = jnp.sum(
            sc_cand.reshape(C, block // 32, 32).astype(jnp.uint32)
            << bits32[None, None, :],
            axis=-1,
            dtype=jnp.uint32,
        )
        cand = codes[top_idx] & 0xFFFF if fuse else codes[top_idx]
        if packed_bases:
            # 2-bit bases, 16/word, + the block's first full code as the
            # k-1 halo seed (unpack_outputs rebuilds exact codes)
            first_codes = cand[:, 0].astype(jnp.uint32)
            b16 = (cand & 3).astype(jnp.uint32).reshape(C, block // 16, 16)
            shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
            cand_words = jnp.concatenate([
                first_codes[:, None],
                jnp.sum(b16 << shifts, axis=-1, dtype=jnp.uint32),
            ], axis=1)
        elif k <= 8:
            cc = cand.astype(jnp.uint32).reshape(C, block // 2, 2)
            cand_words = cc[..., 0] | (cc[..., 1] << 16)
        else:
            cand_words = cand.astype(jnp.uint32)
        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        # explicit int32 everywhere: under jax_enable_x64 (tests) parts
        # would otherwise promote the concat to int64
        counts_part = (
            [counts.reshape(-1).astype(jnp.int32)] if packed_counts else []
        )
        return jnp.concatenate(counts_part + [
            total_kmers.reshape(1).astype(jnp.int32),
            tA.astype(jnp.int32),
            tB.astype(jnp.int32),
            maxA.astype(jnp.int32),
            maxB.astype(jnp.int32),
            top_idx.astype(jnp.int32),
            bc(sc_words.astype(jnp.uint32)).reshape(-1),
            bc(cand_words.astype(jnp.uint32)).reshape(-1),
        ])

    try:
        fn.packed_bases = packed_bases
    except AttributeError:  # PjitFunction may reject new attributes
        jitted = fn

        def fn(nbases, thr):  # noqa: F811 — thin dispatch wrapper
            return jitted(nbases, thr)

        fn.packed_bases = packed_bases
    # the resolved flag (sort screen forces it off): pass to unpack_outputs
    fn.packed_counts = packed_counts
    fn.screen = screen
    return fn


def make_wide_span_pipeline(k: int, block: int = 8192,
                            cand_blocks: int = 128):
    """Single-chip span pipeline for WIDE codes (16 <= k <= 23).

    BASELINE config 5 territory: past the reference's own MAX_K (k=16 is
    UB in src/kmer_spans.c:139, practical max 15), where a dense 4^k
    spectrum cannot exist anywhere (68 GB at k=17).  Codes live as
    (hi, lo) int32 pairs (ops/blocked.blocked_codes_wide), the screen is
    the 2-key sort screen (ops/sortscreen.sort_screen_scores_wide) —
    device memory stays O(n) — and the host finisher replays candidates
    from a SPARSE recount (oracle.count_spectrum_sparse or the native
    counter) through the exact f64 chain (stats.ranks.sparse_mass +
    chain_ranks_from_mass).

    fn(nbases u8 [n], thr f32) -> ONE packed int32 vector; decode with
    unpack_wide_outputs, finish with finish_wide_spans.  n must be a
    multiple of ``block``; block must be 16-aligned (candidates travel
    as 2-bit bases + TWO seed words per block).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.blocked import (
        WIDE_MAX_K,
        blocked_codes_wide,
        blocked_scan_summaries_int,
        blocked_scored,
        compose_summaries_f32,
    )
    from ..ops.gather import screen_thr_q
    from ..ops.sortscreen import sort_screen_scores_wide

    if not 16 <= k <= WIDE_MAX_K:
        raise ValueError(f"wide pipeline needs 16 <= k <= {WIDE_MAX_K}")
    if block % 16:
        raise ValueError("block must be a multiple of 16")

    @jax.jit
    def fn(nbases, thr):
        n = nbases.shape[0]
        nb = n // block
        W = 8192 if n % 8192 == 0 and block < 8192 else block
        b2 = (nbases & 3).reshape(n // W, W)
        v2 = (nbases < 4).reshape(n // W, W)
        hi, lo, kmer_valid = blocked_codes_wide(b2, v2, k)
        scored = blocked_scored(v2, kmer_valid).reshape(nb, block)
        thr_q = screen_thr_q(thr)
        s_int, total_kmers = sort_screen_scores_wide(
            hi.reshape(-1), lo.reshape(-1), kmer_valid.reshape(-1),
            k, thr_q)
        s_int = s_int.reshape(nb, block)
        tA, tB, maxA, maxB = blocked_scan_summaries_int(s_int, scored)

        block_max, block_last = compose_summaries_f32(tA, tB, maxA, maxB)
        linked = jnp.concatenate(
            [jnp.zeros((1,), bool), block_last[:-1] > 0])
        reset = (~linked).astype(jnp.float32)
        fwd, _ = jax.lax.associative_scan(
            _seg_max_combine, (block_max, reset))
        linked_next = jnp.concatenate([linked[1:], jnp.zeros((1,), bool)])
        reset_b = (~linked_next).astype(jnp.float32)
        bwd, _ = jax.lax.associative_scan(
            _seg_max_combine, (jnp.flip(block_max), jnp.flip(reset_b)))
        run_max = jnp.maximum(fwd, jnp.flip(bwd))
        _, top_idx = jax.lax.top_k(run_max, min(cand_blocks, nb))
        top_idx = jnp.sort(top_idx)

        C = top_idx.shape[0]
        sc_cand = scored[top_idx]
        bits32 = jnp.arange(32, dtype=jnp.uint32)
        sc_words = jnp.sum(
            sc_cand.reshape(C, block // 32, 32).astype(jnp.uint32)
            << bits32[None, None, :],
            axis=-1, dtype=jnp.uint32)
        # candidate payload: TWO seed words (hi0, lo0 — the k-1 halo
        # bases as one wide code) + the block's 2-bit bases, 16/word
        hi_c = hi.reshape(nb, block)[top_idx]
        lo_c = lo.reshape(nb, block)[top_idx]
        b16 = (lo_c & 3).astype(jnp.uint32).reshape(C, block // 16, 16)
        shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
        cand_words = jnp.concatenate([
            hi_c[:, 0:1].astype(jnp.uint32),
            lo_c[:, 0:1].astype(jnp.uint32),
            jnp.sum(b16 << shifts, axis=-1, dtype=jnp.uint32),
        ], axis=1)
        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        return jnp.concatenate([
            total_kmers.reshape(1).astype(jnp.int32),
            tA.astype(jnp.int32),
            tB.astype(jnp.int32),
            maxA.astype(jnp.int32),
            maxB.astype(jnp.int32),
            top_idx.astype(jnp.int32),
            bc(sc_words.astype(jnp.uint32)).reshape(-1),
            bc(cand_words.astype(jnp.uint32)).reshape(-1),
        ])

    return fn


def rebuild_codes_wide(cw: np.ndarray, k: int, block: int) -> np.ndarray:
    """Exact int64 rolling codes from wide packed candidate words.

    cw: [rows, 2 + block/16] uint32 — (hi0, lo0) seed pair + 2-bit
    bases, 16/word.  The seed is the block's first full code; its bits
    2t..2t+1 are the base t positions before the block start, exactly as
    rebuild_codes — but the code needs 2k <= 46 bits, so everything is
    int64 here.
    """
    rows = cw.shape[0]
    seed = (cw[:, 0].astype(np.int64) << 16) | cw[:, 1].astype(np.int64)
    bases = (
        (cw[:, 2:, None] >> (2 * np.arange(16, dtype=np.uint32))) & 3
    ).reshape(rows, block).astype(np.int64)
    ext = np.empty((rows, k - 1 + block), np.int64)
    ext[:, k - 1:] = bases
    for t in range(1, k):
        ext[:, k - 1 - t] = (seed >> (2 * t)) & 3
    codes = np.zeros((rows, block), np.int64)
    for t in range(k):
        codes |= ext[:, k - 1 - t:k - 1 - t + block] << (2 * t)
    return codes


def unpack_wide_outputs(vec, n: int, block: int, cand_blocks: int):
    """Decode make_wide_span_pipeline output into the finisher dict."""
    v = np.asarray(vec)
    nb = n // block
    C = min(cand_blocks, nb)
    off = 0

    def take(m):
        nonlocal off
        out = v[off:off + m]
        off += m
        return out

    total = int(take(1)[0])
    tA = take(nb)
    tB = take(nb)
    maxA = take(nb)
    maxB = take(nb)
    top_idx = take(C)
    sc_words = take(C * (block // 32)).copy().view(np.uint32)
    scored = (
        (sc_words[:, None] >> np.arange(32, dtype=np.uint32)) & 1
    ).astype(bool).reshape(C, block)
    cand_words = take(C * (2 + block // 16)).copy().view(
        np.uint32).reshape(C, 2 + block // 16)
    assert off == v.shape[0], (off, v.shape)
    return {
        "total": total,
        "tA": tA,
        "tB": tB,
        "maxA": maxA,
        "maxB": maxB,
        "top_idx": top_idx,
        "cand_words": cand_words,
        "scored": scored,
    }


def finish_wide_spans(
    out: dict,
    n: int,
    k: int,
    thr: float,
    min_width: int,
    min_score: float,
    spectrum,
    block: int = 8192,
    seq_id: int = 0,
) -> SpanPipelineResult:
    """Host finisher for the wide pipeline: sparse-exact replay.

    spectrum: (ucodes int64 ascending, ucounts, total) — e.g. from
    oracle.count_spectrum_sparse (host recount; the device never holds a
    spectrum at wide k).  Candidacy is the same exact int64 composition
    as finish_spans; candidate ranks come from stats.ranks.sparse_mass +
    chain_ranks_from_mass, bit-identical to the reference's f64 chain
    (src/kmer_spans.c:198-202) restricted to present codes.
    """
    from ..stats.ranks import chain_ranks_from_mass, sparse_mass
    from ..utils import native

    block_max, block_last = compose_summaries_exact(
        out["tA"], out["tB"], out["maxA"], out["maxB"])
    top_idx = np.asarray(out["top_idx"])
    nb = block_max.shape[0]
    linked = np.zeros(nb, bool)
    linked[1:] = block_last[:-1] > 0
    starts = np.nonzero(~linked)[0]
    run_of = np.cumsum(~linked) - 1
    run_max = np.maximum.reduceat(block_max, starts)[run_of]
    cand = run_max >= float(min_score) * SCREEN_SCALE
    if not cand.any():
        return SpanPipelineResult(regions=[], fallback=False)
    have = np.zeros(nb, bool)
    have[top_idx] = True
    if (cand & ~have).any():
        return SpanPipelineResult(regions=[], fallback=True)

    ucodes, ucounts, total = spectrum
    ucodes = np.asarray(ucodes, np.int64)
    pm_all, vhist, _ = sparse_mass(ucodes, ucounts)
    pos_in_pull = {int(b): i for i, b in enumerate(top_idx)}
    cand_words = np.asarray(out["cand_words"])
    scored = np.asarray(out["scored"])

    rows_all = sorted({pos_in_pull[b] for b in np.nonzero(cand)[0]})
    codes = np.zeros((scored.shape[0], block), np.int64)
    codes[rows_all] = rebuild_codes_wide(cand_words[rows_all], k, block)
    uniq = np.unique(codes[rows_all][scored[rows_all]])
    idx_u = np.minimum(np.searchsorted(ucodes, uniq),
                       max(len(ucodes) - 1, 0))
    ranks_u = chain_ranks_from_mass(pm_all[idx_u], vhist, total)

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
        c_flat = codes[rows].reshape(-1)
        sc_flat = scored[rows].reshape(-1)
        qi = np.minimum(np.searchsorted(uniq, c_flat),
                        max(len(uniq) - 1, 0))
        s_flat = np.where(sc_flat, ranks_u[qi] - thr, 0.0)
        base_pos = i * block
        rep = (native.replay_scores(
            s_flat, sc_flat, min_width, min_score, base_pos)
            if native.available() else None)
        if rep is not None:
            regions.extend(
                (seq_id, int(bv), int(ev), float(sv))
                for bv, ev, sv in zip(*rep))
        else:
            regions.extend(_replay_stretch(
                s_flat, sc_flat, base_pos, min_width, min_score, seq_id))
        i = j + 1
    return SpanPipelineResult(regions=regions, fallback=False)


def quantize_weight_table(weights, threshold: float, block: int):
    """Sound integer upper-bound screen table for ARBITRARY f64 weights.

    Returns (w_q int32 [4^k], scale): w_q[c]/scale >= weights[c] - threshold
    always (floor(s*scale)+2 covers the f64 product rounding), with scale a
    power of two chosen so within-block int32 sums cannot overflow
    (scale * max|s| * block < 2^26).  The device screens with w_q; the
    host replays candidates from the exact f64 weights.
    """
    s = np.asarray(weights, dtype=np.float64) - threshold
    maxabs = float(np.max(np.abs(s))) if s.size else 0.0
    if maxabs <= 0.0:
        return np.full(s.shape, 2, np.int32), 1.0
    e = int(np.floor(np.log2((1 << 26) / (block * maxabs))))
    e = max(min(e, 20), -40)
    scale = 2.0 ** e
    w_q = np.floor(s * scale) + 2.0
    return w_q.astype(np.int32), scale


def make_weight_span_pipeline(
    k: int,
    block: int = 4096,
    cand_blocks: int = 128,
    with_scan_counts: bool = False,
):
    """Sparse device pipeline for ARBITRARY-weight span calling
    (reference kmer_regions, src/kmer_spans.c:490-546).

    fn(nbases u8 [n], w_q i32 [4^k]) -> dict of block summaries, top-C
    candidate codes/scored masks, and (optionally) the scan-count
    histogram over scored positions.  NOTHING O(n) crosses the tunnel:
    the round-2 jax backend pulled the full codes array
    (round-1 weak #4); this is the same sparse screen-then-replay
    discipline as the rank pipeline, with the integer screen built from
    quantize_weight_table (sound for any weights, any sign).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.blocked import (
        blocked_codes,
        blocked_scan_summaries_int,
        blocked_scored,
        compose_summaries_f32,
    )
    from ..ops.pallas_kernels import PALLAS_COUNT_MAX_K, pallas_count_spectrum

    @jax.jit
    def fn(nbases, wq):
        n = nbases.shape[0]
        nb = n // block
        b2 = (nbases & 3).reshape(nb, block)
        v2 = (nbases < 4).reshape(nb, block)
        codes, kmer_valid = blocked_codes(b2, v2, k)
        scored = blocked_scored(v2, kmer_valid)
        codes = jnp.where(kmer_valid, codes, 0)
        s_int = wq[codes]
        tA, tB, maxA, maxB = blocked_scan_summaries_int(s_int, scored)
        block_max, block_last = compose_summaries_f32(tA, tB, maxA, maxB)
        linked = jnp.concatenate(
            [jnp.zeros((1,), bool), block_last[:-1] > 0])
        reset = (~linked).astype(jnp.float32)
        fwd, _ = jax.lax.associative_scan(
            _seg_max_combine, (block_max, reset))
        linked_next = jnp.concatenate([linked[1:], jnp.zeros((1,), bool)])
        reset_b = (~linked_next).astype(jnp.float32)
        bwd, _ = jax.lax.associative_scan(
            _seg_max_combine, (jnp.flip(block_max), jnp.flip(reset_b)))
        run_max = jnp.maximum(fwd, jnp.flip(bwd))
        _, top_idx = jax.lax.top_k(run_max, min(cand_blocks, nb))
        top_idx = jnp.sort(top_idx)
        out = {
            "tA": tA,
            "tB": tB,
            "maxA": maxA,
            "maxB": maxB,
            "top_idx": top_idx,
            "codes": codes[top_idx],
            "scored": scored[top_idx],
        }
        if with_scan_counts:
            if 4 <= k <= PALLAS_COUNT_MAX_K:
                out["scan_hist"] = pallas_count_spectrum(codes, scored, k)
            else:
                out["scan_hist"] = jnp.zeros(
                    1 << (2 * k), jnp.int32).at[codes].add(
                        scored.astype(jnp.int32))
        return out

    @jax.jit
    def pull(nbases, idx):
        """Post-candidacy exact pull (the tr caller's pattern): gather
        codes/scored rows for HOST-chosen block indices — candidacy at
        min_score <= 0 marks any positive excursion, which can exceed
        the speculative top-C; batched pulls remove that fallback
        (round-4 weak #8)."""
        n = nbases.shape[0]
        nb = n // block
        b2 = (nbases & 3).reshape(nb, block)
        v2 = (nbases < 4).reshape(nb, block)
        codes, kv = blocked_codes(b2, v2, k)
        scored = blocked_scored(v2, kv)
        codes = jnp.where(kv, codes, 0)
        return codes[idx], scored[idx]

    try:
        fn.pull = pull
    except AttributeError:  # PjitFunction may reject new attributes
        jitted = fn

        def fn(nbases, wq):  # noqa: F811 — thin dispatch wrapper
            return jitted(nbases, wq)

        fn.pull = pull
    return fn


def finish_weight_spans(
    out: dict,
    n: int,
    weights: np.ndarray,
    threshold: float,
    min_width: int,
    min_score: float,
    scale: float,
    block: int = 4096,
    seq_id: int = 0,
    scan_counts: np.ndarray | None = None,
    pull_fn=None,
    nbases_dev=None,
) -> SpanPipelineResult:
    """Host finisher for the arbitrary-weight pipeline: exact candidacy
    from int64-composed summaries, exact f64 replay from the ORIGINAL
    weights, reference scan-count parity (rescans double-counted).

    Candidacy is the intersection of two sound gates:
      * score: run_max >= floor(min_score*scale)-1 (vacuous when
        min_score <= 0, where any positive excursion can emit: > 0);
      * width: the run spans enough positions for max_pos - reg_beg to
        reach min_width (a positive run cannot extend past a block whose
        composed upper bound never goes positive).

    pull_fn/nbases_dev: the pipeline's ``.pull`` + the device genome —
    candidate blocks the speculative top-C missed are then fetched
    EXACTLY in batched device gathers (the tr caller's post-candidacy
    pattern) instead of flagging fallback; permissive gates
    (min_score <= 0, reference kmer_regions src/kmer_spans.c:490-546)
    stay on the device path at any candidate count.
    """
    block_max, block_last = compose_summaries_exact(
        out["tA"], out["tB"], out["maxA"], out["maxB"]
    )
    top_idx = np.asarray(out["top_idx"])
    nb = block_max.shape[0]
    linked = np.zeros(nb, bool)
    linked[1:] = block_last[:-1] > 0
    starts = np.nonzero(~linked)[0]
    run_of = np.cumsum(~linked) - 1
    run_max = np.maximum.reduceat(block_max, starts)[run_of]
    run_nblocks = (np.diff(np.concatenate([starts, [nb]])))[run_of]
    if min_score > 0:
        thresh = np.floor(min_score * scale) - 1
    else:
        thresh = 1  # any positive excursion could emit
    cand = (run_max >= thresh) & (run_nblocks * block > min_width)
    if not cand.any():
        return SpanPipelineResult(regions=[], fallback=False)
    have = np.zeros(nb, bool)
    have[top_idx] = True
    extra: dict[int, tuple] = {}
    missing = np.nonzero(cand & ~have)[0]
    if missing.size:
        if pull_fn is None or nbases_dev is None:
            return SpanPipelineResult(regions=[], fallback=True)
        import jax.numpy as jnp

        C = max(len(top_idx), 1)
        for s in range(0, missing.size, C):
            batch = missing[s:s + C]
            idxp = np.full(C, batch[0], np.int32)
            idxp[:batch.size] = batch
            c_, s_ = pull_fn(nbases_dev, jnp.asarray(idxp))
            c_, s_ = np.asarray(c_), np.asarray(s_)
            for j, b in enumerate(batch):
                extra[int(b)] = (c_[j], s_[j])

    pos_in_pull = {int(bidx): i for i, bidx in enumerate(top_idx)}
    codes = np.asarray(out["codes"])
    scored = np.asarray(out["scored"])
    w64 = np.asarray(weights, dtype=np.float64) - threshold

    from .extract import extract_spans

    def block_data(b):
        if b in extra:
            return extra[b]
        i = pos_in_pull[b]
        return codes[i], scored[i]

    size = w64.shape[0]
    regions = []
    i = 0
    while i < nb:
        if not cand[i]:
            i += 1
            continue
        j = i
        while j + 1 < nb and cand[j + 1]:
            j += 1
        pairs = [block_data(b) for b in range(i, j + 1)]
        c_flat = np.concatenate([p[0] for p in pairs])
        sc_flat = np.concatenate([p[1] for p in pairs])
        s_flat = np.where(sc_flat, w64[c_flat], 0.0)
        base_pos = i * block
        visits = None
        if scan_counts is not None:
            visits = np.zeros(s_flat.shape[0] + 1, dtype=np.int64)
        regs = extract_spans(s_flat, sc_flat, min_width, min_score,
                             seq_id=seq_id, visits_full=visits)
        regions.extend(
            (sid, beg + base_pos, end + base_pos, sc)
            for sid, beg, end, sc in regs
        )
        if scan_counts is not None:
            # the device histogram already counted every scored position
            # once; add only the EXTRA visits from jump-back rescans
            mult = np.cumsum(visits[:-1])
            extra = np.where(sc_flat, mult - 1, 0)
            sel = extra > 0
            if sel.any():
                scan_counts += np.bincount(
                    c_flat[sel], weights=extra[sel], minlength=size
                ).astype(np.int64)
        i = j + 1
    return SpanPipelineResult(regions=regions, fallback=False)


def host_rank_mass(counts: np.ndarray) -> np.ndarray:
    """Exact exclusive cumulative mass on the host (== device _rank_mass).

    Stable sort ties break by k-mer index ascending (SURVEY A.2 / glibc
    qsort_r parity); int64 so multi-Gb totals can't overflow.
    """
    counts = np.asarray(counts, dtype=np.int64)
    order = np.argsort(counts, kind="stable")
    excl = np.zeros(counts.shape[0], np.int64)
    excl[order] = np.concatenate([[0], np.cumsum(counts[order])[:-1]])
    return excl


def host_rank_chain(counts: np.ndarray, total: int) -> np.ndarray:
    """The reference's EXACT f64 sequential rank chain (bit-identity).

    rank[sorted[m]] = fl(... fl(fl(t_0 + t_1) + t_2) ... ) with
    t_j = counts[sorted[j]]/total — the same left-to-right f64 accumulation
    as src/kmer_spans.c:198-200.  Candidate replay gathers from THIS table
    so emitted span scores match the C reference bit for bit (mass/total
    differs by ~1 ulp of accumulation and was round-2 weak #4).

    Fast path for large spectra (k >= 10 tables dominate the finisher on
    weak hosts): the stable argsort runs on the narrowest unsigned dtype
    that holds max(counts) (numpy's stable integer sort is radix — passes
    scale with key width), and the sorted VALUES come from bincount +
    repeat instead of a 4^k gather.  Both transforms preserve order and
    per-element f64 terms exactly, so the result is bit-identical to
    oracle.weighted_ranks (asserted in tests/test_span_pipeline.py).
    """
    counts = np.asarray(counts)
    n = counts.shape[0]
    if total == 0:
        return np.zeros(n, dtype=np.float64)
    mx = int(counts.max()) if n else 0
    if n >= (1 << 20) and mx < (1 << 31):
        # sort-free native chain (value histogram + per-value cursors) —
        # bit-identical (tests/test_native.py), ~14x the numpy argsort
        # path at 4^12
        from ..utils import native

        nr = native.rank_chain(counts, total)
        if nr is not None:
            return nr
    key = counts
    for dt in (np.uint8, np.uint16, np.uint32):
        if mx < (1 << (8 * np.dtype(dt).itemsize)):
            key = counts.astype(dt)
            break
    order = np.argsort(key, kind="stable")
    if mx < (1 << 24):
        h = np.bincount(counts, minlength=mx + 1)
        sorted_vals = np.repeat(
            np.arange(mx + 1, dtype=np.float64), h)[:-1]
    else:
        sorted_vals = counts[order[:-1]].astype(np.float64)
    terms = sorted_vals / np.float64(total)
    ranks_sorted = np.empty(n, dtype=np.float64)
    ranks_sorted[0] = 0.0
    np.cumsum(terms, out=ranks_sorted[1:])
    ranks = np.empty_like(ranks_sorted)
    ranks[order] = ranks_sorted
    return ranks


def compose_summaries_exact(tA, tB, maxA, maxB, x0: int = 0):
    """EXACT int64 cross-block composition of integer screen summaries.

    Composition of transforms f_j(x) = max(x + tA_j, tB_j) for blocks
    0..i is (CA_i, CB_i) with CA = cumsum(tA) and
    CB_i = CA_i + max_{j<=i}(tB_j - CA_j); starting state x0 gives
    block_last = max(x0 + CA, CB) and
    block_max_i = max(block_last_{i-1} + maxA_i, maxB_i).

    Returns (block_max, block_last) int64 in SCREEN_SCALE units — true
    upper bounds on the scaled running score (exact integer arithmetic;
    valid to genome sizes ~1e12).
    """
    sent = SCREEN_NEG // 2
    tA = np.asarray(tA, np.int64)
    tB = np.where(np.asarray(tB) <= sent, _NEG64, np.asarray(tB, np.int64))
    maxA = np.asarray(maxA, np.int64)
    maxB = np.where(
        np.asarray(maxB) <= sent, _NEG64, np.asarray(maxB, np.int64)
    )
    CA = np.cumsum(tA)
    CB = CA + np.maximum.accumulate(tB - CA)
    block_last = np.maximum(np.int64(x0) + CA, CB)
    x_in = np.concatenate([[np.int64(x0)], block_last[:-1]])
    block_max = np.maximum(x_in + maxA, maxB)
    return block_max, block_last


def rebuild_codes(cw: np.ndarray, k: int, block: int) -> np.ndarray:
    """Exact rolling codes from packed candidate words (vectorized host).

    cw: [rows, 1 + block/16] uint32 — seed code + 2-bit bases, 16/word.
    Valid at every scored position (its whole k-window is real bases).
    """
    rows = cw.shape[0]
    first_codes = cw[:, 0]
    bases = (
        (cw[:, 1:, None] >> (2 * np.arange(16, dtype=np.uint32))) & 3
    ).reshape(rows, block).astype(np.int32)
    # ext[:, k-1+j] = base at block position j; ext[:, k-1-t] = halo
    # base t positions before the block (bits 2t..2t+1 of the seed)
    ext = np.empty((rows, k - 1 + block), np.int32)
    ext[:, k - 1:] = bases
    for t in range(1, k):
        ext[:, k - 1 - t] = (first_codes >> np.uint32(2 * t)) & 3
    codes = np.zeros((rows, block), np.int32)  # k <= 15 -> 30 bits
    for t in range(k):
        codes |= ext[:, k - 1 - t:k - 1 - t + block] << (2 * t)
    return codes


def unpack_outputs(vec, k: int, n: int, block: int, cand_blocks: int,
                   packed_bases: bool = False, packed_counts: bool = True,
                   lazy_codes: bool = False):
    """Decode make_span_pipeline(packed=True) output into the finisher dict.

    vec: the packed int32 device vector (pulled in ONE transfer here).
    packed_bases: pass the pipeline fn's ``packed_bases`` attribute —
    candidate blocks then arrive as 2-bit bases + a seed code and exact
    codes are rebuilt here (valid wherever ``scored`` is set: a scored
    position's whole k-window is real bases, so the rolling rebuild from
    raw bases reproduces the device's code exactly).
    lazy_codes (packed_bases only): skip the eager rebuild — the dict
    carries the raw ``cand_words`` and finish_spans decodes only the
    blocks that are actually candidates (via the native C replay when
    available, which never materializes a codes array at all).
    """
    v = np.asarray(vec)
    size = 1 << (2 * k)
    nb = n // block
    C = min(cand_blocks, nb)
    off = 0

    def take(m):
        nonlocal off
        out = v[off:off + m]
        off += m
        return out

    counts = take(size) if packed_counts else None
    total = int(take(1)[0])
    tA = take(nb)
    tB = take(nb)
    maxA = take(nb)
    maxB = take(nb)
    top_idx = take(C)
    sc_words = take(C * (block // 32)).copy().view(np.uint32)
    scored = (
        (sc_words[:, None] >> np.arange(32, dtype=np.uint32)) & 1
    ).astype(bool).reshape(C, block)
    cand_words = None
    if packed_bases:
        cw = take(C * (1 + block // 16)).copy().view(np.uint32).reshape(
            C, 1 + block // 16)
        if lazy_codes:
            cand_words = cw
            codes = None
        else:
            codes = rebuild_codes(cw, k, block)
    elif k <= 8:
        cw = take(C * (block // 2)).copy().view(np.uint32)
        codes = np.stack([cw & 0xFFFF, cw >> 16], axis=-1).astype(
            np.int64).reshape(C, block)
    else:
        codes = take(C * block).copy().view(np.uint32).astype(
            np.int64).reshape(C, block)
    assert off == v.shape[0], (off, v.shape)
    return {
        "counts": counts,
        "total": total,
        "tA": tA,
        "tB": tB,
        "maxA": maxA,
        "maxB": maxB,
        "top_idx": top_idx,
        "codes": codes,
        "cand_words": cand_words,
        "scored": scored,
    }


@dataclasses.dataclass
class SpanPipelineResult:
    regions: list  # (seq_id, beg, end, score)
    fallback: bool  # True if candidate capacity overflowed


def finish_spans(
    out: dict,
    n: int,
    thr: float,
    min_width: int,
    min_score: float,
    block: int = 8192,
    seq_id: int = 0,
    counts: np.ndarray | None = None,
) -> SpanPipelineResult:
    """Host finisher: exact candidate discovery + exact replay.

    Composes the integer block summaries in int64 (sound upper bound on
    every block's running-score max — see module docstring), assembles
    candidate stretches, and replays them in exact f64 from integer mass.
    Returns fallback=True when a candidate run was not fully covered by
    the top-C gather (caller should rerun via the exact api path).

    counts: exact host spectrum overriding out["counts"] — required when
    the pipeline ran with packed_counts=False (the caller recounts on the
    host, e.g. utils.native.count_spectrum, instead of pulling 4^k
    device words through the tunnel).
    """
    block_max, block_last = compose_summaries_exact(
        out["tA"], out["tB"], out["maxA"], out["maxB"]
    )
    top_idx = np.asarray(out["top_idx"])
    total = int(np.asarray(out["total"]))
    nb = block_max.shape[0]

    # exact candidacy, RUN-aware: blocks chain into a run while the screen
    # score stays positive across the boundary; all blocks of a run whose
    # max could reach min_score are needed (the exact replay must start at
    # the excursion start, where true S provably == 0: the block before a
    # run start has screen block_last <= 0, and 0 <= S_true <= S_screen).
    # (int64 <-> f64 comparison exact below 2^53.)
    linked = np.zeros(nb, bool)
    linked[1:] = block_last[:-1] > 0
    starts = np.nonzero(~linked)[0]
    run_of = np.cumsum(~linked) - 1
    run_max = np.maximum.reduceat(block_max, starts)[run_of]
    cand = run_max >= float(min_score) * SCREEN_SCALE
    if not cand.any():
        return SpanPipelineResult(regions=[], fallback=False)
    have = np.zeros(nb, bool)
    have[top_idx] = True
    if (cand & ~have).any():
        return SpanPipelineResult(regions=[], fallback=True)

    pos_in_pull = {int(bidx): i for i, bidx in enumerate(top_idx)}
    codes = out["codes"] if out["codes"] is None else np.asarray(
        out["codes"])
    cand_words = out.get("cand_words")
    scored = np.asarray(out["scored"])
    if counts is None:
        counts = out["counts"]
    if counts is None:
        raise ValueError(
            "finish_spans needs exact counts: pipeline ran with "
            "packed_counts=False — pass counts= (host recount)")
    # bit-identical replay scores: gather the reference's f64 rank CHAIN
    from ..utils import native

    size = len(counts)
    k = (size.bit_length() - 1) // 2  # len(counts) == 4^k
    ranks = None
    rank_lookup = None
    if size >= (1 << 26) and native.available():
        # k >= 13: a 4^k f64 chain table is 0.5-8 GB and even the
        # sort-free native chain is miss-bound filling it (3.6 s at
        # 4^13) — instead compute exact chain ranks for just the
        # candidate codes (native mass pass + native streaming fold;
        # bit-identical, tests/test_native.py)
        if codes is None:
            rows_all = sorted(
                {pos_in_pull[b] for b in np.nonzero(cand)[0]})
            cw_all = rebuild_codes(cand_words[rows_all], k, block)
            codes = np.zeros((scored.shape[0], block), np.int64)
            codes[rows_all] = cw_all
        uniq = np.unique(np.asarray(codes)[scored])
        pm, vv, vn = native.mass_of_codes(counts, uniq)
        from ..stats.ranks import chain_ranks_from_mass

        ranks_u = chain_ranks_from_mass(pm, (vv, vn), total)

        def rank_lookup(c_flat):
            # junk (unscored) codes may miss uniq: clip — callers mask
            idx = np.minimum(np.searchsorted(uniq, c_flat),
                             max(len(uniq) - 1, 0))
            return ranks_u[idx]
    else:
        ranks = host_rank_chain(counts, total)
    use_native = False
    if codes is None:
        use_native = native.available()
        if not use_native:
            codes = rebuild_codes(cand_words, k, block)

    # assemble maximal stretches of consecutive candidate blocks
    regions = []
    i = 0
    while i < nb:
        if not cand[i]:
            i += 1
            continue
        j = i
        while j + 1 < nb and cand[j + 1]:
            j += 1
        # stretch blocks [i, j]; assemble s and scored
        rows = [pos_in_pull[b] for b in range(i, j + 1)]
        sc_rows = scored[rows]
        base_pos = i * block  # 0-based position of first assembled entry
        if use_native:
            beg, end, sc = native.replay_packed(
                cand_words[rows], sc_rows, block, k, ranks, thr,
                min_width, min_score, base_pos)
            regions.extend(
                (seq_id, int(b), int(e), float(s))
                for b, e, s in zip(beg, end, sc)
            )
        else:
            c_flat = codes[rows].reshape(-1)
            sc_flat = sc_rows.reshape(-1)
            pos_ranks = (rank_lookup(c_flat) if rank_lookup is not None
                         else ranks[c_flat])
            s_flat = np.where(sc_flat, pos_ranks - thr, 0.0)
            rep = (native.replay_scores(
                s_flat, sc_flat, min_width, min_score, base_pos)
                if native.available() else None)
            if rep is not None:
                regions.extend(
                    (seq_id, int(bv), int(ev), float(sv))
                    for bv, ev, sv in zip(*rep))
            else:
                regions.extend(
                    _replay_stretch(
                        s_flat, sc_flat, base_pos, min_width, min_score,
                        seq_id,
                    )
                )
        i = j + 1
    return SpanPipelineResult(regions=regions, fallback=False)


def _replay_stretch(s, scored, base_pos, min_width, min_score, seq_id):
    """Exact f64 replay over one assembled stretch (as spans/extract.py)."""
    from .extract import extract_spans

    regs = extract_spans(s, scored, min_width, min_score, seq_id=seq_id)
    # shift from stretch-local 1-based coords to sequence coords
    return [(sid, beg + base_pos, end + base_pos, sc) for sid, beg, end, sc in regs]
