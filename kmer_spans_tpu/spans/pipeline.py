"""Single-chip flagship span pipeline with sparse device→host extraction.

Production shape of the count→rank→scan→span-call flow:

  * ONE jitted program computes codes, spectrum, integer-mass ranks, the
    max-plus scan, AND compacts the result to fixed-size outputs:
      - per-block summaries (max S, boundary S, any-scored) for
        host-side candidate-run discovery, and
      - a top-C gather of the blocks belonging to the highest-scoring
        *positive runs* (segmented run-max scans, forward+backward), with
        their per-position rank mass / scored / valid flags.
  * the host then replays ONLY the candidate blocks sequentially in f64
    (spans/extract.py semantics) — regions, first-argmax, jump-back
    rescans — without ever pulling O(n) arrays off the device.

Fixed shapes matter doubly here: XLA compiles once per (n, k), and the
driver environment pays seconds-to-minutes per distinct compiled program.

Rank values in this pipeline are mass/total (a single f64 division of the
exact integer cumulative mass) rather than the reference's sequential
f64 chain; they can differ from the chain in the last ulp.  The api
"host"/"jax" exact backends reproduce the chain bit-for-bit; this fast
path is for throughput at scale (the positive/negative decision is exact
via integer comparison either way).

The default screen ("class") gathers a packed 4-bit rank UPPER BOUND per
position through the enumerated Pallas kernel (ops/gather.py, ~3x faster
than XLA's gather).  Because the max-plus scan is monotone in its inputs
this over-approximation can only ADD candidate blocks; emitted regions
are unchanged (exact integer-mass replay in the finisher).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np


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
):
    """Build the jitted device step.

    Returns fn(nbases u8 [n]; thr f32) -> dict of fixed-shape outputs.
    n must be a multiple of ``block``.  nbases encodes N as value 4.

    screen: "class" — packed 4-bit rank-upper-bound table gathered by the
    Pallas enumerated kernel (ops/gather.py; sound over-approximation,
    ~10x faster than XLA's gather; exact spans still come from the
    finisher's integer-mass replay).  "f32" — near-exact f32 rank gather
    via XLA.  "auto" — class for k <= PALLAS_CLASS_MAX_K, else f32.

    packed: return ONE flat int32 vector instead of a dict — the device
    tunnel pays ~30 ms latency per D2H pull, so the finisher inputs are
    fused: counts, total, bitcast f32 summaries, top_idx, bit-packed
    scored flags, and (k <= 8) 16-bit candidate codes instead of 32-bit
    mass (the host rebuilds exact mass from counts).  Decode with
    unpack_outputs.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.blocked import (
        blocked_codes,
        blocked_scan_summaries,
        blocked_scored,
    )
    from ..ops.gather import (
        PALLAS_CLASS_MAX_K,
        class_screen_scores,
        class_table_from_mass,
        prerolled_table,
    )
    from ..ops.pallas_kernels import PALLAS_COUNT_MAX_K, pallas_count_spectrum
    from ..parallel.pipeline import _rank_mass

    if screen == "auto":
        screen = "class" if k <= PALLAS_CLASS_MAX_K else "f32"

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
        codes = jnp.where(kmer_valid, codes, 0)
        size = 1 << (2 * k)
        if 4 <= k <= PALLAS_COUNT_MAX_K:
            counts = pallas_count_spectrum(codes, kmer_valid, k)
        else:
            counts = jnp.zeros(size, jnp.int32).at[codes].add(
                kmer_valid.astype(jnp.int32)
            )
        mass = _rank_mass(counts)
        total = jnp.sum(counts).astype(jnp.float32)
        if screen == "class":
            tabR = prerolled_table(class_table_from_mass(mass, total))
            s = class_screen_scores(tabR, codes, thr)
        else:
            s = (mass[codes].astype(jnp.float32) - thr * total) / total
        s = s.reshape(nb, block)
        codes = codes.reshape(nb, block)
        block_max, block_last = blocked_scan_summaries(s, scored)
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
        need = run_max
        top_need, top_idx = jax.lax.top_k(need, min(cand_blocks, nb))
        top_idx = jnp.sort(top_idx)
        sc_cand = scored[top_idx]
        if not packed:
            # exact integer mass only for candidate blocks (small gather)
            return {
                "counts": counts,
                "total": jnp.sum(counts),
                "block_last": block_last,
                "run_max": run_max,
                "top_idx": top_idx,
                "pm": mass[codes[top_idx]],
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
        if k <= 8:
            cc = codes[top_idx].astype(jnp.uint32).reshape(C, block // 2, 2)
            cand_words = cc[..., 0] | (cc[..., 1] << 16)
        else:
            cand_words = mass[codes[top_idx]].astype(jnp.uint32)
        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        # explicit int32 everywhere: under jax_enable_x64 (tests) parts
        # would otherwise promote the concat to int64
        return jnp.concatenate([
            counts.reshape(-1).astype(jnp.int32),
            jnp.sum(counts).reshape(1).astype(jnp.int32),
            bc(block_last.astype(jnp.float32)),
            bc(run_max.astype(jnp.float32)),
            top_idx.astype(jnp.int32),
            bc(sc_words.astype(jnp.uint32)).reshape(-1),
            bc(cand_words.astype(jnp.uint32)).reshape(-1),
        ])

    return fn


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


def unpack_outputs(vec, k: int, n: int, block: int, cand_blocks: int):
    """Decode make_span_pipeline(packed=True) output into the finisher dict.

    vec: the packed int32 device vector (pulled in ONE transfer here).
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

    counts = take(size)
    total = int(take(1)[0])
    block_last = take(nb).copy().view(np.float32)
    run_max = take(nb).copy().view(np.float32)
    top_idx = take(C)
    sc_words = take(C * (block // 32)).copy().view(np.uint32)
    scored = (
        (sc_words[:, None] >> np.arange(32, dtype=np.uint32)) & 1
    ).astype(bool).reshape(C, block)
    if k <= 8:
        cw = take(C * (block // 2)).copy().view(np.uint32)
        codes = np.stack([cw & 0xFFFF, cw >> 16], axis=-1).astype(
            np.int64).reshape(C, block)
        pm = host_rank_mass(counts)[codes]
    else:
        pm = take(C * block).copy().view(np.uint32).astype(
            np.int64).reshape(C, block)
    assert off == v.shape[0], (off, v.shape)
    return {
        "counts": counts,
        "total": total,
        "block_last": block_last,
        "run_max": run_max,
        "top_idx": top_idx,
        "pm": pm,
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
    margin: float | None = None,
    seq_id: int = 0,
) -> SpanPipelineResult:
    """Host finisher: candidate discovery on block summaries + exact replay.

    Pulls only the fixed-size outputs of make_span_pipeline.  Returns
    fallback=True when a candidate run was not fully covered by the top-C
    gather (caller should rerun via the exact api path).
    """
    run_max = np.asarray(out["run_max"])
    last = np.asarray(out["block_last"])
    top_idx = np.asarray(out["top_idx"])
    total = float(np.asarray(out["total"]))
    nb = run_max.shape[0]
    if margin is None:
        # cover the f32 tree-scan's accumulated rounding on long excursions
        margin = 1e-3 * (1.0 + abs(min_score))

    # candidate runs: maximal chains of blocks (linked by positive boundary)
    # whose run max could pass min_score
    linked = np.zeros(nb, bool)
    linked[1:] = last[:-1] > 0
    cand = run_max >= (min_score - margin)
    if not cand.any():
        return SpanPipelineResult(regions=[], fallback=False)
    # runs of candidacy: a run is a maximal stretch of blocks where cand
    # holds and consecutive blocks are linked OR adjacent-and-cand
    have = np.zeros(nb, bool)
    have[top_idx] = True
    if (cand & ~have).any():
        return SpanPipelineResult(regions=[], fallback=True)

    pos_in_pull = {int(bidx): i for i, bidx in enumerate(top_idx)}
    pm = np.asarray(out["pm"])
    scored = np.asarray(out["scored"])

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
        pm_flat = pm[rows].reshape(-1).astype(np.float64)
        sc_flat = scored[rows].reshape(-1)
        s_flat = np.where(sc_flat, pm_flat / total - thr, 0.0)
        base_pos = i * block  # 0-based position of first assembled entry
        regions.extend(
            _replay_stretch(
                s_flat, sc_flat, base_pos, min_width, min_score, seq_id,
                leading_positive=bool(last[i - 1] > 0) if i > 0 else False,
            )
        )
        i = j + 1
    return SpanPipelineResult(regions=regions, fallback=False)


def _replay_stretch(s, scored, base_pos, min_width, min_score, seq_id,
                    leading_positive=False):
    """Exact f64 replay over one assembled stretch (as spans/extract.py).

    leading_positive: S was positive entering this stretch — the excursion
    began in a block below the candidate threshold, which cannot happen for
    a run that could emit (its run_max would qualify the earlier block);
    treated as fallback-worthy but in practice means the excursion's
    emitting part starts here.  We conservatively replay from the stretch
    start in that case.
    """
    from .extract import extract_spans

    regs = extract_spans(s, scored, min_width, min_score, seq_id=seq_id)
    # shift from stretch-local 1-based coords to sequence coords
    return [(sid, beg + base_pos, end + base_pos, sc) for sid, beg, end, sc in regs]
