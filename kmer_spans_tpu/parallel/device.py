"""Single-device execution helpers: host <-> device staging with padding.

Sequences are padded up to power-of-two-ish buckets so XLA compiles one
program per (bucket, k) instead of one per sequence length.  Padding bytes
are marked invalid (N-like), so they contribute nothing to counts, scores,
or scored masks by construction.
"""

from __future__ import annotations

import numpy as np

from ..encoding import PackedSeq
from ..ops.codes import kmer_codes
from ..ops.count import count_spectrum_scatter, count_spectrum_sort

_MIN_BUCKET = 4096


def bucket_size(n: int) -> int:
    b = _MIN_BUCKET
    while b < n:
        b *= 2
    return b


def _staged(p: PackedSeq):
    import jax.numpy as jnp

    nb = bucket_size(p.n)
    bases = np.zeros(nb, dtype=np.uint8)
    bases[: p.n] = p.bases
    valid = np.zeros(nb, dtype=bool)
    valid[: p.n] = p.valid
    return jnp.asarray(bases), jnp.asarray(valid)


def device_count_spectrum(packed: list[PackedSeq], k: int, strategy: str = "scatter"):
    """Accumulate the 4^k spectrum over sequences on device.

    Returns (counts int64 np [4^k], n_words int).  Sequences shorter than k
    are skipped (reference binding behavior, src/kmer_spans.c:478-479).
    """
    import jax.numpy as jnp

    count_fn = count_spectrum_sort if strategy == "sort" else count_spectrum_scatter
    total = None
    n_words = 0
    for p in packed:
        if p.n < k:
            continue
        bases, valid = _staged(p)
        codes, kv, _ = kmer_codes(bases, valid, k)
        c = count_fn(codes, kv, k)
        n_words += int(jnp.sum(kv))
        total = c if total is None else total + c
    if total is None:
        return np.zeros(1 << (2 * k), dtype=np.int64), 0
    return np.asarray(total).astype(np.int64), n_words


def device_codes_scored(p: PackedSeq, k: int):
    """Codes + scored mask for one sequence, trimmed back to its length."""
    bases, valid = _staged(p)
    codes, _, scored = kmer_codes(bases, valid, k)
    return np.asarray(codes)[: p.n], np.asarray(scored)[: p.n]


def device_window_dist(p: PackedSeq, tracked, k: int, window: int,
                       with_positions: bool, block: int = 8192):
    """Windowed k-mer distributions for one sequence (ops/window.py)."""
    import jax.numpy as jnp

    from ..ops.blocked import blocked_codes
    from ..ops.window import windowed_counts_device

    npad = -(-p.n // block) * block
    b = np.zeros(npad, dtype=np.uint8)
    b[: p.n] = p.bases
    v = np.zeros(npad, dtype=bool)
    v[: p.n] = p.valid
    b2 = jnp.asarray(b).reshape(-1, block).astype(jnp.int32)
    v2 = jnp.asarray(v).reshape(-1, block)
    codes, kv = blocked_codes(b2, v2, k)
    codes = jnp.where(kv, codes, 0)
    tr = jnp.asarray(np.asarray(tracked, dtype=np.int32))
    dist, cpos, _ = windowed_counts_device(
        codes, kv, v2, tr, k, window, with_positions=with_positions
    )
    dist_np = np.asarray(dist).astype(np.int64)
    cpos_np = None
    if with_positions:
        cpos_np = np.asarray(cpos)[:, : p.n].T.astype(np.int64)
    return dist_np, cpos_np


def device_tr_regions(p: PackedSeq, k: int, ks: np.ndarray, ts: np.ndarray,
                      min_length: int, seq_id: int, block: int = 8192,
                      cand_blocks: int = 128):
    """Transition-score regions for one sequence (spans/tr_pipeline).

    Candidate blocks pull their CODES; the host replays them from the
    original f64 tables, so emitted positions and scores are bit-identical
    to the reference (src/kmer_spans.c:329-395).  The device's screening
    tables are f32 rounded UP (toward +inf), so table quantization can
    only extend positive runs — screening stays conservative; only
    sub-2^-24-relative knife edges of the f32 scan itself could hide an
    excursion (flagged nowhere in practice; use backend="host" to avoid
    screening entirely).
    Returns (regions, fallback).
    """
    import jax.numpy as jnp

    from ..spans.tr_pipeline import finish_tr_spans, make_tr_pipeline

    nb = p.bases.copy()
    nb[~p.valid] = 4
    npad = -(-p.n // block) * block
    arr = np.full(npad, 4, np.uint8)
    arr[: p.n] = nb

    def up32(t):
        t32 = t.astype(np.float32)
        low = t32.astype(np.float64) < t
        t32[low] = np.nextafter(t32[low], np.float32(np.inf))
        return t32

    fn = make_tr_pipeline(k, block=block, cand_blocks=cand_blocks)
    out = fn(jnp.asarray(arr), jnp.asarray(up32(ks)), jnp.asarray(up32(ts)))
    res = finish_tr_spans(out, npad, min_length, ks, ts, block=block,
                          seq_id=seq_id)
    return res.regions, res.fallback
