"""MXU-based spectrum counting: histogram as one-hot int8 matmuls.

XLA's TPU scatter-add serializes on duplicate indices (~0.3s for 50M
updates at k=8); the MXU turns the same histogram into dense matmul work:

    counts[hi, lo] = sum_i onehot_hi[i] (x) onehot_lo[i]
                   = OH^T @ OL,   OH: [M, 4^k/128] int8, OL: [M, 128] int8

with exact int32 accumulation (int8 MXU path).  Bandwidth floor is
M * (4^k/128 + 128) bytes for the one-hot materialization — ~32 GB for
50M bases at k=8, ~40 ms at HBM speed, an order of magnitude ahead of
scatter.  Only sensible for k <= 8 (the one-hot width grows as 4^k/128);
larger k stays on scatter/sort.

The row-group lax.scan keeps one small compiled body (same compile-time
rationale as ops/blocked.blocked_scan_prefixes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANES = 128


@functools.partial(jax.jit, static_argnames=("k", "rows_per_step"))
def mxu_count_spectrum(
    codes2d: jax.Array,
    kmer_valid: jax.Array,
    k: int,
    rows_per_step: int = 16,
):
    """Dense 4^k int32 spectrum from [nb, B] codes via one-hot matmuls."""
    size = 1 << (2 * k)
    if size < _LANES:
        # tiny spectra: scatter is fine and the decomposition degenerates
        idx = jnp.where(kmer_valid, codes2d, 0)
        return jnp.zeros(size, jnp.int32).at[idx].add(
            kmer_valid.astype(jnp.int32)
        )
    hi_n = size // _LANES
    nb, B = codes2d.shape
    R = min(rows_per_step, nb)
    pad = (-nb) % R
    if pad:
        codes2d = jnp.concatenate(
            [codes2d, jnp.zeros((pad, B), codes2d.dtype)])
        kmer_valid = jnp.concatenate(
            [kmer_valid, jnp.zeros((pad, B), bool)])
    G = codes2d.shape[0] // R
    c3 = codes2d.reshape(G, R * B)
    v3 = kmer_valid.reshape(G, R * B)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, hi_n), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def body(acc, xs):
        c, v = xs  # [M], [M]
        hi = (c >> 7)[:, None]
        lo = (c & (_LANES - 1))[:, None]
        oh = ((hi == iota_hi) & v[:, None]).astype(jnp.int8)
        ol = (lo == iota_lo).astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            oh, ol,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc, None

    acc0 = jnp.zeros((hi_n, _LANES), jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, (c3, v3))
    return acc.reshape(size)


@functools.partial(jax.jit, static_argnames=("rows_per_step",))
def mxu_gather_f32(
    table: jax.Array, codes2d: jax.Array, rows_per_step: int = 4
):
    """Table gather as one-hot MXU matmuls, f32-accurate via two bf16 limbs.

    out[i] = table[codes[i]].  The table is split t = hi + lo with
    hi = bf16(t), lo = bf16(t - hi); both limbs ride ONE widened matmul
    (lanes concatenated), recombined in f32 — relative error ~1e-7, vs
    XLA's native TPU gather which serializes to ~9 ns/element.  For
    tables up to 4^8 (one-hot height 4^k/128 <= 512).

    table: [size] float32 (size multiple of 128); codes2d: [nb, B] int32.
    """
    size = table.shape[0]
    hi_n = size // _LANES
    t32 = table.reshape(hi_n, _LANES).astype(jnp.float32)
    t_hi = t32.astype(jnp.bfloat16)
    t_lo = (t32 - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    t2 = jnp.concatenate([t_hi, t_lo], axis=1)  # [hi_n, 256]
    nb, B = codes2d.shape
    R = min(rows_per_step, nb)
    pad = (-nb) % R
    if pad:
        codes2d = jnp.concatenate(
            [codes2d, jnp.zeros((pad, B), codes2d.dtype)])
    G = codes2d.shape[0] // R
    c3 = codes2d.reshape(G, R * B)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, hi_n), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def body(_, c):
        hi = (c >> 7)[:, None]
        lo = (c & (_LANES - 1))[:, None]
        oh = (hi == iota_hi).astype(jnp.bfloat16)  # [M, hi_n]
        rows = jax.lax.dot_general(
            oh, t2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [M, 256]
        ol = (lo == iota_lo).astype(jnp.float32)
        vals = jnp.sum((rows[:, :_LANES] + rows[:, _LANES:]) * ol, axis=1)
        return None, vals

    _, v3 = jax.lax.scan(body, None, c3)
    return v3.reshape(-1, B)[:nb]
