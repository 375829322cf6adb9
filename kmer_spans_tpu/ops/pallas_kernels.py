"""Pallas TPU kernels for the spectrum-histogram hot path.

pallas_count_spectrum: the spectrum histogram as a fused one-hot MXU
matmul.  Per grid step a [T]-tile of codes becomes two one-hot matrices
IN VMEM (never materialized to HBM) and feeds the MXU:

    counts[hi, lo] += OHT[hi, t] @ OL2[t, lo]

int8 one-hots with int32 MXU accumulation are exact (products are 0/1
and per-step sums are <= T) and run the MXU at its int8 rate — measured
0.70 ns/element vs 0.84 for the bf16/f32 form at 4^8.  The int32 tile
accumulates across the whole grid (constant index_map).

LAYOUT IS THE WHOLE GAME: the hi one-hot is built [HI_N, T] (sublane
broadcast of the (1,T) code row — free) and the lo one-hot [T, 128]
(the (1,T) row reshaped to a (T,1) column first — a 2-vreg relayout),
so the contraction is a plain (HI_N,T)@(T,128) matmul.  The earlier
formulation built both one-hots as [*, T] and contracted dim 1 of both,
forcing Mosaic to materialize a (128,T)->(T,128) transpose every step —
measured 4.6x slower (benchmarks/count_bench.py: 1.67 ns/element vs
7.7 for XLA's scatter-add at 4^8).

Only for k <= PALLAS_COUNT_MAX_K (the [4^k/128, T] one-hot must fit
VMEM); larger k uses XLA scatter (ops/count.py).

Reference parity: replaces sequence_kmer_count's sequential increment
loop (src/kmer_spans.c:135-155).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
PALLAS_COUNT_MAX_K = 8  # (4^8/128, 4096) int8 one-hot = 2 MB VMEM


def _count_kernel(codes_ref, out_ref, acc_ref, *, hi_n, tile, aug=False):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = codes_ref[0]  # [1, T] int32; invalid encoded as -1
    if aug:
        # aug convention: bit 16 = kmer_valid, low 16 bits = code
        valid = (codes >> 16) & 1
        codes = jnp.where(valid == 1, codes & 0xFFFF, -1)
    hi = codes >> 7       # -1 stays -1: matches no one-hot row
    lo = (codes & (_LANES - 1)).reshape(tile, 1)  # [T, 1] column
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tile), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (tile, _LANES), 1)
    oht = (jnp.broadcast_to(hi, (hi_n, tile)) == iota_hi).astype(
        jnp.int8)  # [hi_n, T]
    ol2 = (jnp.broadcast_to(lo, (tile, _LANES)) == iota_lo).astype(
        jnp.int8)  # [T, 128]
    acc_ref[:] += jax.lax.dot_general(
        oht, ol2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(step == pl.num_programs(0) - 1)
    def _finish():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def pallas_count_spectrum(
    codes: jax.Array, kmer_valid: jax.Array, k: int, tile: int = 4096
):
    """Dense 4^k int32 spectrum from codes (any shape) + validity mask."""
    return pallas_histogram(codes, kmer_valid, 1 << (2 * k), tile=tile)


@functools.partial(jax.jit, static_argnames=("size", "tile"))
def pallas_histogram(
    values: jax.Array, valid: jax.Array, size: int, tile: int = 4096
):
    """Dense int32 histogram of ``values`` in [0, size) via the one-hot MXU
    matmul (same kernel as the spectrum count; the windowed engine uses it
    for (kmer, window-count) occurrence histograms).

    size must be a multiple of 128 (or < 128: scatter fallback).
    """
    if size < _LANES:
        idx = jnp.where(valid, values, 0)
        return jnp.zeros(size, jnp.int32).at[idx].add(
            valid.astype(jnp.int32)
        )
    if size % _LANES:
        raise ValueError("size must be a multiple of 128")
    kmer_valid = valid
    hi_n = size // _LANES
    flat = jnp.where(kmer_valid, values, -1).reshape(-1)
    return _histogram_flat(flat, size, hi_n, tile, aug=False)


def _count_aug_kernel(codes_ref, codes2_ref, out_ref, acc_ref, *, hi_n,
                      tile):
    """One-hot MXU histogram from aug codes, lo one-hot built from a
    SECOND (tile//128, 128)-shaped view of the same data: one (rows,128)
    transpose per tile + per-column sublane-broadcast compares replace
    the (1,T)->(T,1) lane-to-sublane relayout, which alone cost
    ~0.21 ns/element (benchmarks/kernel_lab3e/f: 0.463 vs 0.576)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = codes_ref[0]              # (1, tile)
    valid = (codes >> 16) & 1
    c = codes & 0xFFFF
    hi = jnp.where(valid == 1, c >> 7, -1)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tile), 0)
    oht = (jnp.broadcast_to(hi, (hi_n, tile)) == iota_hi).astype(jnp.int8)

    lo2d = codes2_ref[0] & (_LANES - 1)           # (tile//128, 128)
    loT = jnp.transpose(lo2d)                     # (128, tile//128)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    chunks = []
    for r in range(tile // _LANES):
        col = loT[:, r:r + 1]
        chunks.append(
            (jnp.broadcast_to(col, (_LANES, _LANES)) == iota_l).astype(
                jnp.int8))
    ol2 = jnp.concatenate(chunks, axis=0)         # (tile, 128)
    acc_ref[:] += jax.lax.dot_general(
        oht, ol2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(step == pl.num_programs(0) - 1)
    def _fin():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def pallas_count_aug(aug: jax.Array, k: int, tile: int = 32768):
    """Dense 4^k spectrum straight from aug codes (bit 16 = kmer_valid).

    Avoids materializing a separate codes/valid pair in HBM — the
    validity handling happens inside the kernel, so the span pipeline's
    single aug tensor feeds count, screen, and candidate pull (at 800 Mb
    that halves peak HBM).
    """
    size = 1 << (2 * k)
    if size < _LANES:
        raise ValueError("pallas_count_aug requires k >= 4")
    hi_n = size // _LANES
    flat = aug.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % tile
    if pad:
        # pad carries valid bit 0 -> counted nowhere
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    g = flat.shape[0] // tile
    counts2d = pl.pallas_call(
        functools.partial(_count_aug_kernel, hi_n=hi_n, tile=tile),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile // _LANES, _LANES),
                         lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hi_n, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_n, _LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((hi_n, _LANES), jnp.int32)],
        interpret=jax.default_backend() == "cpu",
    )(flat.reshape(g, 1, tile), flat.reshape(g, tile // _LANES, _LANES))
    return counts2d.reshape(size)


def _histogram_flat(flat, size, hi_n, tile, aug):
    n = flat.shape[0]
    pad = (-n) % tile
    # pad marks invalid: -1 codes (plain mode) / valid-bit-0 (aug mode)
    pad_val = 0 if aug else -1
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad,), pad_val, flat.dtype)])
    g = flat.shape[0] // tile
    # TPU block shapes: last two dims must be (8m, 128n) or the full array
    # dims — [g, 1, tile] with block (1, 1, tile) satisfies the latter
    flat = flat.reshape(g, 1, tile)
    counts2d = pl.pallas_call(
        functools.partial(_count_kernel, hi_n=hi_n, tile=tile, aug=aug),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hi_n, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_n, _LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((hi_n, _LANES), jnp.int32)],
        interpret=jax.default_backend() == "cpu",  # tests run on CPU
    )(flat)
    return counts2d.reshape(size)
