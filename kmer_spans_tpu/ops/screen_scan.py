"""Fused Pallas screen-gather + max-plus block summaries (the scan hot path).

One kernel pass per genome tile does, entirely in VMEM:

  1. unpack aug codes (bit 16 = kmer_valid, bit 17 = scored, low 16 = code);
  2. gather each position's packed rank class from the pre-rolled table
     via the enumerated sublane-window trick (ops/gather.py docstring);
     UNROLLED over table rows — 3.6x faster than the fori_loop form
     (benchmarks/kernel_lab3*.py: 0.23 vs 0.82 ns/element);
  3. integer upper-bound screen scores s = (cls+1)*unit + 3 - thr_q
     (ops/gather.py soundness family);
  4. per-8192-block max-plus summaries (tA, tB, maxA, maxB) via manual
     shifted-add scans — Mosaic lowers neither cumsum nor scalar extracts,
     so scans are explicit log-step shifted adds and every intermediate
     stays (rows, 128)-shaped (skinny (R,1) shapes crashed the compile
     helper; scalars extract as (1,1) slices broadcast to (1,128)).

Replaces the three-pass round-2 path (Pallas word gather -> HBM s_int ->
XLA scan summaries), which cost 0.88 + 0.32 ns/element; the fused kernel
measured 0.235 ns/element (4-bit classes, 64 rows) and 0.13 (2-bit, 32
rows) at 50M on v5e.

Reference parity: the scoring gather + scan recurrence of kmer_regions
(src/kmer_spans.c:268-270); candidates are replayed exactly by the host
finisher, so this kernel only screens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
INT_INF = 1 << 30

#: fused class screen supported up to this k (4-bit table rows = 4^k/1024;
#: k=8 -> 64-row unroll; k=9's 256-row unroll blows compile size)
FUSED_CLASS_MAX_K = 8


def _lane_cumsum(x):
    for d in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.concatenate(
            [jnp.zeros((x.shape[0], d), x.dtype), x[:, :-d]], axis=1)
    return x


def _lane_cummin(x):
    for d in (1, 2, 4, 8, 16, 32, 64):
        x = jnp.minimum(
            x,
            jnp.concatenate(
                [jnp.full((x.shape[0], d), INT_INF, x.dtype), x[:, :-d]],
                axis=1))
    return x


def _row_cumsum(x):
    d = 1
    while d < x.shape[0]:
        x = x + jnp.concatenate(
            [jnp.zeros((d, x.shape[1]), x.dtype), x[:-d]], axis=0)
        d *= 2
    return x


def _row_cummin(x):
    d = 1
    while d < x.shape[0]:
        x = jnp.minimum(
            x,
            jnp.concatenate(
                [jnp.full((d, x.shape[1]), INT_INF, x.dtype), x[:-d]],
                axis=0))
        d *= 2
    return x


def _summaries_fullwidth(a, sc):
    """(R,128) int32 scores (0 where unscored) + mask -> 4 (1,128) rows.

    Row-major flat order: A = flat cumsum, Bv = A - cummin(A at scored,
    else +inf); the block transform is x -> max(x + tA, tB), its running
    max from x is max(x + maxA, maxB) (ops/blocked.py algebra).
    """
    R = a.shape[0]
    Al = _lane_cumsum(a)
    rt = jnp.broadcast_to(Al[:, LANES - 1:LANES], (R, LANES))
    Rex = _row_cumsum(rt) - rt
    A = Al + Rex
    P = jnp.where(sc, A, jnp.int32(INT_INF))
    Ml = _lane_cummin(P)
    rm = jnp.broadcast_to(Ml[:, LANES - 1:LANES], (R, LANES))
    rme = _row_cummin(rm)
    rme = jnp.concatenate(
        [jnp.full((1, LANES), INT_INF, jnp.int32), rme[:-1]], axis=0)
    M = jnp.minimum(Ml, rme)
    Bv = A - M
    tA = A[R - 1:R, LANES - 1:LANES]
    tB = Bv[R - 1:R, LANES - 1:LANES]
    mA = jnp.max(jnp.max(A, axis=0, keepdims=True), axis=1, keepdims=True)
    mB = jnp.max(jnp.max(Bv, axis=0, keepdims=True), axis=1, keepdims=True)
    return tuple(jnp.broadcast_to(v, (1, LANES)) for v in (tA, tB, mA, mB))


@functools.partial(
    jax.jit,
    static_argnames=("class_bits", "block", "sub_blocks", "interpret"),
)
def fused_screen_scan(
    tabR: jax.Array,
    aug: jax.Array,
    thr_q: jax.Array,
    class_bits: int = 4,
    block: int = 8192,
    sub_blocks: int = 4,
    interpret: bool | None = None,
):
    """aug codes [n] -> (tA, tB, maxA, maxB) int32 [n/block].

    tabR: (8, rows, 128) pre-rolled packed class table
    (ops.gather.prerolled_table of class_table_from_mass).
    n must be a multiple of block * sub_blocks; block a power-of-two
    multiple of 128 (>= 256).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rows = tabR.shape[1]
    n = aug.shape[0]
    br = block // LANES
    BR = sub_blocks * br
    R_OUT = max(8, 4 * sub_blocks)
    epw = 32 // class_bits
    levels = 1 << class_bits
    unit = 4096 // levels
    sh_bits = epw.bit_length() - 1  # log2(entries per word)

    def kernel(codes_ref, thr_ref, tab_ref, out_ref):
        aug_ = codes_ref[0]
        sc = ((aug_ >> 17) & 1) == 1
        c = aug_ & 0xFFFF
        widx = c >> sh_bits
        lo = widx & (LANES - 1)
        row = widx >> 7
        p = jax.lax.broadcasted_iota(jnp.int32, (BR, LANES), 0) & 7
        sel = (row & ~7) | ((p - row) & 7)
        G = BR // 8
        los = [lo[8 * m:8 * m + 8] for m in range(G)]
        sels = [sel[8 * m:8 * m + 8] for m in range(G)]
        accs = [jnp.zeros((8, LANES), jnp.int32) for _ in range(G)]
        for j in range(rows):
            d, w = j & 7, j >> 3
            win = tab_ref[d, 8 * w:8 * w + 8, :]
            for m in range(G):
                g = jnp.take_along_axis(win, los[m], axis=1)
                accs[m] = jnp.where(sels[m] == j, g, accs[m])
        words = jnp.concatenate(accs, axis=0)
        nib = (words >> ((c & (epw - 1)) * class_bits)) & (levels - 1)
        s = (nib + 1) * unit + 3 - thr_ref[0, 0]
        a = jnp.where(sc, s, 0)
        for b in range(sub_blocks):
            tA, tB, mA, mB = _summaries_fullwidth(
                a[br * b:br * b + br], sc[br * b:br * b + br])
            for q, v in enumerate((tA, tB, mA, mB)):
                i = q * sub_blocks + b
                out_ref[0, i:i + 1, :] = v

    nbs = n // (BR * LANES)
    out = pl.pallas_call(
        kernel,
        grid=(nbs,),
        in_specs=[
            pl.BlockSpec((1, BR, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, rows, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R_OUT, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbs, R_OUT, LANES), jnp.int32),
        interpret=interpret,
    )(aug.reshape(nbs, BR, LANES), thr_q.reshape(1, 1), tabR)
    o = out[:, :4 * sub_blocks, 0].reshape(nbs, 4, sub_blocks)
    return (o[:, 0].reshape(-1), o[:, 1].reshape(-1),
            o[:, 2].reshape(-1), o[:, 3].reshape(-1))
