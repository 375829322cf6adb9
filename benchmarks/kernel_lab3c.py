"""Round-3 kernel lab, part c: fused screen+scan with MANUAL in-kernel
scans (Mosaic has no cumsum lowering), 2-bit vs 4-bit class tables, and a
retry of int16 one-hot compares in the count kernel at bigger tiles.

Findings from kernel_lab3b (50M, net of 25.7ms sync):
  dot i8->i32 = 0.360 ns/el (true 2x over bf16) | count T16384 = 0.558
  unrolled gather BR64/BR256 = 0.227 (vs 0.821 fori) | cumsum unsupported.

Usage: python benchmarks/kernel_lab3c.py > logs/kernel_lab3c.log 2>&1
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
INTERPRET = os.environ.get("LAB_INTERPRET", "0") == "1"
INT_INF = (1 << 30)


def log(*a):
    print(*a, flush=True)


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jax.device_get(leaf.ravel()[0]))


def bench(name, fn, args, n_el, reps=3, t_null=0.0):
    try:
        t0 = time.time()
        out = fn(*args)
        sync(out)
        tc = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            sync(out)
            ts.append(time.time() - t0)
        t = min(ts)
        net = max(t - t_null, 1e-9)
        log(f"{name:34s} compile={tc:7.1f}s steady={t*1e3:9.2f} ms "
            f"net={net*1e3:9.2f} ms ({net/n_el*1e9:6.3f} ns/el)")
        return out, t
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        log(f"{name:34s} FAILED {type(e).__name__}: {msg}")
        return None, None


# ---------------------------------------------- manual in-kernel scans

def _lane_cumsum(x):
    """Inclusive cumsum along axis 1 (width 128) via 7 shifted adds."""
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
    """Inclusive cumsum along axis 0 (rows); rows must be a power of 2."""
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


def _block_summaries(a, sc):
    """(BR,128) int32 scores (0 where unscored) + mask -> 4 scalars.

    Flat order = row-major.  A = flat cumsum; Bv = A - running min of
    (A at scored positions, else +inf)."""
    Al = _lane_cumsum(a)
    rt = Al[:, -1:]                     # (BR,1) row totals
    Rex = _row_cumsum(rt) - rt          # exclusive row prefix
    A = Al + Rex
    P = jnp.where(sc, A, jnp.int32(INT_INF))
    Ml = _lane_cummin(P)
    rm = Ml[:, -1:]
    rme = _row_cummin(rm)
    rme = jnp.concatenate(
        [jnp.full((1, 1), INT_INF, jnp.int32), rme[:-1]], axis=0)
    M = jnp.minimum(Ml, rme)
    Bv = A - M
    # keep results (1,1)-shaped: Mosaic has no scalar-extract lowering
    # (vector.extract emits an unsupported dynamic_slice)
    def m11(x):
        return jnp.max(jnp.max(x, axis=1, keepdims=True),
                       axis=0, keepdims=True)
    return A[-1:, -1:], Bv[-1:, -1:], m11(A), m11(Bv)


# ------------------------------------------------ fused screen + scan

def make_screen_scan(rows, class_bits=4, sub_blocks=8, block=8192):
    """aug codes -> per-block (tA, tB, maxA, maxB) int32, one kernel.

    aug bit 16 = kmer_valid, bit 17 = scored; low 16 bits = code.
    class_bits in {2, 4}: entries per int32 word = 32/class_bits; the
    score is the class upper edge in SCREEN_SCALE=4096 units + slack.
    """
    BR = sub_blocks * (block // LANES)
    R_OUT = max(8, 4 * sub_blocks)
    epw = 32 // class_bits          # entries per word
    levels = 1 << class_bits
    unit = 4096 // levels
    sh_bits = 5 - (class_bits.bit_length() - 1)  # log2(epw): 4->3, 2->4

    def kernel(codes_ref, thr_ref, tab_ref, out_ref):
        aug = codes_ref[0]                       # (BR,128) int32
        sc = ((aug >> 17) & 1) == 1
        c = aug & 0xFFFF
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
        br = block // LANES
        for b in range(sub_blocks):
            tA, tB, mA, mB = _block_summaries(
                a[br * b:br * b + br], sc[br * b:br * b + br])
            for q, v in enumerate((tA, tB, mA, mB)):
                i = q * sub_blocks + b
                out_ref[0, i:i + 1, :] = jnp.broadcast_to(v, (1, LANES))

    @jax.jit
    def f(tabR, aug, thr_q):
        n = aug.shape[0]
        step = BR * LANES
        nb = n // step
        blk = aug.reshape(nb, BR, LANES)
        out = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, BR, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, rows, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R_OUT, LANES),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, R_OUT, LANES),
                                           jnp.int32),
            interpret=INTERPRET,
        )(blk, thr_q.reshape(1, 1), tabR)
        o = out[:, :4 * sub_blocks, 0].reshape(nb, 4, sub_blocks)
        return (o[:, 0].reshape(-1), o[:, 1].reshape(-1),
                o[:, 2].reshape(-1), o[:, 3].reshape(-1))

    return f


def prerolled(tab_words):
    W = tab_words.shape[0]
    rows = -(-W // LANES)
    rows = -(-rows // 8) * 8
    pad = rows * LANES - W
    if pad:
        tab_words = jnp.concatenate(
            [tab_words, jnp.zeros((pad,), tab_words.dtype)])
    tab2d = tab_words.reshape(rows, LANES)
    r = jnp.arange(rows, dtype=jnp.int32)
    return jnp.stack([tab2d[(r & ~7) | ((r - d) & 7)] for d in range(8)])


# --------------------------------------------- count with i16 compares

def make_count(tile, cmp16):
    hi_n, lo_n = 512, 128

    def kernel(codes_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        codes = codes_ref[0]
        valid = (codes >> 16) & 1
        c = codes & 0xFFFF
        hi = jnp.where(valid == 1, c >> 7, -1)
        lo = (c & (lo_n - 1)).reshape(tile, 1)
        if cmp16:
            iota_hi = jax.lax.broadcasted_iota(jnp.int16, (hi_n, tile), 0)
            iota_lo = jax.lax.broadcasted_iota(jnp.int16, (tile, lo_n), 1)
            oht = (jnp.broadcast_to(hi.astype(jnp.int16), (hi_n, tile))
                   == iota_hi).astype(jnp.int8)
            ol2 = (jnp.broadcast_to(lo.astype(jnp.int16), (tile, lo_n))
                   == iota_lo).astype(jnp.int8)
        else:
            iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, tile), 0)
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (tile, lo_n), 1)
            oht = (jnp.broadcast_to(hi, (hi_n, tile)) == iota_hi).astype(
                jnp.int8)
            ol2 = (jnp.broadcast_to(lo, (tile, lo_n)) == iota_lo).astype(
                jnp.int8)
        acc_ref[:] += jax.lax.dot_general(
            oht, ol2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(step == pl.num_programs(0) - 1)
        def _fin():
            out_ref[:] = acc_ref[:]

    @jax.jit
    def f(flat):
        g = flat.shape[0] // tile
        flat3 = flat.reshape(g, 1, tile)
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((hi_n, lo_n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hi_n, lo_n), jnp.int32),
            scratch_shapes=[pltpu.VMEM((hi_n, lo_n), jnp.int32)],
            interpret=INTERPRET,
        )(flat3)

    return f


# ----------------------------------------------------------------- main

def main():
    log(f"devices={jax.devices()} jax={jax.__version__}")
    n = 6144 * 8192
    rng = np.random.default_rng(0)
    codes_h = rng.integers(0, 1 << 16, size=n, dtype=np.int32)
    aug_h = codes_h | (3 << 16)
    aug = jax.device_put(aug_h)
    sync((aug,))
    log(f"n={n:,} staged")

    nul = jax.jit(lambda x: x[:8] * 2)
    _, t_null = bench("null dispatch", nul, (aug,), n)

    for tile, c16 in [(32768, False), (65536, False)]:
        bench(f"count T{tile} c16={int(c16)}", make_count(tile, c16),
              (aug,), n, t_null=t_null)

    thr_q = jnp.int32(3071)
    for cb, sb in [(4, 8), (4, 4), (2, 8)]:
        rows = (1 << 16) // (32 // cb) // LANES
        tabw = jnp.asarray(rng.integers(
            -(1 << 31), 1 << 31, size=(1 << 16) // (32 // cb),
            dtype=np.int64).astype(np.int32))
        tabR = prerolled(tabw)
        fn = make_screen_scan(rows, class_bits=cb, sub_blocks=sb)
        out, _ = bench(f"screen+scan cb{cb} SB{sb} rows{rows}", fn,
                       (tabR, aug, thr_q), n, t_null=t_null)
        if out is not None:
            # correctness vs numpy
            epw = 32 // cb
            words = np.asarray(tabw)[codes_h >> (5 - (cb.bit_length() - 1))]
            nib = (words >> ((codes_h & (epw - 1)) * cb)) & ((1 << cb) - 1)
            s = (nib + 1) * (4096 // (1 << cb)) + 3 - 3071
            A = np.cumsum(s.reshape(-1, 8192), axis=1)
            ok = (np.array_equal(np.asarray(out[0]), A[:, -1])
                  and np.array_equal(np.asarray(out[2]), A.max(axis=1)))
            log(f"  correctness: {'OK' if ok else 'MISMATCH'}")

    log("lab done")


if __name__ == "__main__":
    main()
