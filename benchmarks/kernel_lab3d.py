"""Round-3 kernel lab, part d: isolate why the fused screen+scan kernel
kills the compile helper (HTTP 500), and find a compiling shape.

Variants:
  D0  gather-only BR64 (known good, 0.227 ns/el) — control
  D1  scan-summaries-only kernel (s_int + mask -> 4 per-block scalars)
  D2  fused SB1 (BR=64: gather 512 pairs + one block's summaries)
  D3  fused SB8 with FULL-WIDTH row ops (no (R,1)-shaped intermediates)

Usage: python benchmarks/kernel_lab3d.py > logs/kernel_lab3d.log 2>&1
"""

from __future__ import annotations

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


# full-width helpers: every intermediate is (R, 128)

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


def _row_cumsum_w(x):
    d = 1
    while d < x.shape[0]:
        x = x + jnp.concatenate(
            [jnp.zeros((d, x.shape[1]), x.dtype), x[:-d]], axis=0)
        d *= 2
    return x


def _row_cummin_w(x):
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
    """(R,128) scores+mask -> 4 values as (1,128) rows (no skinny shapes)."""
    R = a.shape[0]
    Al = _lane_cumsum(a)
    rt = jnp.broadcast_to(Al[:, LANES - 1:LANES], (R, LANES))
    Rex = _row_cumsum_w(rt) - rt
    A = Al + Rex
    P = jnp.where(sc, A, jnp.int32(INT_INF))
    Ml = _lane_cummin(P)
    rm = jnp.broadcast_to(Ml[:, LANES - 1:LANES], (R, LANES))
    rme = _row_cummin_w(rm)
    rme = jnp.concatenate(
        [jnp.full((1, LANES), INT_INF, jnp.int32), rme[:-1]], axis=0)
    M = jnp.minimum(Ml, rme)
    Bv = A - M
    tA = A[R - 1:R, LANES - 1:LANES]
    tB = Bv[R - 1:R, LANES - 1:LANES]
    mA = jnp.max(A, axis=0, keepdims=True)
    mA = jnp.max(mA, axis=1, keepdims=True)
    mB = jnp.max(Bv, axis=0, keepdims=True)
    mB = jnp.max(mB, axis=1, keepdims=True)
    return (jnp.broadcast_to(tA, (1, LANES)),
            jnp.broadcast_to(tB, (1, LANES)),
            jnp.broadcast_to(mA, (1, LANES)),
            jnp.broadcast_to(mB, (1, LANES)))


def make_scan_only(sub_blocks=8, block=8192):
    BR = sub_blocks * (block // LANES)
    R_OUT = max(8, 4 * sub_blocks)

    def kernel(a_ref, m_ref, out_ref):
        a = a_ref[0]
        sc = m_ref[0] == 1
        a = jnp.where(sc, a, 0)
        br = block // LANES
        for b in range(sub_blocks):
            tA, tB, mA, mB = _summaries_fullwidth(
                a[br * b:br * b + br], sc[br * b:br * b + br])
            for q, v in enumerate((tA, tB, mA, mB)):
                i = q * sub_blocks + b
                out_ref[0, i:i + 1, :] = v

    @jax.jit
    def f(s_int, mask):
        n = s_int.shape[0]
        step = BR * LANES
        nb = n // step
        out = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, BR, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BR, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R_OUT, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, R_OUT, LANES), jnp.int32),
            interpret=INTERPRET,
        )(s_int.reshape(nb, BR, LANES), mask.reshape(nb, BR, LANES))
        o = out[:, :4 * sub_blocks, 0].reshape(nb, 4, sub_blocks)
        return (o[:, 0].reshape(-1), o[:, 1].reshape(-1),
                o[:, 2].reshape(-1), o[:, 3].reshape(-1))

    return f


def make_fused(rows, sub_blocks, block=8192):
    BR = sub_blocks * (block // LANES)
    R_OUT = max(8, 4 * sub_blocks)

    def kernel(codes_ref, thr_ref, tab_ref, out_ref):
        aug = codes_ref[0]
        sc = ((aug >> 17) & 1) == 1
        c = aug & 0xFFFF
        widx = c >> 3
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
        nib = (words >> ((c & 7) * 4)) & 15
        s = (nib + 1) * 256 + 3 - thr_ref[0, 0]
        a = jnp.where(sc, s, 0)
        br = block // LANES
        for b in range(sub_blocks):
            tA, tB, mA, mB = _summaries_fullwidth(
                a[br * b:br * b + br], sc[br * b:br * b + br])
            for q, v in enumerate((tA, tB, mA, mB)):
                i = q * sub_blocks + b
                out_ref[0, i:i + 1, :] = v

    @jax.jit
    def f(tabR, aug, thr_q):
        n = aug.shape[0]
        step = BR * LANES
        nb = n // step
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
            out_specs=pl.BlockSpec((1, R_OUT, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, R_OUT, LANES), jnp.int32),
            interpret=INTERPRET,
        )(aug.reshape(nb, BR, LANES), thr_q.reshape(1, 1), tabR)
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


def main():
    log(f"devices={jax.devices()} jax={jax.__version__}")
    n = 6144 * 8192
    rng = np.random.default_rng(0)
    codes_h = rng.integers(0, 1 << 16, size=n, dtype=np.int32)
    aug = jax.device_put(codes_h | (3 << 16))
    s_int = jax.device_put(
        rng.integers(-3000, 1100, size=n, dtype=np.int64).astype(np.int32))
    mask = jax.device_put(np.ones(n, np.int32))
    sync((aug,))
    sync((s_int,))
    log(f"n={n:,} staged")

    nul = jax.jit(lambda x: x[:8] * 2)
    _, t_null = bench("null dispatch", nul, (aug,), n)

    tabw = jnp.asarray(rng.integers(
        -(1 << 31), 1 << 31, size=8192, dtype=np.int64).astype(np.int32))
    tabR = prerolled(tabw)
    thr_q = jnp.int32(3071)

    for sb in (8, 4):
        bench(f"D1 scan-only SB{sb}", make_scan_only(sb), (s_int, mask), n,
              t_null=t_null)
    for sb in (1, 4, 8):
        out, _ = bench(f"D3 fused SB{sb} fullwidth", make_fused(64, sb),
                       (tabR, aug, thr_q), n, t_null=t_null)
        if out is not None:
            words = np.asarray(tabw)[codes_h >> 3]
            nib = (words >> ((codes_h & 7) * 4)) & 15
            s = (nib + 1) * 256 + 3 - 3071
            A = np.cumsum(s.reshape(-1, 8192), axis=1)
            ok = (np.array_equal(np.asarray(out[0]), A[:, -1])
                  and np.array_equal(np.asarray(out[2]), A.max(axis=1)))
            log(f"  correctness: {'OK' if ok else 'MISMATCH'}")

    log("lab done")


if __name__ == "__main__":
    main()
