#!/usr/bin/env python
"""Microbenchmark: table-gather strategies on TPU for the span hot path.

The span pipeline's dominant cost is ``mass[codes]`` — a random gather of
n ~ 5e7 int32/f32 values from a 4^k-entry table (k=8 → 65,536 entries,
256 KB: VMEM-resident).  XLA's gather measures ~9 ns/element; this probes
whether Mosaic's tpu.dynamic_gather (exposed as 2D take_along_axis with
indices.shape == table.shape, axis 0=sublanes or 1=lanes) can beat it.

Variants:
  xla        table[codes] (the current production path)
  subg512    Pallas take_along_axis(axis=0) on the (512,128) table —
             WRONG LANE semantically; measures multi-vreg gather cost
  subg8x64   64 static windows of (8,128) sublane gathers — per-vreg cost
  laneg512   take_along_axis(axis=1) — lane-shuffle throughput
  rowloop    EXACT: fori_loop over 512 table rows; per row broadcast +
             lane-gather + select  (out[i,l] = T[hi,lo])
Each prints compile time, steady time over reps, ns/element, checksum.
Run on the real TPU:  python benchmarks/gather_bench.py 2>&1 | tee /tmp/gb.log
"""
import functools
import os
import sys
import time

import numpy as np

N = int(float(os.environ.get("GB_N", 2**25)))  # 33.5M
REPS = int(os.environ.get("GB_REPS", 3))
K = 8
SIZE = 1 << (2 * K)          # 65536
ROWS, LANES = SIZE // 128, 128  # (512, 128)


def log(*a):
    print(*a, flush=True)


def fence(x):
    return float(np.asarray(x).sum()) if hasattr(x, "shape") else float(x)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"devices={jax.devices()} N={N:,} table={SIZE}")
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, SIZE, size=N, dtype=np.int32)
    table_np = rng.random(SIZE, dtype=np.float32)

    codes = jax.device_put(codes_np)
    table = jax.device_put(table_np)
    tab2d = jax.device_put(table_np.reshape(ROWS, LANES))
    fence(codes[:8]); fence(tab2d[:1])

    want = table_np[codes_np]
    want_sum = float(want.sum(dtype=np.float64))
    log(f"reference sum={want_sum:.6e}")

    results = {}

    def run(name, fn, *args, exact=False):
        try:
            t0 = time.time()
            out = fn(*args)
            s = fence(out)
            t_compile = time.time() - t0
            times = []
            for _ in range(REPS):
                t0 = time.time()
                out = fn(*args)
                s = fence(out)
                times.append(time.time() - t0)
            dt = min(times)
            ok = ""
            if exact:
                ok = "EXACT-OK" if abs(s - want_sum) < 1e-3 * abs(want_sum) else (
                    f"EXACT-FAIL sum={s:.6e}")
            log(f"{name:10s} compile={t_compile:7.1f}s steady={dt:7.4f}s "
                f"{dt/N*1e9:7.3f} ns/el  sum={s:.6e} {ok}")
            results[name] = dt
        except Exception as e:  # noqa
            log(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # ---- XLA baseline -------------------------------------------------
    @jax.jit
    def xla_gather(t, c):
        return t[c].reshape(-1, 65536).sum(axis=1)

    run("xla", xla_gather, table, codes, exact=True)

    # ---- Pallas variants ----------------------------------------------
    nb = N // SIZE  # blocks of (512,128)
    codes_blk = codes.reshape(nb, ROWS, LANES)

    def make(kernel):
        f = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, 8, LANES), jnp.float32),
        )
        return jax.jit(lambda c, t: f(c, t).sum(axis=(0, 1)))

    def subg512_kernel(c_ref, t_ref, o_ref):
        idx = c_ref[0] >> 7  # [512,128] in [0,512)
        g = jnp.take_along_axis(t_ref[...], idx, axis=0)
        o_ref[0] = jnp.broadcast_to(
            jnp.sum(g, axis=0, keepdims=True) / 8.0, (8, LANES))

    run("subg512", make(subg512_kernel), codes_blk, tab2d)

    def subg8x64_kernel(c_ref, t_ref, o_ref):
        c = c_ref[0]
        acc = jnp.zeros((8, LANES), jnp.float32)
        for j in range(ROWS // 8):
            idx = (c[8 * j:8 * j + 8] >> 7) & 7  # keep in-window
            acc = acc + jnp.take_along_axis(
                t_ref[8 * j:8 * j + 8, :], idx, axis=0)
        o_ref[0] = acc

    run("subg8x64", make(subg8x64_kernel), codes_blk, tab2d)

    def laneg512_kernel(c_ref, t_ref, o_ref):
        idx = c_ref[0] & 127
        g = jnp.take_along_axis(t_ref[...], idx, axis=1)
        o_ref[0] = jnp.broadcast_to(
            jnp.sum(g, axis=0, keepdims=True) / 8.0, (8, LANES))

    run("laneg512", make(laneg512_kernel), codes_blk, tab2d)

    def rowloop_kernel(c_ref, t_ref, o_ref):
        c = c_ref[0]
        hi = c >> 7
        lo = c & 127
        tab = t_ref[...]

        def body(r, acc):
            row = jax.lax.dynamic_slice(tab, (r, 0), (1, LANES))
            g = jnp.take_along_axis(
                jnp.broadcast_to(row, (ROWS, LANES)), lo, axis=1)
            return acc + jnp.where(hi == r, g, 0.0)

        acc = jax.lax.fori_loop(
            0, ROWS, body, jnp.zeros((ROWS, LANES), jnp.float32))
        o_ref[0] = jnp.broadcast_to(
            jnp.sum(acc, axis=0, keepdims=True) / 8.0, (8, LANES))

    # exact modulo the /8 *8: sum preserved: each element counted once,
    # row-sum divided by 8 then broadcast to 8 rows -> total equals sum
    run("rowloop", make(rowloop_kernel), codes_blk, tab2d, exact=True)

    log("RESULTS " + " ".join(f"{k}={v:.4f}" for k, v in results.items()))


if __name__ == "__main__":
    main()
