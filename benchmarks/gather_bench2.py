#!/usr/bin/env python
"""Gather microbenchmark round 2: EXACT lane-gather formulations.

Round 1 found tpu.dynamic_gather ~0.9 ns/el (vs XLA 9.5) for single-tile
windows.  This round probes lane gathers with rows WIDER than 128 lanes
(multi-lane-tile sources) — if idx range can cover the whole table row,
an exact one-op lookup exists:

  lanegW    x (R, W) idx in [0, W): does Mosaic support W > 128?
  flat      table broadcast to (8, 65536), codes (8, 65536): one gather
  rowtree   layout (128, 512): 128 static-unrolled rows, each
            (a==r) * LaneG(bcast T2[r:r+1], b) — exact, needs W=512 laneG
Run: python benchmarks/gather_bench2.py 2>&1 | tee /tmp/gb2.log
"""
import os
import time

import numpy as np

N = int(float(os.environ.get("GB_N", 2**25)))
REPS = int(os.environ.get("GB_REPS", 3))
SIZE = 65536


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"devices={jax.devices()} N={N:,}")
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, SIZE, size=N, dtype=np.int32)
    table_np = rng.random(SIZE, dtype=np.float32)
    codes = jax.device_put(codes_np)
    table = jax.device_put(table_np)
    float(np.asarray(codes[:8]).sum())
    want_sum = float(table_np[codes_np].sum(dtype=np.float64))
    log(f"reference sum={want_sum:.6e}")

    def run(name, fn, *args, exact=True):
        try:
            t0 = time.time()
            s = float(np.asarray(fn(*args)).sum())
            t_c = time.time() - t0
            times = []
            for _ in range(REPS):
                t0 = time.time()
                s = float(np.asarray(fn(*args)).sum())
                times.append(time.time() - t0)
            dt = min(times)
            ok = ("EXACT-OK" if abs(s - want_sum) < 1e-3 * abs(want_sum)
                  else f"MISMATCH {s:.6e}") if exact else ""
            log(f"{name:12s} compile={t_c:7.1f}s steady={dt:7.4f}s "
                f"{dt/N*1e9:7.3f} ns/el  {ok}")
        except Exception as e:  # noqa
            log(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # ---- lane gather at width W: exact lookup of low-W-bit codes -------
    def make_laneg(W, R, blocks_per_step=1):
        # codes reshaped (nb, R, W); table row replicated to (R, W) windows?
        # For exactness restrict code values < W and table = first W entries.
        tabW = jnp.broadcast_to(table[:W], (R, W))

        def kern(c_ref, t_ref, o_ref):
            g = jnp.take_along_axis(t_ref[...], c_ref[0], axis=1)
            o_ref[0] = jnp.broadcast_to(
                jnp.sum(g, keepdims=True) / (8.0 * 128), (8, 128))

        nb = N // (R * W)
        f = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, R, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
        )

        @jax.jit
        def g(c):
            cb = (c % W).reshape(nb, R, W)
            return f(cb, tabW).sum()

        # matching reference for modded codes
        ref = float(table_np[codes_np % W].sum(dtype=np.float64))
        return g, ref

    for W, R in ((256, 64), (512, 32), (2048, 8), (65536, 8)):
        try:
            g, ref = make_laneg(W, R)
            t0 = time.time()
            s = float(np.asarray(g(codes)))
            t_c = time.time() - t0
            times = []
            for _ in range(REPS):
                t0 = time.time()
                s = float(np.asarray(g(codes)))
                times.append(time.time() - t0)
            dt = min(times)
            ok = "EXACT-OK" if abs(s - ref) < 1e-3 * abs(ref) else (
                f"MISMATCH {s:.6e} vs {ref:.6e}")
            log(f"laneg_w{W:<6d} compile={t_c:7.1f}s steady={dt:7.4f}s "
                f"{dt/N*1e9:7.3f} ns/el  {ok}")
        except Exception as e:  # noqa
            log(f"laneg_w{W:<6d} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # ---- exact rowtree: (128,512) layout, 128 static rows --------------
    ROWS, W = 128, 512
    tab2 = jax.device_put(table_np.reshape(ROWS, W))

    def rowtree_kernel(c_ref, t_ref, o_ref):
        c = c_ref[0]            # (128, 512)
        a = c >> 9              # row in [0,128)
        b = c & 511             # lane in [0,512)
        tab = t_ref[...]
        acc = jnp.zeros((ROWS, W), jnp.float32)
        for r in range(ROWS):
            row = jnp.broadcast_to(tab[r:r + 1, :], (ROWS, W))
            g = jnp.take_along_axis(row, b, axis=1)
            acc = acc + jnp.where(a == r, g, 0.0)
        o_ref[0] = jnp.broadcast_to(
            jnp.sum(acc, keepdims=True) / (8.0 * 128), (8, 128))

    nb = N // SIZE
    f = pl.pallas_call(
        rowtree_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, ROWS, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
    )
    run("rowtree", jax.jit(lambda c: f(c.reshape(nb, ROWS, W), tab2).sum()),
        codes)


if __name__ == "__main__":
    main()
