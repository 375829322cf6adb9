#!/usr/bin/env python
"""Histogram round 2: MXU one-hot count with relayout-free layouts.

The old ops/pallas_kernels.py count built both one-hots as [*, T] and
contracted dim 1 of both — Mosaic must materialize B^T for the MXU, a
full relayout of the (128,T) one-hot every step.  Here the lo one-hot is
built directly as (T,128) (lo transposed to a (T,1) column first — a
2-vreg relayout instead of a 256-vreg one) so the contraction is a plain
(512,T)@(T,128) matmul:

    counts[hi, lo] += OHT[hi, t] @ OL2[t, lo]

Run: python benchmarks/count_bench.py 2>&1 | tee /tmp/cb2.log
"""
import functools
import os
import time

import numpy as np

N = int(float(os.environ.get("CB_N", 2**25)))
REPS = int(os.environ.get("CB_REPS", 3))
K = 8
SIZE = 1 << (2 * K)
HI_N = SIZE // 128


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
    codes = jax.device_put(codes_np)
    float(np.asarray(codes[:8]).sum())
    want = np.bincount(codes_np, minlength=SIZE)
    wsum = int((want * (np.arange(SIZE) % 97 + 1)).sum())

    def make(tile):
        def kernel(c_ref, o_ref, acc_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            c = c_ref[0]                      # (1, T)
            hi = c >> 7                       # (1, T)
            lo = (c & 127).reshape(tile, 1)   # (T, 1) column
            iota_hi = jax.lax.broadcasted_iota(jnp.int32, (HI_N, tile), 0)
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
            oht = (jnp.broadcast_to(hi, (HI_N, tile)) == iota_hi).astype(
                jnp.bfloat16)                 # (512, T)
            ol2 = (jnp.broadcast_to(lo, (tile, 128)) == iota_lo).astype(
                jnp.bfloat16)                 # (T, 128)
            acc_ref[:] += jax.lax.dot_general(
                oht, ol2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(step == pl.num_programs(0) - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(jnp.int32)

        g = N // tile
        f = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((HI_N, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((HI_N, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((HI_N, 128), jnp.float32)],
        )
        return jax.jit(lambda c: f(c.reshape(g, 1, tile)).reshape(-1))

    for tile in (2048, 4096):
        name = f"mxu_nt_t{tile}"
        try:
            fn = make(tile)
            t0 = time.time()
            out = np.asarray(fn(codes))
            t_c = time.time() - t0
            cks = int((out.astype(np.int64)
                       * (np.arange(SIZE) % 97 + 1)).sum())
            times = []
            for _ in range(REPS):
                t0 = time.time()
                out = fn(codes)
                float(np.asarray(out[:8]).sum())
                times.append(time.time() - t0)
            dt = min(times)
            ok = "OK" if cks == wsum else f"MISMATCH {cks} vs {wsum}"
            log(f"{name:12s} compile={t_c:7.1f}s steady={dt:7.4f}s "
                f"{dt/N*1e9:7.3f} ns/el  {ok}")
        except Exception as e:  # noqa
            log(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:250]}")


if __name__ == "__main__":
    main()
