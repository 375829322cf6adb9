#!/usr/bin/env python
"""Kernel lab: variants of the count + screen-gather kernels on real TPU.

Each variant is a small pallas program timed steady-state over ~50M
elements; outputs are reduced to scalars inside jit so no O(n) D2H rides
the measurement.  Findings feed ops/pallas_kernels.py and ops/gather.py.

Round-1 findings: 16-bit/8-bit iota is NOT supported by v5e Mosaic —
small-dtype one-hots need the iota passed in as a constant-index-map
input (resident in VMEM, no per-step DMA).
Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/kernel_lab.py
"""

import functools
import os
import time

import numpy as np


def timeit(fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    float(np.asarray(out).reshape(-1)[0])
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(np.asarray(out).reshape(-1)[0])
        ts.append(time.time() - t0)
    return tc, min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = int(float(os.environ.get("LAB_BASES", 5e7)))
    T = 4096
    n = -(-n // (T * 4)) * (T * 4)
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, 1 << 16, size=n, dtype=np.int32)
    codes = jax.device_put(codes_np)
    float(np.asarray(codes[:1])[0])
    print(f"n={n:,} devices={jax.devices()}", flush=True)
    LANES = 128

    # ---------- count variants ------------------------------------------
    def make_count(tile, hi_bits, cmp_dtype, in_iota):
        """Generic [2^hi_bits, 2^(16-hi_bits)] one-hot-matmul count."""
        hi_n = 1 << hi_bits
        lo_n = 1 << (16 - hi_bits)

        def kern_noiota(c_ref, out_ref, acc_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            c = c_ref[0]
            hi = (c >> (16 - hi_bits)).astype(cmp_dtype)
            lo = (c & (lo_n - 1)).reshape(tile, 1).astype(cmp_dtype)
            ih = jax.lax.broadcasted_iota(cmp_dtype, (hi_n, tile), 0)
            il = jax.lax.broadcasted_iota(cmp_dtype, (tile, lo_n), 1)
            oht = (jnp.broadcast_to(hi, (hi_n, tile)) == ih).astype(jnp.int8)
            ol2 = (jnp.broadcast_to(lo, (tile, lo_n)) == il).astype(jnp.int8)
            acc_ref[:] += jax.lax.dot_general(
                oht, ol2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

            @pl.when(step == pl.num_programs(0) - 1)
            def _():
                out_ref[:] = acc_ref[:]

        def kern_iota(c_ref, ih_ref, il_ref, out_ref, acc_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            c = c_ref[0]
            hi = (c >> (16 - hi_bits)).astype(cmp_dtype)
            lo = (c & (lo_n - 1)).reshape(tile, 1).astype(cmp_dtype)
            oht = (jnp.broadcast_to(hi, (hi_n, tile)) == ih_ref[:]).astype(
                jnp.int8)
            ol2 = (jnp.broadcast_to(lo, (tile, lo_n)) == il_ref[:]).astype(
                jnp.int8)
            acc_ref[:] += jax.lax.dot_general(
                oht, ol2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

            @pl.when(step == pl.num_programs(0) - 1)
            def _():
                out_ref[:] = acc_ref[:]

        np_dt = np.dtype(cmp_dtype.dtype.name if hasattr(cmp_dtype, "dtype")
                         else cmp_dtype.__name__)
        ih_np = np.broadcast_to(
            np.arange(hi_n, dtype=np_dt)[:, None], (hi_n, tile)).copy()
        il_np = np.broadcast_to(
            np.arange(lo_n, dtype=np_dt)[None, :], (tile, lo_n)).copy()
        ih_dev = jax.device_put(ih_np)
        il_dev = jax.device_put(il_np)

        @jax.jit
        def run(x):
            g = x.shape[0] // tile
            x3 = x.reshape(g, 1, tile)
            if in_iota:
                out = pl.pallas_call(
                    kern_iota, grid=(g,),
                    in_specs=[
                        pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((hi_n, tile), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((tile, lo_n), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((hi_n, lo_n), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((hi_n, lo_n), jnp.int32),
                    scratch_shapes=[pltpu.VMEM((hi_n, lo_n), jnp.int32)],
                )(x3, ih_dev, il_dev)
            else:
                out = pl.pallas_call(
                    kern_noiota, grid=(g,),
                    in_specs=[
                        pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((hi_n, lo_n), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((hi_n, lo_n), jnp.int32),
                    scratch_shapes=[pltpu.VMEM((hi_n, lo_n), jnp.int32)],
                )(x3)
            return out

        return run

    ref_counts = np.bincount(codes_np, minlength=1 << 16)
    for name, tile, hb, dt, ii in [
        ("v0  T4096 hi9 i32 noiota", 4096, 9, jnp.int32, False),
        ("v1  T4096 hi9 i16 iota-in", 4096, 9, jnp.int16, True),
        ("v2  T4096 hi8 i16 iota-in", 4096, 8, jnp.int16, True),
        ("v3  T4096 hi8 u8  iota-in", 4096, 8, jnp.uint8, True),
        ("v4  T8192 hi9 i16 iota-in", 8192, 9, jnp.int16, True),
        ("v5  T8192 hi8 u8  iota-in", 8192, 8, jnp.uint8, True),
    ]:
        try:
            fn = make_count(tile, hb, dt, ii)
            tc, t = timeit(fn, codes)
            got = np.asarray(fn(codes)).reshape(-1)
            ok = np.array_equal(np.sort(got), np.sort(ref_counts))
            print(f"count {name}: compile={tc:5.1f}s steady={t*1e3:7.2f} ms "
                  f"({t/n*1e9:.3f} ns/el) ok={ok}", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"count {name}: FAILED {type(e).__name__}: {msg}",
                  flush=True)

    # ---------- screen gather variants ----------------------------------
    from kmer_spans_tpu.ops.gather import (
        pallas_word_gather,
        prerolled_table,
    )

    W = 8192  # packed words at k=8
    tab_np = rng.integers(0, 1 << 16, size=W, dtype=np.int64).astype(
        np.int32)
    tabR = jax.device_put(np.asarray(prerolled_table(
        jax.device_put(tab_np))))
    word_idx = codes >> 3
    expect = int(tab_np[codes_np >> 3].astype(np.int64).sum())

    @jax.jit
    def g0_sum(tabR, idx):
        return jnp.sum(pallas_word_gather(tabR, idx).astype(jnp.int64))

    tc, t = timeit(g0_sum, tabR, word_idx)
    ok = int(np.asarray(g0_sum(tabR, word_idx))) == expect
    print(f"gather g0 current  : compile={tc:5.1f}s steady={t*1e3:7.2f} ms "
          f"({t/n*1e9:.3f} ns/el) ok={ok}", flush=True)

    # g1: fully unrolled static combos
    def mk_g1(rows, BR):
        def g1_kernel(idx_ref, tab_ref, out_ref):
            idx = idx_ref[0]
            lo = idx & 127
            row = idx >> 7
            p = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 0) & 7
            sel = (row & ~7) | ((p - row) & 7)
            acc = jnp.zeros((BR, 128), jnp.int32)
            for j in range(rows):
                d = j & 7
                w = j >> 3
                win = tab_ref[d, 8 * w:8 * w + 8, :]
                winb = jnp.concatenate([win] * (BR // 8), axis=0)
                acc = jnp.where(sel == j,
                                jnp.take_along_axis(winb, lo, axis=1), acc)
            out_ref[0] = acc

        @jax.jit
        def run(tabR, idx):
            flat = idx.reshape(-1)
            nb = flat.shape[0] // (BR * 128)
            blk = flat.reshape(nb, BR, 128)
            out = pl.pallas_call(
                g1_kernel,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((1, BR, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, rows, 128), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, BR, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, BR, 128), jnp.int32),
            )(tabR, blk)
            return jnp.sum(out.astype(jnp.int64))

        return run

    for BR in (64, 256):
        try:
            fn = mk_g1(64, BR)
            tc, t = timeit(fn, tabR, word_idx)
            ok = int(np.asarray(fn(tabR, word_idx))) == expect
            print(f"gather g1 unroll BR{BR}: compile={tc:5.1f}s "
                  f"steady={t*1e3:7.2f} ms ({t/n*1e9:.3f} ns/el) ok={ok}",
                  flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"gather g1 BR{BR}: FAILED {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
