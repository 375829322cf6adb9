#!/usr/bin/env python
"""Gather round 3: EXACT (window x roll)-enumerated Pallas table gather.

out[p,q] = T[hi, lo] with hi = c>>7 (row), lo = c&127 (lane).  Lane
movement by lo is exact via a 128-lane dynamic_gather (idx evaluated at
its own position).  Row selection can't be a second gather (its index
would be evaluated at the moved position), so rows are ENUMERATED:
combo j = (w, d) covers table row 8w + ((p - d) & 7) at sublane p via 8
pre-rolled table copies tabR[d][8w+p] = T[8w + ((p-d)&7)].

  acc += (sel == j) * lane_gather(tabR[j&7][8(j>>3) : +8], lo)
  sel  = (c >> 10)*8 + ((p_iota - (c>>7)) & 7)

Per 8-sublane code vreg: 1 window load + 3 vreg ops per combo; M=8
subvregs share each window load.  k=8: 512 combos -> ~1.5 ops/code.

Run: python benchmarks/gather_bench3.py 2>&1 | tee /tmp/gb3.log
"""
import functools
import os
import time

import numpy as np

REPS = int(os.environ.get("GB_REPS", 3))
K = 8
SIZE = 1 << (2 * K)
ROWS = SIZE // 128
COMBOS = ROWS  # (ROWS//8 windows) * 8 rolls


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"devices={jax.devices()}")
    rng = np.random.default_rng(0)
    table_np = rng.random(SIZE, dtype=np.float32)
    table = jax.device_put(table_np)

    # pre-rolled copies: tabR[d, 8w+p] = T[8w + ((p-d)&7)]
    r = np.arange(ROWS)
    tabR_np = np.stack(
        [table_np.reshape(ROWS, 128)[(r & ~7) | ((r - d) & 7)]
         for d in range(8)])
    tabR = jax.device_put(tabR_np)

    M = 8  # subvregs per block: block (8M, 128)
    BR = 8 * M

    def kernel(c_ref, t_ref, o_ref):
        c = c_ref[0]  # (BR, 128)
        lo = c & 127
        hi = c >> 7
        p = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 0) & 7
        sel = (hi >> 3) * 8 + ((p - (hi & 7)) & 7)

        def body(j, acc):
            d = j & 7
            w = j >> 3
            win = t_ref[d, pl.ds(8 * w, 8), :]  # (8,128)
            upd = []
            for m in range(M):
                g = jnp.take_along_axis(win, lo[8 * m:8 * m + 8], axis=1)
                upd.append(
                    jnp.where(sel[8 * m:8 * m + 8] == j, g, 0.0))
            return acc + jnp.concatenate(upd, axis=0)

        acc = jax.lax.fori_loop(
            0, COMBOS, body, jnp.zeros((BR, 128), jnp.float32))
        o_ref[0] = acc

    def build(n):
        nb = n // (BR * 128)
        f = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, BR, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, ROWS, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BR, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, BR, 128), jnp.float32),
        )

        @jax.jit
        def g(c):
            return f(c.reshape(nb, BR, 128), tabR).reshape(-1)

        return g

    for n in (2**25, 2**27):
        codes_np = rng.integers(0, SIZE, size=n, dtype=np.int32)
        codes = jax.device_put(codes_np)
        float(np.asarray(codes[:8]).sum())
        g = build(n)
        try:
            t0 = time.time()
            out = g(codes)
            head = np.asarray(out[:65536])
            t_c = time.time() - t0
            ok = np.array_equal(head, table_np[codes_np[:65536]])
            times = []
            for _ in range(REPS):
                t0 = time.time()
                out = g(codes)
                float(np.asarray(out[-8:]).sum())
                times.append(time.time() - t0)
            dt = min(times)
            log(f"wd n=2^{int(np.log2(n))} compile={t_c:7.1f}s "
                f"steady={dt:7.4f}s {dt/n*1e9:7.3f} ns/el "
                f"{'EXACT-OK' if ok else 'MISMATCH'}")
        except Exception as e:  # noqa
            log(f"wd n={n} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
