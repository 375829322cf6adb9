#!/usr/bin/env python
"""Microbenchmark: spectrum-histogram strategies on TPU.

The count pass is ``zeros(4^k).at[codes].add(1)`` — XLA scatter-add at
~6.4 ns/el.  Variants probe whether shaping helps XLA's scatter:

  flat      baseline scatter-add into 4^k
  rows8     scatter into (8, 4^k) with row = position & 7, sum rows
            (dilutes duplicate-index serialization if that binds)
  rows8hash row = (code * 0x9e3779b9) >> 29 — spreads HOT duplicates
  bincount  jnp.bincount (same scatter path, sanity)
  sortseg   sort codes + segment boundaries -> scatter of run-lengths

Run: python benchmarks/scatter_bench.py 2>&1 | tee /tmp/sb.log
"""
import os
import time

import numpy as np

N = int(float(os.environ.get("SB_N", 2**25)))
REPS = int(os.environ.get("SB_REPS", 3))
SIZE = 65536


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices={jax.devices()} N={N:,}")
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, SIZE, size=N, dtype=np.int32)
    codes = jax.device_put(codes_np)
    float(np.asarray(codes[:8]).sum())
    want = np.bincount(codes_np, minlength=SIZE).astype(np.int64)
    want_cks = int((want * (np.arange(SIZE) % 97 + 1)).sum())

    def run(name, fn):
        try:
            t0 = time.time()
            out = fn(codes)
            cks = int(np.asarray(
                out.astype(jnp.int64) * (jnp.arange(SIZE) % 97 + 1)).sum())
            t_c = time.time() - t0
            times = []
            for _ in range(REPS):
                t0 = time.time()
                out = fn(codes)
                float(np.asarray(out[:8]).sum())
                times.append(time.time() - t0)
            dt = min(times)
            ok = "OK" if cks == want_cks else f"MISMATCH {cks} vs {want_cks}"
            log(f"{name:10s} compile={t_c:7.1f}s steady={dt:7.4f}s "
                f"{dt/N*1e9:7.3f} ns/el  {ok}")
        except Exception as e:  # noqa
            log(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    @jax.jit
    def flat(c):
        return jnp.zeros(SIZE, jnp.int32).at[c].add(1)

    @jax.jit
    def rows8(c):
        n = c.shape[0]
        row = (jnp.arange(n, dtype=jnp.int32)) & 7
        h = jnp.zeros((8, SIZE), jnp.int32).at[row, c].add(1)
        return h.sum(axis=0)

    @jax.jit
    def rows8hash(c):
        row = (c * jnp.int32(-1640531527)) >> 29 & 7
        h = jnp.zeros((8, SIZE), jnp.int32).at[row, c].add(1)
        return h.sum(axis=0)

    @jax.jit
    def bincount(c):
        return jnp.bincount(c, length=SIZE)

    @jax.jit
    def sortseg(c):
        s = jnp.sort(c)
        # run-length: positions where value changes; count via searchsorted
        idx = jnp.arange(SIZE, dtype=jnp.int32)
        starts = jnp.searchsorted(s, idx, side="left")
        ends = jnp.searchsorted(s, idx, side="right")
        return (ends - starts).astype(jnp.int32)

    run("flat", flat)
    run("rows8", rows8)
    run("rows8hash", rows8hash)
    run("bincount", bincount)
    run("sortseg", sortseg)


if __name__ == "__main__":
    main()
