#!/usr/bin/env python
"""Gather lab, round 4: break the k>=10 screen-gather wall.

At k>PALLAS_CLASS_MAX_K the screen falls back to XLA's scalar gather
(``tab16[codes]``), measured ~9 ns/element on v5e — table-size
independent, i.e. pure per-index overhead, 200x off the HBM random-read
floor (~0.04 ns/el at 32B granules).  This lab measures every remaining
formulation that could beat it at k=12 (4^12 = 16.7M entries):

  red        reduce-only baseline (sum of the gathered-shape array)
  xla16      tab16[c] scalar gather, int16 table (current production)
  xla8       tab8[c]  scalar gather, int8 table (dtype effect)
  row8       tab8_2d[c>>7]   -> (n,128) int8 rows  (per-index or per-byte?)
  row32      tabw_2d[c>>10]  -> (n,128) int32 nibble-packed rows
  rowsel8    row8 + XLA take_along_axis lane select (full exact lookup)
  sortkv     lax.sort (code asc, pos payload) — sort-based gather bound
  scat       scatter-add n into 4^12 bins (the count phase wall, for
             reference — jnp.zeros.at[c].add(1))

If rowN is ~per-index cost (same ~9 ns), the wall is per-index and only
algorithmic restructuring (sort-based) can move it; if rowN streams
near bandwidth, k=12 goes through row-gather + Pallas lane-select.

Run: python benchmarks/k12_gather_lab.py > logs/k12_gather_lab.log 2>&1
"""
import os
import time

import numpy as np

N = int(float(os.environ.get("GL_N", 2**25)))   # 33.5M positions
REPS = int(os.environ.get("GL_REPS", 3))
K = 12
SIZE = 1 << (2 * K)                              # 16.7M entries


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices={jax.devices()}  N={N:,}  table={SIZE:,}")
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, SIZE, size=N, dtype=np.int32)
    tab16_np = rng.integers(0, 4096, size=SIZE, dtype=np.int16)

    codes = jax.device_put(codes_np)
    tab16 = jax.device_put(tab16_np)
    tab8 = jax.device_put((tab16_np & 15).astype(np.int8))
    tab8_2d = jax.device_put((tab16_np & 15).astype(np.int8).reshape(-1, 128))
    # nibble-packed words: entry e of word w at bits 4*(e&7)
    nib = (tab16_np & 15).astype(np.int64).reshape(-1, 8)
    words_np = np.zeros(SIZE // 8, dtype=np.int64)
    for e in range(8):
        words_np |= nib[:, e] << (4 * e)
    words_np = words_np.astype(np.uint32).view(np.int32)
    tabw_2d = jax.device_put(words_np.reshape(-1, 128))

    def fence(x):
        return float(np.asarray(x))

    def bench(name, fn, *args):
        try:
            f = jax.jit(fn)
            t0 = time.time()
            r = fence(f(*args))
            t_first = time.time() - t0
            ts = []
            for _ in range(REPS):
                t0 = time.time()
                fence(f(*args))
                ts.append(time.time() - t0)
            t = min(ts)
            log(f"{name:10s} first={t_first:7.2f}s steady={t:7.4f}s "
                f"({t / N * 1e9:7.3f} ns/el) chk={r:.6g}")
        except Exception as e:  # noqa: BLE001
            log(f"{name:10s} FAILED: {type(e).__name__}: {e}")

    i32 = jnp.int32

    # reduce-only baselines (cost of the checksum itself)
    bench("red_n", lambda c: jnp.sum(c.astype(i32)), codes)
    bench("red_n128",
          lambda t: jnp.sum(t.astype(i32)),
          jnp.zeros((N, 128), jnp.int8))

    bench("xla16", lambda c, t: jnp.sum(t[c].astype(i32)), codes, tab16)
    bench("xla8", lambda c, t: jnp.sum(t[c].astype(i32)), codes, tab8)

    bench("row8",
          lambda c, t: jnp.sum(t[c >> 7].astype(i32)),
          codes, tab8_2d)
    bench("row32",
          lambda c, t: jnp.sum(t[c >> 10]),
          codes, tabw_2d)

    def rowsel8(c, t):
        rows = t[c >> 7]                       # (n, 128) int8
        lane = (c & 127)[:, None]
        return jnp.sum(jnp.take_along_axis(rows, lane, axis=1).astype(i32))

    bench("rowsel8", rowsel8, codes, tab8_2d)

    def sortkv(c):
        pos = jax.lax.iota(i32, N)
        sc, sp = jax.lax.sort((c, pos), num_keys=1)
        return jnp.sum(sc * 0 + sp)

    bench("sortkv", sortkv, codes)

    def scat(c):
        h = jnp.zeros((SIZE,), i32).at[c].add(1)
        return jnp.sum(h)

    bench("scat", scat, codes)

    # correctness spot-check of rowsel8 against numpy on a small slice
    small = codes_np[:100000]
    want = (tab16_np & 15)[small].astype(np.int64).sum()
    got = np.asarray(
        jax.jit(lambda c, t: jnp.sum(
            jnp.take_along_axis(t[c >> 7], (c & 127)[:, None], axis=1)
            .astype(i32)))(jnp.asarray(small), tab8_2d))
    log(f"rowsel8 correctness: want={want} got={int(got)} "
        f"ok={int(got) == want}")


if __name__ == "__main__":
    main()
