#!/usr/bin/env python
"""Sort lab, round 4: price the building blocks of a sort-based k>=10 screen.

k12_gather_lab measured lax.sort at 3.15 ns/el for (i32 key, i32 payload)
at 33.5M — fast enough that "sort by code, read run lengths, unsort"
could replace BOTH the count scatter (~12 ns/el at k=12) and the rank
lookup gather (~8.8 ns/el).  This lab prices every piece:

  sort1_25/27   (code, pos) sort at n=2^25 / 2^27 (scaling check)
  sort3         (code, pos, payload) 1-key 3-array sort
  sort2k        (v, code, idx) 2-key sort (run-space rank for pm)
  runlen        head/next-head/run-length/fill scans after a sort
  scat_sort     n-el scatter-add with sorted (nonunique) indices
  scat_rand     same with random indices (today's count path, reference)
  gat_sort      tab16[codes] gather with indices_are_sorted=True
  screen_core   full S1 -> run lengths -> class -> unsort composition
  dynslice      dynamic_slice of the sorted tail (heavy-value pull)

Run: python benchmarks/k12_sort_lab.py > logs/k12_sort_lab.log 2>&1
"""
import os
import time

import numpy as np

N = int(float(os.environ.get("SL_N", 2**25)))
NBIG = int(float(os.environ.get("SL_NBIG", 2**27)))
REPS = int(os.environ.get("SL_REPS", 3))
K = 12
SIZE = 1 << (2 * K)


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices={jax.devices()}  N={N:,} NBIG={NBIG:,} table={SIZE:,}")
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, SIZE, size=N, dtype=np.int32)
    codes = jax.device_put(codes_np)
    codes_big = jax.device_put(
        rng.integers(0, SIZE, size=NBIG, dtype=np.int32))
    tab16 = jax.device_put(rng.integers(0, 4096, SIZE, dtype=np.int16))

    def fence(x):
        return float(np.asarray(x))

    def bench(name, fn, *args, n=N):
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
            log(f"{name:12s} first={t_first:7.2f}s steady={t:7.4f}s "
                f"({t / n * 1e9:7.3f} ns/el) chk={r:.6g}")
        except Exception as e:  # noqa: BLE001
            log(f"{name:12s} FAILED: {type(e).__name__}: {e}")

    i32 = jnp.int32

    def sort1(c):
        pos = jax.lax.iota(i32, c.shape[0])
        sc, sp = jax.lax.sort((c, pos), num_keys=1)
        return jnp.sum(sc) + sp[0]

    bench("sort1_25", sort1, codes)
    bench("sort1_27", sort1, codes_big, n=NBIG)

    def sort3(c):
        pos = jax.lax.iota(i32, c.shape[0])
        sc, sp, sq = jax.lax.sort((c, pos, pos * 2), num_keys=1)
        return jnp.sum(sc) + sp[0] + sq[-1]

    bench("sort3", sort3, codes)

    def sort2k(c):
        pos = jax.lax.iota(i32, c.shape[0])
        v = c & 1023  # stand-in value key
        sv, sc, sp = jax.lax.sort((v, c, pos), num_keys=2)
        return jnp.sum(sc) + sv[0] + sp[-1]

    bench("sort2k", sort2k, codes)

    def runlen(c):
        n = c.shape[0]
        pos = jax.lax.iota(i32, n)
        sc, sp = jax.lax.sort((c, pos), num_keys=1)
        head = jnp.concatenate(
            [jnp.ones((1,), bool), sc[1:] != sc[:-1]])
        idx = jax.lax.iota(i32, n)
        start = jax.lax.cummax(jnp.where(head, idx, 0))
        nxt = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(head, idx, 1 << 30))))
        nxt2 = jnp.concatenate([nxt[1:], jnp.full((1,), n, i32)])
        # run length per element = next head after me - my head
        end = jnp.flip(jax.lax.cummin(jnp.flip(
            jnp.where(jnp.concatenate([head[1:], jnp.ones((1,), bool)]),
                      idx + 1, 1 << 30))))
        v = end - start
        return jnp.sum(v) + nxt2[0]

    bench("runlen", runlen, codes)

    def scat_sort(c):
        sc = jax.lax.sort(c)
        head = jnp.concatenate([jnp.ones((1,), bool), sc[1:] != sc[:-1]])
        upd = head.astype(i32)
        h = jnp.zeros((SIZE,), i32).at[sc].add(
            upd, indices_are_sorted=True)
        return jnp.sum(h)

    bench("scat_sort", scat_sort, codes)

    def scat_sort_only(sc):
        head = jnp.concatenate([jnp.ones((1,), bool), sc[1:] != sc[:-1]])
        upd = head.astype(i32)
        h = jnp.zeros((SIZE,), i32).at[sc].add(
            upd, indices_are_sorted=True)
        return jnp.sum(h)

    codes_sorted = jax.jit(jax.lax.sort)(codes)
    codes_sorted.block_until_ready()
    bench("scat_sorted0", scat_sort_only, codes_sorted)

    def scat_rand(c):
        h = jnp.zeros((SIZE,), i32).at[c].add(1)
        return jnp.sum(h)

    bench("scat_rand", scat_rand, codes)

    def gat_sort(sc, t):
        g = jax.lax.gather(
            t, sc[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1,), indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return jnp.sum(g.astype(i32))

    bench("gat_sorted0", gat_sort, codes_sorted, tab16)

    def screen_core(c, tabv):
        """S1 -> run lengths -> class screen scores -> unsort -> reduce."""
        n = c.shape[0]
        pos = jax.lax.iota(i32, n)
        sc, sp = jax.lax.sort((c, pos), num_keys=1)
        head = jnp.concatenate([jnp.ones((1,), bool), sc[1:] != sc[:-1]])
        idx = jax.lax.iota(i32, n)
        start = jax.lax.cummax(jnp.where(head, idx, 0))
        last = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
        end = jnp.flip(jax.lax.cummin(jnp.flip(
            jnp.where(last, idx + 1, 1 << 30))))
        v = jnp.minimum(end - start, 4095)
        s_int = tabv[v]  # 4096-entry table gather (small)
        _, s_un = jax.lax.sort((sp, s_int), num_keys=1)
        return jnp.sum(s_un)

    tabv = jax.device_put(
        rng.integers(0, 4096, size=4096, dtype=np.int32))
    bench("screen_core", screen_core, codes, tabv)
    bench("screen_c27", screen_core, codes_big, tabv, n=NBIG)

    def dynslice(c):
        sc = jax.lax.sort(c)
        nz = jnp.sum((sc < SIZE).astype(i32))
        tail = jax.lax.dynamic_slice(
            sc, (jnp.maximum(nz - 1024, 0),), (1024,))
        return jnp.sum(tail)

    bench("dynslice", dynslice, codes)


if __name__ == "__main__":
    main()
