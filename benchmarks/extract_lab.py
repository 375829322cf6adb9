#!/usr/bin/env python
"""Micro-lab: flagged-head extraction variants for the pm screen (v5e).

The smallv extract currently sorts ALL n masked indices (1-operand
lax.sort, ~2.5 ns/el).  Listed heads are provably >= t_list apart, so a
per-group min over groups of G <= t_list positions captures every one:
sort cost drops to n/G elements IF the minor-G reduction itself is
cheap (strided slices measured +14 ns/el — minor-dim tricks can trap).

Run: python benchmarks/extract_lab.py > logs/extract_lab.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("EL_BASES", 100_663_296))
    cap = 1 << 17
    rng = np.random.default_rng(0)
    flags_np = rng.random(n) < 1e-4
    flags = jax.device_put(flags_np)
    jax.device_get(flags[:1])
    i32 = jnp.int32
    SENT = jnp.int32(0x7FFFFFFF)

    def stage(name, body):
        f = jax.jit(body)
        t0 = time.time()
        o = f(flags)
        float(jax.device_get(o.ravel()[0]))
        tc = time.time() - t0
        ts = []
        for _ in range(2):
            t0 = time.time()
            for _ in range(2):
                o = f(flags)
            float(jax.device_get(o.ravel()[0]))
            ts.append((time.time() - t0) / 2)
        t = min(ts)
        log(f"{name:24s} {t:.3f}s  {t/n*1e9:6.2f} ns/el (compile {tc:.0f}s)")

    def full_sort(fl):
        idx = jax.lax.iota(i32, n)
        s = jax.lax.sort(jnp.where(fl, idx, SENT))
        return s[:cap]

    def groupmin(G):
        def body(fl):
            idx = jax.lax.iota(i32, n)
            m = jnp.min(jnp.where(fl, idx, SENT).reshape(n // G, G),
                        axis=1)
            s = jax.lax.sort(m)
            return s[:cap]
        return body

    def groupmin2d(G):
        # 2D-tiled variant: reduce along a 128-wide lane-major layout
        def body(fl):
            idx = jax.lax.iota(i32, n)
            x = jnp.where(fl, idx, SENT).reshape(n // (G * 128), G, 128)
            m = jnp.min(x, axis=1).reshape(-1)
            s = jax.lax.sort(m)
            return s[:cap]
        return body

    stage("full 1-op sort", full_sort)
    for G in (4, 8):
        stage(f"groupmin G={G}", groupmin(G))
        stage(f"groupmin2d G={G}", groupmin2d(G))
    log("lab done")


if __name__ == "__main__":
    main()
