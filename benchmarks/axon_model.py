#!/usr/bin/env python
"""Measure the axon tunnel's cost model: dispatch chaining, D2H, H2D.

Questions this answers (feeding bench.py's architecture):
  1. Does enqueueing M dependent/independent dispatches then pulling once
     cost ~latency + M*compute (async pipelining works), or M*latency?
  2. D2H latency + bandwidth as a function of pull size.
  3. Does copy_to_host_async overlap with subsequent device compute?

Run: python benchmarks/axon_model.py > logs/axon_model.log 2>&1
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices={jax.devices()} jax={jax.__version__}", flush=True)

    n = 1 << 22  # 4M f32 = 16 MB working array
    x = jax.device_put(np.random.default_rng(0).standard_normal(
        n, dtype=np.float32))
    float(np.asarray(x[:1])[0])

    # a compute body with a known, tunable cost: R matmul passes
    def make_step(R):
        @jax.jit
        def step(v):
            m = v[:1 << 18].reshape(512, 512)
            for _ in range(R):
                m = jnp.tanh(m @ m.T / 512.0)
            return v.at[:1 << 18].set(m.reshape(-1))
        return step

    # calibrate single-step cost (includes one pull)
    for R in (0, 8, 64):
        st = make_step(R)
        y = st(x)
        float(np.asarray(y[:1])[0])  # compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            y = st(x)
            float(np.asarray(y[:1])[0])
            ts.append(time.time() - t0)
        print(f"single step R={R:3d}: {min(ts)*1e3:8.2f} ms", flush=True)

    # chained dispatches: M dependent steps, ONE pull at the end
    for R in (0, 8):
        st = make_step(R)
        for M in (1, 4, 16, 64):
            y = x
            t0 = time.time()
            for _ in range(M):
                y = st(y)
            float(np.asarray(y[:1])[0])
            t = time.time() - t0
            print(f"chain R={R} M={M:3d}: total={t*1e3:8.2f} ms "
                  f"({t/M*1e3:7.2f} ms/step)", flush=True)

    # D2H size sweep (latency + bandwidth)
    for sz in (4, 1 << 12, 1 << 16, 1 << 20, 1 << 22, 1 << 24):
        m = sz // 4
        arr = x[:m]
        np.asarray(arr)  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(arr)
            ts.append(time.time() - t0)
        t = min(ts)
        print(f"D2H {sz/1e6:8.3f} MB: {t*1e3:8.2f} ms "
              f"({sz/t/1e6:7.1f} MB/s)", flush=True)

    # H2D size sweep
    for sz in (1 << 16, 1 << 20, 1 << 24, 1 << 26):
        m = sz // 4
        h = np.zeros(m, np.float32)
        d = jax.device_put(h); float(np.asarray(d[:1])[0])  # warm path
        ts = []
        for _ in range(3):
            t0 = time.time()
            d = jax.device_put(h)
            float(np.asarray(d[:1])[0])
            ts.append(time.time() - t0)
        t = min(ts)
        print(f"H2D {sz/1e6:8.3f} MB: {t*1e3:8.2f} ms "
              f"({sz/t/1e6:7.1f} MB/s)", flush=True)

    # does copy_to_host_async overlap a subsequent dispatch?
    st = make_step(64)
    big = x[:1 << 22]  # 16 MB
    y = st(x); float(np.asarray(y[:1])[0])
    # (a) serial: pull big, then run+pull step
    t0 = time.time()
    np.asarray(big)
    y = st(x); float(np.asarray(y[:1])[0])
    t_serial = time.time() - t0
    # (b) async: start big pull, run step, then collect both
    t0 = time.time()
    big.copy_to_host_async()
    y = st(x)
    float(np.asarray(y[:1])[0])
    np.asarray(big)
    t_async = time.time() - t0
    print(f"overlap D2H(16MB)+compute: serial={t_serial*1e3:.1f} ms "
          f"async={t_async*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
