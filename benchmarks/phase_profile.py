#!/usr/bin/env python
"""Phase-split profile of the span pipeline on the real TPU.

Times each device phase as its own tiny-output jit program (scalar
checksum outputs so no O(n) D2H rides the measurement), plus the packed
full pipeline and the host finisher.  Writes one line per phase to
stdout; run with logs redirected to a file (pipes buffer).

Env: PROF_BASES (default 5e7), PROF_K (default 8), PROF_REPS (default 3).
"""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args, reps=3):
    # first call = compile; then min of reps
    t0 = time.time()
    out = fn(*args)
    float(np.asarray(out).reshape(-1)[0])
    t_compile = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(np.asarray(out).reshape(-1)[0])
        ts.append(time.time() - t0)
    return t_compile, min(ts)


def main():
    n = int(float(os.environ.get("PROF_BASES", 5e7)))
    k = int(os.environ.get("PROF_K", 8))
    reps = int(os.environ.get("PROF_REPS", 3))
    block = 8192
    n = -(-n // block) * block

    import jax
    import jax.numpy as jnp

    from kmer_spans_tpu.ops.blocked import (
        blocked_codes,
        blocked_scan_summaries,
        blocked_scored,
    )
    from kmer_spans_tpu.ops.gather import (
        class_screen_scores,
        class_table_from_mass,
        prerolled_table,
    )
    from kmer_spans_tpu.ops.pallas_kernels import pallas_count_spectrum
    from kmer_spans_tpu.parallel.pipeline import _rank_mass

    log(f"devices={jax.devices()} n={n:,} k={k}")
    rng = np.random.default_rng(0)
    nbases = rng.integers(0, 4, size=n, dtype=np.uint8)
    nbases[1_000_000:1_003_000] = np.tile(np.array([0, 3], np.uint8), 1500)
    dev = jax.device_put(nbases)
    float(np.asarray(dev[:1])[0])

    nb = n // block

    # 0. dispatch overhead: trivial program
    @jax.jit
    def f_null(x):
        return x[:1].astype(jnp.int32) + 1

    tc, t = timeit(f_null, dev, reps=reps)
    log(f"null dispatch:    compile={tc:6.1f}s  steady={t*1e3:8.2f} ms")

    # 1. codes+valid
    @jax.jit
    def f_codes(x):
        b2 = (x & 3).reshape(nb, block)
        v2 = (x < 4).reshape(nb, block)
        codes, kv = blocked_codes(b2, v2, k)
        return jnp.sum(codes, dtype=jnp.int32) + jnp.sum(kv)

    tc, t = timeit(f_codes, dev, reps=reps)
    log(f"codes+valid:      compile={tc:6.1f}s  steady={t*1e3:8.2f} ms  "
        f"({t/n*1e9:.3f} ns/el)")

    # 2. codes + pallas count
    @jax.jit
    def f_count(x):
        b2 = (x & 3).reshape(nb, block)
        v2 = (x < 4).reshape(nb, block)
        codes, kv = blocked_codes(b2, v2, k)
        codes = jnp.where(kv, codes, 0)
        counts = pallas_count_spectrum(codes, kv, k)
        return counts[:1]

    tc, t = timeit(f_count, dev, reps=reps)
    log(f"codes+count(MXU): compile={tc:6.1f}s  steady={t*1e3:8.2f} ms  "
        f"({t/n*1e9:.3f} ns/el)")

    # 3. codes + scatter count
    @jax.jit
    def f_scatter(x):
        b2 = (x & 3).reshape(nb, block)
        v2 = (x < 4).reshape(nb, block)
        codes, kv = blocked_codes(b2, v2, k)
        codes = jnp.where(kv, codes, 0)
        counts = jnp.zeros(1 << (2 * k), jnp.int32).at[codes].add(
            kv.astype(jnp.int32))
        return counts[:1]

    tc, t = timeit(f_scatter, dev, reps=reps)
    log(f"codes+count(scat):compile={tc:6.1f}s  steady={t*1e3:8.2f} ms  "
        f"({t/n*1e9:.3f} ns/el)")

    # 4. + rank mass (argsort of 4^k)
    @jax.jit
    def f_rank(x):
        b2 = (x & 3).reshape(nb, block)
        v2 = (x < 4).reshape(nb, block)
        codes, kv = blocked_codes(b2, v2, k)
        codes = jnp.where(kv, codes, 0)
        counts = pallas_count_spectrum(codes, kv, k)
        mass = _rank_mass(counts)
        return mass[:1]

    tc, t = timeit(f_rank, dev, reps=reps)
    log(f"...+rank_mass:    compile={tc:6.1f}s  steady={t*1e3:8.2f} ms")

    # 5. + class screen gather
    @jax.jit
    def f_screen(x, thr):
        b2 = (x & 3).reshape(nb, block)
        v2 = (x < 4).reshape(nb, block)
        codes, kv = blocked_codes(b2, v2, k)
        codes = jnp.where(kv, codes, 0)
        counts = pallas_count_spectrum(codes, kv, k)
        mass = _rank_mass(counts)
        total = jnp.sum(counts).astype(jnp.float32)
        tabR = prerolled_table(class_table_from_mass(mass, total))
        s = class_screen_scores(tabR, codes, thr)
        return jnp.sum(s, dtype=jnp.float32).reshape(1)

    thr32 = jnp.float32(0.75)
    tc, t = timeit(f_screen, dev, thr32, reps=reps)
    log(f"...+class screen: compile={tc:6.1f}s  steady={t*1e3:8.2f} ms")

    # 6. + scan summaries
    @jax.jit
    def f_scan(x, thr):
        b2 = (x & 3).reshape(nb, block)
        v2 = (x < 4).reshape(nb, block)
        codes, kv = blocked_codes(b2, v2, k)
        scored = blocked_scored(v2, kv)
        codes = jnp.where(kv, codes, 0)
        counts = pallas_count_spectrum(codes, kv, k)
        mass = _rank_mass(counts)
        total = jnp.sum(counts).astype(jnp.float32)
        tabR = prerolled_table(class_table_from_mass(mass, total))
        s = class_screen_scores(tabR, codes, thr)
        bm, bl = blocked_scan_summaries(s, scored)
        return jnp.sum(bm).reshape(1)

    tc, t = timeit(f_scan, dev, thr32, reps=reps)
    log(f"...+scan summ:    compile={tc:6.1f}s  steady={t*1e3:8.2f} ms")

    # 7. full packed pipeline + D2H + host finish
    from kmer_spans_tpu.spans.pipeline import (
        finish_spans,
        make_span_pipeline,
        unpack_outputs,
    )

    cand = 128
    fn = make_span_pipeline(k, block=block, cand_blocks=cand, packed=True)
    t0 = time.time()
    out = fn(dev, thr32)
    v = np.asarray(out)
    log(f"full packed:      compile={time.time()-t0:6.1f}s  "
        f"packed vec = {v.nbytes/1e6:.2f} MB")
    for _ in range(reps):
        t0 = time.time()
        out = fn(dev, thr32)
        float(np.asarray(out[:1])[0])
        t_dev = time.time() - t0
        t0 = time.time()
        v = np.asarray(out)
        t_pull = time.time() - t0
        t0 = time.time()
        host = unpack_outputs(v, k, n, block, cand,
                              packed_bases=fn.packed_bases)
        res = finish_spans(host, n, 0.75, 100, 20.0, block=block)
        t_host = time.time() - t0
        log(f"  device={t_dev*1e3:8.2f} ms  D2H={t_pull*1e3:8.2f} ms "
            f"({v.nbytes/t_pull/1e6:6.1f} MB/s)  host={t_host*1e3:8.2f} ms  "
            f"regions={len(res.regions)}")


if __name__ == "__main__":
    main()
