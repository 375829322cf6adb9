#!/usr/bin/env python
"""Real-TPU probe of the sort screen: perf + exactness at k=12/13/15.

For each k: run make_span_pipeline (auto -> sort screen) on a planted
200/100 Mb genome, time the device step (chained) and the full
pipelined rep (device + packed pull + host-recount replay), and verify
the emitted regions against the native sequential oracle (ks_spans with
the exact f64 rank chain) — the first time any k >= 13 touches real
hardware (round-3 verdict missing #1).

Run: python benchmarks/sortscreen_probe.py > logs/sortscreen_probe.log 2>&1
Env: SP_KS (default "12,13,15"), SP_BASES_K12 (default 201326592),
     SP_BASES_BIG (default 100663296), SP_REPS (default 2)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def make_genome(n, rng):
    nbases = rng.integers(0, 4, size=n, dtype=np.uint8)
    for start in range(1_000_000, n - 5000, 5_000_000):
        nbases[start : start + 3000] = np.tile(
            np.array([0, 3], np.uint8), 1500)
    for start in range(2_500_000, n - 200, 10_000_000):
        nbases[start : start + 100] = 4
    return nbases


def main():
    import jax
    import jax.numpy as jnp

    from kmer_spans_tpu.spans.pipeline import (
        finish_spans,
        host_rank_chain,
        make_span_pipeline,
        unpack_outputs,
    )
    from kmer_spans_tpu.utils import native

    ks = [int(x) for x in os.environ.get("SP_KS", "12,13,15").split(",")]
    reps = int(os.environ.get("SP_REPS", 2))
    block = 8192
    thr, min_w, min_s = 0.75, 100, 20.0
    log(f"devices={jax.devices()} ks={ks}")
    rng = np.random.default_rng(0)

    for k in ks:
        n = int(os.environ.get(
            "SP_BASES_K12" if k == 12 else "SP_BASES_BIG",
            str(201_326_592 if k == 12 else 100_663_296)))
        n = -(-n // block) * block
        nbases = make_genome(n, rng)
        cand = min(n // block, 512)
        fn = make_span_pipeline(k, block=block, cand_blocks=cand,
                                packed=True)
        log(f"--- k={k} n={n:,} cand={cand} screen={fn.screen}")

        t0 = time.time()
        counts_host, nw = native.host_spectrum(nbases, k)
        t_count = time.time() - t0
        log(f"k={k} host recount: {t_count:.2f}s ({nw:,} kmers, "
            f"{n/t_count/1e6:.0f} Mb/s)")

        t0 = time.time()
        dev = jax.device_put(nbases)
        float(jax.device_get(dev[:1])[0])
        log(f"k={k} H2D: {time.time()-t0:.2f}s")

        thr32 = jnp.float32(thr)
        t0 = time.time()
        out = fn(dev, thr32)
        float(jax.device_get(out[:1])[0])
        log(f"k={k} compile+first: {time.time()-t0:.1f}s")

        t0 = time.time()
        o = None
        for _ in range(2):
            o = fn(dev, thr32)
        float(jax.device_get(o[:1])[0])
        t_dev = (time.time() - t0) / 2
        log(f"k={k} device step: {t_dev:.3f}s ({n/t_dev/1e6:.0f} Mb/s, "
            f"{t_dev/n*1e9:.2f} ns/el)")

        def finish(out):
            host = unpack_outputs(np.asarray(out), k, n, block, cand,
                                  packed_bases=fn.packed_bases,
                                  packed_counts=fn.packed_counts,
                                  lazy_codes=True)
            return finish_spans(host, n, thr, min_w, min_s, block=block,
                                counts=counts_host)

        ts = []
        res = None
        for _ in range(reps):
            t0 = time.time()
            res = finish(fn(dev, thr32))
            ts.append(time.time() - t0)
        log(f"k={k} serial rep: {min(ts):.3f}s regions={len(res.regions)} "
            f"fallback={res.fallback} "
            f"({n/min(ts)/1e6:.0f} Mb/s serial excl. recount)")

        # exactness vs the native sequential oracle (k <= 13: full f64
        # chain table; above: spot-check via the same finisher rank path
        # which test_sortscreen pins against the oracle on CPU)
        if k <= 13 and native.available():
            t0 = time.time()
            ranks = host_rank_chain(counts_host, nw)
            beg, end, score, _ = native.find_spans(
                nbases, k, ranks, thr, min_w, min_s)
            t_or = time.time() - t0
            got = [(r[1], r[2], r[3]) for r in res.regions]
            want = list(zip(beg.tolist(), end.tolist(), score.tolist()))
            ok = got == want
            log(f"k={k} oracle check: {len(want)} regions, match={ok} "
                f"(oracle {t_or:.1f}s)")
            if not ok:
                log(f"  got[:3]={got[:3]}")
                log(f"  want[:3]={want[:3]}")
        del dev, out, o
    log("probe done")


if __name__ == "__main__":
    main()
