#!/usr/bin/env python
"""Real-TPU probe of the device-complete pm pipeline (round 5 task 1).

For each k: time the device step (chained), a serial rep (dispatch +
packed pull + host finish — NO recount anywhere), and a pipelined rep
(async D2H riding under the next dispatch), then verify emitted regions
against the native sequential oracle (k <= 13: full f64 chain table;
k = 15 via PM_CHECK_BIG=1 — minutes of host time for the 8 GB table).

Run: python benchmarks/pm_probe.py > logs/pm_probe.log 2>&1
Env: PM_KS (default "12,13,15"), PM_BASES_K12 (201326592),
     PM_BASES_BIG (100663296), PM_REPS (3), PM_CHECK_BIG=0
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.sortscreen_probe import make_genome  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from kmer_spans_tpu.spans.pipeline import host_rank_chain
    from kmer_spans_tpu.spans.pm_pipeline import (
        finish_pm_spans,
        make_pm_span_pipeline,
        make_wide_pm_pipeline,
        unpack_pm_outputs,
    )
    from kmer_spans_tpu.utils import native

    ks = [int(x) for x in os.environ.get("PM_KS", "12,13,15").split(",")]
    reps = int(os.environ.get("PM_REPS", 3))
    check_big = os.environ.get("PM_CHECK_BIG", "0") == "1"
    block = 8192
    thr, min_w, min_s = 0.75, 100, 20.0
    log(f"devices={jax.devices()} ks={ks}")
    rng = np.random.default_rng(0)

    for k in ks:
        n = int(os.environ.get(
            "PM_BASES_K12" if k == 12 else "PM_BASES_BIG",
            str(201_326_592 if k == 12 else 100_663_296)))
        n = -(-n // block) * block
        nbases = make_genome(n, rng)
        cand = min(n // block, 512)
        if k >= 16:
            fn, meta = make_wide_pm_pipeline(k, block=block,
                                             cand_blocks=cand)
        else:
            fn, meta = make_pm_span_pipeline(k, block=block,
                                             cand_blocks=cand)
        log(f"--- k={k} n={n:,} cand={cand} cap={meta['list_cap']}")

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

        def finish(o):
            host = unpack_pm_outputs(np.asarray(o), n, meta)
            return finish_pm_spans(host, n, meta, thr, min_w, min_s)

        ts = []
        res = None
        for _ in range(reps):
            t0 = time.time()
            res = finish(fn(dev, thr32))
            ts.append(time.time() - t0)
        log(f"k={k} serial rep: {min(ts):.3f}s regions={len(res.regions)}"
            f" fallback={res.fallback} ({n/min(ts)/1e6:.0f} Mb/s)")

        # pipelined: depth-2 dispatch queue, eager async D2H
        p_reps = max(3, reps)
        t0 = time.time()
        q = []
        for _ in range(2):
            a = fn(dev, thr32)
            try:
                a.copy_to_host_async()
            except Exception:  # noqa: BLE001
                pass
            q.append(a)
        for i in range(p_reps):
            a = q.pop(0)
            # dispatch the replacement BEFORE finishing so the device
            # computes while the host unpacks/replays
            if i < p_reps - 2:
                b = fn(dev, thr32)
                try:
                    b.copy_to_host_async()
                except Exception:  # noqa: BLE001
                    pass
                q.append(b)
            res = finish(a)
        t_pipe = (time.time() - t0) / p_reps
        log(f"k={k} pipelined rep (x{p_reps}): {t_pipe:.3f}s "
            f"({n/t_pipe/1e6:.0f} Mb/s) regions={len(res.regions)} "
            f"fallback={res.fallback}")

        if native.available() and (k <= 13 or check_big) and k <= 15:
            t0 = time.time()
            counts_host, nw = native.host_spectrum(nbases, k)
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
