#!/usr/bin/env python
"""Benchmark: full count + rank + scan + span-call pipeline, one chip.

Prints ONE JSON line:
  {"metric": "pipeline_bases_per_sec", "value": N, "unit": "bases/s",
   "vs_baseline": R}

Pipeline measured end-to-end from device-resident genome to final region
list on the host: device codes + spectrum + integer-mass ranks + max-plus
scan + sparse candidate compaction, then host-side exact f64 replay of
candidate blocks (kmer_spans_tpu.spans.pipeline).  One-time costs excluded
from the steady-state rate: XLA compile and the initial H2D staging (both
reported on stderr; the dev-environment TPU tunnel pays minutes per
compile and ~60 MB/s transfers, which no production deployment would).

vs_baseline compares against the reference C implementation's published
single-core rate for the same k on its 50 Mb benchmark (BASELINE.md,
test.R:45-64).  The reference number is COUNT-ONLY (one pass); ours is the
COMPLETE pipeline, so the ratio is conservative in the reference's favor.

Env knobs: BENCH_BASES (default 5e7), BENCH_K (default 8; k=12 compiles are pathologically slow on the axon AOT helper),
BENCH_REPS (default 3), BENCH_BLOCK (default 8192), BENCH_CAND (128).
"""

import json
import os
import sys
import time

import numpy as np

# Reference single-core kmer.count rates (bases/s) from test.R (BASELINE.md)
_REF_COUNT_RATE = {6: 1.19e9, 8: 1.11e9, 10: 3.73e8, 12: 6.4e7}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_genome(n, rng):
    nbases = rng.integers(0, 4, size=n, dtype=np.uint8)
    # plant repeat islands so span-calling has real work to do
    for start in range(1_000_000, n - 5000, 5_000_000):
        nbases[start : start + 3000] = np.tile(np.array([0, 3], np.uint8), 1500)
    # sprinkle N gaps
    for start in range(2_500_000, n - 200, 10_000_000):
        nbases[start : start + 100] = 4
    return nbases


def main():
    n = int(float(os.environ.get("BENCH_BASES", 5e7)))
    k = int(os.environ.get("BENCH_K", 8))
    reps = int(os.environ.get("BENCH_REPS", 3))
    block = int(os.environ.get("BENCH_BLOCK", 8192))
    cand = int(os.environ.get("BENCH_CAND", 128))
    thr, min_w, min_s = 0.75, 100, 20.0
    n = -(-n // block) * block

    import jax
    import jax.numpy as jnp

    from kmer_spans_tpu.spans.pipeline import (
        finish_spans,
        make_span_pipeline,
        unpack_outputs,
    )

    log(f"devices: {jax.devices()}  n={n:,} k={k} block={block} cand={cand}")
    rng = np.random.default_rng(0)
    nbases = make_genome(n, rng)

    fn = make_span_pipeline(k, block=block, cand_blocks=cand, packed=True)
    t0 = time.time()
    dev = jax.device_put(nbases)
    jax.block_until_ready(dev)
    t_h2d = time.time() - t0
    log(f"H2D staging: {t_h2d:.2f}s ({n/t_h2d/1e6:.0f} MB/s)")

    thr32 = jnp.float32(thr)
    t0 = time.time()
    out = fn(dev, thr32)
    np.asarray(out)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    # steady state: device step + ONE packed D2H pull + host replay
    times = []
    regions = None
    t_dev = None
    for rep in range(reps):
        t0 = time.time()
        out = fn(dev, thr32)
        if rep == 0:
            # diagnostic split (adds a 4-byte fence pull; excluded from min)
            float(np.asarray(out[:1])[0])
            t_dev = time.time() - t0
        host = unpack_outputs(out, k, n, block, cand)
        res = finish_spans(host, n, thr, min_w, min_s, block=block)
        t_tot = time.time() - t0
        times.append(t_tot)
        regions = res
    t_tot = min(times[1:]) if reps > 1 else times[0]
    log(f"device step: {t_dev:.3f}s ({n/t_dev/1e6:.0f} Mbases/s device-only)")
    log(f"end-to-end: {t_tot:.3f}s  regions={len(regions.regions)} "
        f"fallback={regions.fallback}")
    if regions.fallback:
        log("WARNING: candidate capacity overflow — rate not representative")

    rate = n / t_tot
    ref = _REF_COUNT_RATE.get(k, 6.4e7)
    print(json.dumps({
        "metric": "pipeline_bases_per_sec",
        "value": round(rate),
        "unit": "bases/s",
        "vs_baseline": round(rate / ref, 3),
    }))


if __name__ == "__main__":
    main()
