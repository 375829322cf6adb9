#!/usr/bin/env python
"""Benchmark: full count + rank + scan + span-call pipeline, one chip.

Prints ONE JSON line:
  {"metric": "pipeline_bases_per_sec", "value": N, "unit": "bases/s",
   "vs_baseline": R}

vs_baseline compares against the reference C implementation's published
single-core rate for the same k on its 50 Mb benchmark (BASELINE.md —
kmer.count timings, test.R:45-64).  Note that the reference number is
COUNT-ONLY (one pass); our measured number is the COMPLETE pipeline
(count + rank + scan + exact span extraction), so the comparison is
conservative in the reference's favor.

Env knobs: BENCH_BASES (default 5e7), BENCH_K (default 12),
BENCH_COUNT (scatter|sort|auto), BENCH_REPS (default 3).
"""

import json
import os
import sys
import time

import numpy as np

# Reference single-core kmer.count rates (bases/s) from test.R (BASELINE.md)
_REF_COUNT_RATE = {6: 1.19e9, 8: 1.11e9, 10: 3.73e8, 12: 6.4e7, 15: 6.4e7}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_fn(k):
    import jax
    import jax.numpy as jnp

    from kmer_spans_tpu.ops.codes import kmer_codes
    from kmer_spans_tpu.ops.count import (
        count_spectrum_scatter,
        count_spectrum_sort,
    )
    from kmer_spans_tpu.ops.scan import _combine, score_elements
    from kmer_spans_tpu.parallel.pipeline import _rank_mass

    def make(count_fn):
        @jax.jit
        def fn(nbases, thr_mass_floor, thr, total_hint):
            # nbases: uint8, value 4 == N; halves H2D vs separate valid array
            valid = nbases < 4
            bases = nbases & 3
            codes, kmer_valid, scored = kmer_codes(bases, valid, k)
            counts = count_fn(codes, kmer_valid, k)
            mass = _rank_mass(counts)
            total = jnp.sum(counts).astype(jnp.float32)
            pm = mass[codes]
            # exact sign: integer compare against floor(thr*total)
            pos = scored & (pm > thr_mass_floor)
            s = (pm.astype(jnp.float32) - thr * total) / total
            a, b = score_elements(s, scored)
            A, B = jax.lax.associative_scan(_combine, (a, b))
            S = jnp.maximum(A, B)
            return counts, S, pos

        return fn

    return {
        "scatter": make(count_spectrum_scatter),
        "sort": make(count_spectrum_sort),
    }


def host_extract(nbases, k, counts, S_np, pos_np, thr, min_w, min_s):
    """Exact span extraction from device outputs (host, f64)."""
    from kmer_spans_tpu.encoding import kmer_codes_np, PackedSeq
    from kmer_spans_tpu.oracle import weighted_ranks
    from kmer_spans_tpu.spans.extract import extract_spans

    total = counts.sum()
    ranks = weighted_ranks(counts, float(total))
    p = PackedSeq(bases=(nbases & 3), valid=(nbases < 4))
    codes, kv = kmer_codes_np(p, k)
    nv = np.zeros(p.n, bool)
    nv[:-1] = p.valid[1:]
    scored = kv & nv
    s = np.where(scored, ranks[codes] - thr, 0.0)
    return extract_spans(s, scored, min_w, min_s, seq_id=0)


def main():
    n = int(float(os.environ.get("BENCH_BASES", 5e7)))
    k = int(os.environ.get("BENCH_K", 12))
    reps = int(os.environ.get("BENCH_REPS", 3))
    strategy = os.environ.get("BENCH_COUNT", "auto")
    thr, min_w, min_s = 0.75, 100, 20.0

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}  n={n:,} k={k}")
    rng = np.random.default_rng(0)
    nbases = rng.integers(0, 4, size=n, dtype=np.uint8)
    # plant repeat islands so span-calling has real work to do
    for start in range(1_000_000, n - 5000, 5_000_000):
        nbases[start : start + 3000] = np.tile(
            np.array([0, 3], np.uint8), 1500
        )
    # sprinkle N gaps
    for start in range(2_500_000, n - 200, 10_000_000):
        nbases[start : start + 100] = 4

    fns = build_fn(k)
    which = ["scatter", "sort"] if strategy == "auto" else [strategy]

    # warmup / compile on full shape, then pick the faster strategy
    dev = jnp.asarray(nbases)
    thr32 = jnp.float32(thr)
    dummy_floor = jnp.int32(0)
    best = None
    for name in which:
        fn = fns[name]
        t0 = time.time()
        out = fn(dev, dummy_floor, thr32, jnp.float32(n))
        jax.block_until_ready(out)
        compile_time = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(dev, dummy_floor, thr32, jnp.float32(n))
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        t_dev = min(ts)
        log(f"{name}: compile {compile_time:.1f}s  device {t_dev:.3f}s "
            f"({n / t_dev / 1e6:.0f} Mbases/s device-only)")
        if best is None or t_dev < best[1]:
            best = (name, t_dev, out)

    name, t_dev, out = best
    # timed end-to-end: H2D + device + D2H + host ranks + exact extraction
    fn = fns[name]
    t0 = time.time()
    dev = jax.device_put(nbases)
    counts, S, pos = fn(dev, dummy_floor, thr32, jnp.float32(n))
    jax.block_until_ready((counts, S, pos))
    t_mid = time.time()
    counts_np = np.asarray(counts)
    pos_np = np.asarray(pos)
    S_np = np.asarray(S)
    t_pull = time.time()
    regions = host_extract(nbases, k, counts_np, S_np, pos_np, thr, min_w, min_s)
    t_end = time.time()
    log(f"breakdown: device(incl H2D) {t_mid-t0:.3f}s  pull {t_pull-t_mid:.3f}s "
        f"  host extract {t_end-t_pull:.3f}s  regions={len(regions)}")
    elapsed = t_end - t0
    rate = n / elapsed
    ref = _REF_COUNT_RATE.get(k, 6.4e7)
    result = {
        "metric": "pipeline_bases_per_sec",
        "value": round(rate),
        "unit": "bases/s",
        "vs_baseline": round(rate / ref, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
