#!/usr/bin/env python
"""Real-TPU probe of the WIDE (k=17) pipeline: perf + exactness.

BASELINE config 5's single-chip leg: run make_wide_span_pipeline(17) on
a planted ~100 Mb genome on the real chip — pair codes, 2-key sort
screen, O(n) device memory (a dense spectrum would be 68 GB) — then
verify emitted spans against the sequential oracle replay over the
sparse host spectrum (SparseRanks; bit-identical scores).

Run: python benchmarks/k17_probe.py > logs/k17_probe.log 2>&1
Env: K17_BASES (default 100663296), K17_REPS (default 2)
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

    from kmer_spans_tpu.encoding import PackedSeq
    from kmer_spans_tpu.spans.pipeline import (
        finish_wide_spans,
        make_wide_span_pipeline,
        unpack_wide_outputs,
    )
    from kmer_spans_tpu.stats.ranks import SparseRanks

    k = 17
    n = int(float(os.environ.get("K17_BASES", 100_663_296)))
    reps = int(os.environ.get("K17_REPS", 2))
    block, cand = 8192, 512
    thr, min_w, min_s = 0.75, 100, 20.0
    log(f"devices={jax.devices()} k={k} n={n:,} block={block} cand={cand}")

    rng = np.random.default_rng(17)
    nb = make_genome(n, rng)

    from kmer_spans_tpu.utils import native

    t0 = time.time()
    ucodes, ucounts, n_words = native.host_spectrum_sparse(nb, k)
    log(f"host sparse recount: {time.time()-t0:.1f}s "
        f"({n_words:,} kmers, {len(ucodes):,} distinct, "
        f"native={native.available()})")

    fn = make_wide_span_pipeline(k, block=block, cand_blocks=cand)
    t0 = time.time()
    dev = jax.device_put(nb)
    float(jax.device_get(dev.ravel()[0]))
    log(f"H2D staging: {time.time()-t0:.1f}s")
    thr32 = jnp.float32(thr)
    t0 = time.time()
    out = fn(dev, thr32)
    float(jax.device_get(out.ravel()[0]))
    log(f"compile+first: {time.time()-t0:.1f}s")

    # chained device step (one sync; amortizes the ~30ms tunnel tax)
    chain = 2
    t0 = time.time()
    o = None
    for _ in range(chain):
        o = fn(dev, thr32)
    float(jax.device_get(o.ravel()[0]))
    t_dev = (time.time() - t0) / chain
    log(f"device step (chained x{chain}): {t_dev:.3f}s "
        f"({n/t_dev/1e6:.1f} Mb/s, {t_dev/n*1e9:.2f} ns/el)")

    regions = None
    for _ in range(reps):
        t0 = time.time()
        v = np.asarray(fn(dev, thr32))
        got = unpack_wide_outputs(v, n, block, cand)
        regions = finish_wide_spans(
            got, n, k, thr, min_w, min_s, (ucodes, ucounts, n_words),
            block=block)
        log(f"serial rep: {time.time()-t0:.3f}s regions="
            f"{len(regions.regions)} fallback={regions.fallback}")
    assert not regions.fallback

    # independent host oracle, vectorized (the sequential find_regions
    # with a scalar lookup would take hours at 100 Mb): exact chain
    # ranks via SparseRanks.lookup + the trusted f64 stretch replayer
    t0 = time.time()
    sr = SparseRanks(ucodes, ucounts)
    from kmer_spans_tpu.encoding import kmer_codes_np
    from kmer_spans_tpu.spans.extract import extract_spans

    p = PackedSeq(bases=nb & 3, valid=nb < 4)
    codes, kv = kmer_codes_np(p, k)
    scored = kv & np.concatenate([p.valid[1:], [False]])
    s = np.zeros(n, np.float64)
    s[scored] = sr.lookup(codes[scored]) - thr
    expect = extract_spans(s, scored, min_w, min_s, seq_id=0)
    log(f"oracle replay: {time.time()-t0:.1f}s regions={len(expect)}")
    got_t = [(r[1], r[2], r[3]) for r in regions.regions]
    want_t = [(e[1], e[2], e[3]) for e in expect]
    log(f"match={got_t == want_t} n_regions={len(got_t)}")
    assert got_t == want_t


if __name__ == "__main__":
    main()
