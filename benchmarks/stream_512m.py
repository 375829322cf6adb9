"""512 Mb streaming run on the real TPU, validated against the native oracle.

Demonstrates the int64/streaming claims at scale (round-2 verdict missing
#3 / directive 4): the wide-pair count accumulator, the exact integer
x_in carry, and boundary stitching across 16 x 32Mb chunks, with spans
AND scores bit-identical to the C-conformant native oracle.

Usage: python benchmarks/stream_512m.py > logs/stream_512m_r3.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from kmer_spans_tpu.oracle import weighted_ranks
    from kmer_spans_tpu.parallel.stream import StreamingSpanPipeline
    from kmer_spans_tpu.utils import native
    from kmer_spans_tpu.utils.metrics import Metrics

    N = int(float(os.environ.get("STREAM_BASES", 512 * 1024 * 1024)))
    CHUNK = 1 << 25  # 32M bases
    k = 8
    print(f"devices={jax.devices()} N={N:,} chunk={CHUNK:,} k={k}",
          flush=True)

    t0 = time.time()
    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, N, dtype=np.uint8)
    for s in range(5_000_000, N - 5000, 25_000_000):
        g[s:s + 3000] = np.tile(np.array([0, 3], np.uint8), 1500)
    for s in range(CHUNK - 100, N - 300, 4 * CHUNK):
        g[s:s + 200] = 4  # N gaps straddling chunk boundaries
    print(f"genome gen: {time.time()-t0:.1f}s", flush=True)

    def chunks():
        for i in range(0, N, CHUNK):
            yield g[i:i + CHUNK]

    metrics = Metrics()
    pipe = StreamingSpanPipeline(k, chunk_bases=CHUNK, block=8192,
                                 cand_blocks=192, margin_blocks=8)
    t0 = time.time()
    res = pipe.run(chunks, 0.75, 100, 20.0, metrics=metrics)
    t_stream = time.time() - t0
    print(f"stream: {t_stream:.1f}s ({N/t_stream/1e6:.0f} Mbases/s) "
          f"regions={len(res.regions)} unresolved={res.unresolved}",
          flush=True)
    import json
    print(json.dumps(metrics.summary()), flush=True)

    t0 = time.time()
    counts, nw = native.count_spectrum(g, k)
    ranks = weighted_ranks(counts, float(nw))
    beg, end, score, _ = native.find_spans(g, k, ranks, 0.75, 100, 20.0)
    print(f"native oracle: {time.time()-t0:.1f}s regions={len(beg)}",
          flush=True)

    assert res.n_kmers == nw, (res.n_kmers, nw)
    got = [(r[1], r[2], r[3]) for r in res.regions]
    want = [(int(b), int(e), float(s)) for b, e, s in zip(beg, end, score)]
    assert got == want, (
        f"MISMATCH: {len(got)} vs {len(want)}; "
        f"first diff {next((a, b) for a, b in zip(got, want) if a != b)}")
    print(f"OK: {len(got)} regions bit-identical to the native oracle",
        flush=True)

    if os.environ.get("STREAM_SCORING", "0") == "1":
        # round-5: stream the SAME genome under a non-rank scoring model
        # (BASELINE config 4 "all three scoring functions") and validate
        # against the native caller with the model's weight table
        from kmer_spans_tpu.models.scoring import ThresholdScoring

        model = ThresholdScoring(counts, 1.5 / (1 << (2 * k)))
        t0 = time.time()
        res2 = pipe.scan_stream(
            chunks, None, nw, 0.75, 100, 20.0,
            counts_host=counts, model=model)
        t2 = time.time() - t0
        print(f"stream threshold-scoring scan: {t2:.1f}s "
              f"({N/t2/1e6:.0f} Mbases/s) regions={len(res2.regions)} "
              f"unresolved={res2.unresolved}", flush=True)
        b2, e2, s2, _ = native.find_spans(
            g, k, model.weights, model.threshold, 100, 20.0)
        got2 = [(r[1], r[2], r[3]) for r in res2.regions]
        want2 = [(int(b), int(e), float(s))
                 for b, e, s in zip(b2, e2, s2)]
        assert got2 == want2, (
            f"SCORING MISMATCH: {len(got2)} vs {len(want2)}")
        print(f"OK: {len(got2)} threshold-scoring regions bit-identical",
              flush=True)


if __name__ == "__main__":
    main()
