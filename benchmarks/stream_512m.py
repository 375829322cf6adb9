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


if __name__ == "__main__":
    main()
