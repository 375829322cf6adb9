#!/usr/bin/env python
"""Axon D2H-overlap probe: pipelined rep time vs dispatch-queue depth.

Measured (800 Mb, k=8, v5e via the dev tunnel): serial dispatch+pull
0.96 s/rep; depth-2 0.775; depth-3 0.750; depth-4 0.761 (device step
alone 0.702).  copy_to_host_async BEFORE blocking is what lets the pull
ride under later dispatches — without it pipelined == serial.  These
numbers set bench.py's depth-3 queue.

Run: python benchmarks/overlap_probe.py  (real TPU)
"""
import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from bench import make_genome
from kmer_spans_tpu.spans.pipeline import make_span_pipeline, unpack_outputs, finish_spans
k, n, block, cand = 8, 800_030_720, 8192, 1600
rng = np.random.default_rng(0)
nb = make_genome(n, rng)
fn = make_span_pipeline(k, block=block, cand_blocks=cand, packed=True, class_bits=2)
dev = jax.device_put(nb)
thr = jnp.float32(0.75)
out = fn(dev, thr); _ = float(jax.device_get(out.ravel()[0]))
def finish(v):
    got = unpack_outputs(np.asarray(v), k, n, block, cand, packed_bases=fn.packed_bases, packed_counts=True, lazy_codes=True)
    return finish_spans(got, n, 0.75, 100, 20.0, block=block)
for D in (2, 3, 4):
    R = 6
    t0=time.time()
    q = []
    for _ in range(D):
        q.append(fn(dev, thr)); q[-1].copy_to_host_async()
    for _ in range(R-D):
        nxt = fn(dev, thr); nxt.copy_to_host_async()
        finish(q.pop(0)); q.append(nxt)
    for a in q: finish(a)
    print(f"depth{D}: {(time.time()-t0)/R:.3f}s/rep")
