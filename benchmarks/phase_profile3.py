"""Phase profile of the round-3 pipeline on real TPU, chained dispatches.

Each phase is a jitted prefix of make_span_pipeline's program; timing is
(time of CH chained dispatches + one 4-byte sync) / CH, which amortizes
the ~25-35 ms tunnel sync tax out of the numbers (benchmarks/
axon_model.py).  Also compares class_bits 2 vs 4 and count tiles.

Usage: python benchmarks/phase_profile3.py > logs/phase_profile3.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def chained(fn, args, ch=8, reps=2):
    out = fn(*args)
    float(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        o = None
        for _ in range(ch):
            o = fn(*args)
        float(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0]))
        ts.append((time.time() - t0) / ch)
    return min(ts)


def main():
    from kmer_spans_tpu.ops.blocked import blocked_codes, blocked_scored
    from kmer_spans_tpu.ops.gather import (
        class_table_from_mass,
        prerolled_table,
        screen_thr_q,
    )
    from kmer_spans_tpu.ops.pallas_kernels import pallas_count_aug
    from kmer_spans_tpu.ops.screen_scan import fused_screen_scan
    from kmer_spans_tpu.parallel.pipeline import _rank_mass
    from kmer_spans_tpu.spans.pipeline import make_span_pipeline

    k = 8
    block = int(os.environ.get("PP_BLOCK", 16384))
    n = (12288 * 16384 // (4 * block)) * (4 * block)
    log(f"devices={jax.devices()} n={n:,} block={block}")
    rng = np.random.default_rng(0)
    nbases = rng.integers(0, 4, size=n, dtype=np.uint8)
    for start in range(10_000_000, n - 5000, 50_000_000):
        nbases[start:start + 3000] = np.tile(np.array([0, 3], np.uint8), 1500)
    dev = jax.device_put(nbases)
    float(jax.device_get(dev.ravel()[0]))
    log("staged")

    nb = n // block

    def aug_of(x):
        b2 = (x & 3).reshape(nb, block)
        v2 = (x < 4).reshape(nb, block)
        codes, kv = blocked_codes(b2, v2, k)
        scored = blocked_scored(v2, kv)
        codes = jnp.where(kv, codes, 0)
        return (codes | (kv.astype(jnp.int32) << 16)
                | (scored.astype(jnp.int32) << 17))

    p_aug = jax.jit(lambda x: aug_of(x)[:1, :8])
    p_cnt = {}
    for tile in (32768, 65536):
        p_cnt[tile] = jax.jit(
            lambda x, t=tile: pallas_count_aug(aug_of(x), k, tile=t))

    def upto_rank(x):
        aug = aug_of(x)
        counts = pallas_count_aug(aug, k, tile=32768)
        mass = _rank_mass(counts)
        return mass[:8]

    p_rank = jax.jit(upto_rank)

    def upto_screen(x, cb):
        aug = aug_of(x)
        counts = pallas_count_aug(aug, k, tile=32768)
        mass = _rank_mass(counts)
        total = jnp.sum(counts).astype(jnp.float32)
        tabR = prerolled_table(class_table_from_mass(mass, total, cb))
        thr_q = screen_thr_q(jnp.float32(0.75))
        sb = max(1, min(8, 256 // (block // 128)))
        tA, tB, maxA, maxB = fused_screen_scan(
            tabR, aug.reshape(-1), thr_q, class_bits=cb, block=block,
            sub_blocks=sb)
        return tA

    p_scr = {cb: jax.jit(lambda x, c=cb: upto_screen(x, c)) for cb in (2, 4)}

    full = {cb: make_span_pipeline(
        k, block=block, cand_blocks=64, packed=True, class_bits=cb)
        for cb in (2, 4)}

    t = chained(p_aug, (dev,))
    log(f"aug only:            {t*1e3:8.2f} ms ({t/n*1e9:.3f} ns/el)")
    for tile in (32768, 65536):
        try:
            t = chained(p_cnt[tile], (dev,))
            log(f"aug+count T{tile}: {t*1e3:10.2f} ms ({t/n*1e9:.3f} ns/el)")
        except Exception as e:  # noqa: BLE001
            log(f"count T{tile} FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}")
    t = chained(p_rank, (dev,))
    log(f"+rank mass:          {t*1e3:8.2f} ms ({t/n*1e9:.3f} ns/el)")
    for cb in (4, 2):
        t = chained(p_scr[cb], (dev,))
        log(f"+fused screen cb{cb}:  {t*1e3:8.2f} ms ({t/n*1e9:.3f} ns/el)")
    thr32 = jnp.float32(0.75)
    for cb in (4, 2):
        t = chained(full[cb], (dev, thr32), ch=4)
        log(f"FULL packed cb{cb}:    {t*1e3:8.2f} ms ({t/n*1e9:.3f} ns/el)")
    log("done")


if __name__ == "__main__":
    main()
