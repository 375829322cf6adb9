#!/usr/bin/env python
"""Scaling-efficiency harness: the sharded pipeline step at 1..N devices.

Two modes:

  * weak scaling (default): genome size scales with the mesh; efficiency
    = rate / (rate_1dev * n_dev).  Meaningful ONLY on real multi-chip
    hardware — virtual CPU devices share the same silicon, so weak
    "efficiency" degenerates to ~1/n_dev by construction.
  * --fixed-bases: SAME total genome across mesh sizes; efficiency =
    rate_ndev / rate_1dev.  On virtual devices this is the honest
    plumbing metric — it isolates the cost the sharded program adds
    (ppermute halos, psum'd spectrum, all_gather carries, shard_map
    partitioning) on identical hardware.  An efficiency near 1 means
    the collective machinery is ~free and real-chip scaling will be
    bandwidth-, not overhead-, limited.

    JAX_PLATFORMS= python benchmarks/scaling.py --virtual 8 --fixed-bases 1e8

On a real pod slice just run it; jax.distributed initialization for
multi-host is handled automatically when JAX reports multiple processes.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (plumbing check)")
    ap.add_argument("--bases-per-device", type=float, default=2**23)
    ap.add_argument("--fixed-bases", type=float, default=0,
                    help="fixed TOTAL genome size across mesh sizes "
                         "(sharding-overhead mode; see module docstring)")
    ap.add_argument("-k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()


    if args.virtual:
        os.environ.pop("JAX_PLATFORMS", None)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from kmer_spans_tpu.parallel.pipeline import data_mesh, make_pipeline_step

    n_avail = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    rng = np.random.default_rng(0)
    results = []
    base_rate = None
    for nd in sizes:
        mesh = data_mesh(nd)
        n = (int(args.fixed_bases) if args.fixed_bases
             else int(args.bases_per_device) * nd)
        block = 4096
        n = -(-n // (max(sizes) * block)) * (max(sizes) * block)
        step = make_pipeline_step(mesh, args.k, block=block)
        bases = jnp.asarray(rng.integers(0, 4, n, dtype=np.uint8))
        valid = jnp.asarray(np.ones(n, bool))
        with mesh:
            out = step(bases, valid, jnp.float32(0.75))
            float(jnp.asarray(out[0][0]))  # force
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                out = step(bases, valid, jnp.float32(0.75))
                float(jnp.asarray(out[0][0]))
                ts.append(time.time() - t0)
        rate = n / min(ts)
        if base_rate is None:
            base_rate = rate
        eff = (rate / base_rate if args.fixed_bases
               else rate / (base_rate * nd))
        results.append({
            "devices": nd,
            "bases": n,
            "bases_per_sec": round(rate),
            "efficiency": round(eff, 3),
        })
        print(f"devices={nd} bases/s={rate:,.0f} efficiency={eff:.3f}",
              file=sys.stderr)
    print(json.dumps({
        "metric": ("sharding_overhead" if args.fixed_bases else "scaling"),
        "k": args.k,
        "results": results,
    }))


if __name__ == "__main__":
    main()
