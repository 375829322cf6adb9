#!/usr/bin/env python
"""Scaling-efficiency harness: the sharded pipeline step at 1..N devices.

Measures bases/sec of the multi-chip count+rank+scan step
(parallel/pipeline.py) over meshes of 1, 2, 4, ... devices with the genome
size scaled per device (weak scaling), and reports parallel efficiency
vs the 1-device rate.  On a single-chip dev box, run against virtual CPU
devices for plumbing validation:

    JAX_PLATFORMS= python benchmarks/scaling.py --virtual 8

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
        n = int(args.bases_per_device) * nd
        block = 4096
        n = -(-n // (nd * block)) * (nd * block)
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
        eff = rate / (base_rate * nd)
        results.append({
            "devices": nd,
            "bases": n,
            "bases_per_sec": round(rate),
            "efficiency": round(eff, 3),
        })
        print(f"devices={nd} bases/s={rate:,.0f} efficiency={eff:.3f}",
              file=sys.stderr)
    print(json.dumps({"metric": "scaling", "k": args.k, "results": results}))


if __name__ == "__main__":
    main()
