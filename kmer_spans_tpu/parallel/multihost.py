"""Multi-host initialization and mesh construction (SURVEY §5.8).

On a multi-host pod slice each host runs the same program;
``initialize()`` wires jax.distributed (coordinator discovery via the
standard env vars or explicit arguments), and ``global_data_mesh`` builds
the data-parallel mesh over every chip in the slice.  Genome chunks are
then sharded host-locally by the streaming driver: each host feeds its
own chunk range; spectrum psum / all_to_all and scan-carry all_gathers
ride ICI within the slice and DCN across hosts automatically through the
mesh.

Single-host processes are a no-op (jax.distributed refuses double init).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed if this looks like a multi-host job.

    Returns True if distributed mode is active.  Safe to call always:
    single-process environments skip initialization.
    """
    import os

    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_count() > 1
    explicit = coordinator_address is not None
    env_driven = any(
        v in os.environ
        for v in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    )
    if not (explicit or env_driven):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def global_data_mesh(axis: str = "data"):
    """Mesh over every device in the (possibly multi-host) job."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def distributed_low_comp_regions(
    nbases, k: int, min_width: int, min_score: float, thr: float = 0.75,
    block: int = 512, cand_blocks: int = 8, axis: str = "data",
    bucket_cap: int | None = None, vmax: int = 1 << 14,
):
    """Multi-process flagship pipeline over the global mesh.

    Every process calls this with the same ``nbases`` metadata but only
    materializes its OWN chunk range (make_array_from_callback only
    invokes the callback for addressable shards — the per-process chunk
    scheduling the reference gets from mclapply, test.R:550-565).  The
    spectrum/mass stay sharded across all processes; scan summaries and
    candidate payloads are all-gathered inside the step (DCN across
    hosts), so every process's host finisher computes the identical
    bit-exact region list.

    Returns a ShardedScanResult (regions exact vs the sequential oracle).
    """
    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .sharded import make_sharded_count_step
    from .sharded_scan import (
        finish_sharded_spans,
        make_sharded_rank_step_wide,
        make_sharded_scan_step,
    )

    mesh = global_data_mesh(axis)
    n_dev = mesh.devices.size
    nbases = np.asarray(nbases, dtype=np.uint8)
    n0 = nbases.shape[0]
    step_n = n_dev * block
    n = -(-n0 // step_n) * step_n
    if n != n0:
        nbases = np.concatenate([nbases, np.full(n - n0, 4, np.uint8)])
    v = (nbases < 4).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(v)])
    total = int(np.count_nonzero(cs[k:] - cs[:-k] == k))

    sh = NamedSharding(mesh, P(axis))
    bases_g = jax.make_array_from_callback(
        (n,), sh, lambda idx: nbases[idx] & 3)
    valid_g = jax.make_array_from_callback(
        (n,), sh, lambda idx: nbases[idx] < 4)

    cstep = make_sharded_count_step(
        mesh, k, axis=axis, block=block, bucket_cap=bucket_cap)
    rstep = make_sharded_rank_step_wide(mesh, k, axis=axis, vmax=vmax)
    sstep = make_sharded_scan_step(
        mesh, k, axis=axis, block=block, cand_blocks=cand_blocks,
        bucket_cap=bucket_cap, replicate_out=True)
    with mesh:
        sh_counts, c_overflow = cstep(bases_g, valid_g)
        mass_hi, mass_lo, clip, vh_hi, vh_lo = rstep(sh_counts)
        out = sstep(bases_g, valid_g, mass_hi, mass_lo,
                    jnp.float32(total), jnp.float32(thr))

    def local(x):
        return np.asarray(x.addressable_data(0))

    out_h = tuple(local(o) for o in out)
    clip_h = bool(local(clip))
    value_hist = None
    if not clip_h:
        value_hist = (local(vh_hi).astype(np.int64) << 16) + \
            local(vh_lo).astype(np.int64)
    res = finish_sharded_spans(
        out_h, n, total, thr, min_width, min_score, block,
        value_hist=value_hist)
    if bool(local(c_overflow)) or clip_h:
        res.overflow = True
    return res
