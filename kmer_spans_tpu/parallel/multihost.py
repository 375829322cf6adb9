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
