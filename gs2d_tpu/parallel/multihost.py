"""Multi-host (multi-process) runtime setup.

One JAX process per host; `jax.distributed.initialize` wires the cluster,
after which `jax.devices()` spans all hosts and the (data, tile, splat) mesh
of `parallel/mesh.py` works unchanged -- shard_map inserts DCN collectives
across hosts and ICI collectives within a slice automatically.

Axis placement guidance (the scaling-book recipe):
- Put the **splat** axis innermost (fastest-varying over devices) so the
  ordered-monoid combine's ppermute/all_gather rides ICI neighbour links.
- Put **data** outermost: per-image populations never communicate, so the
  data axis can span DCN with zero cost.
- The **tile** axis's gradient psum is one all-reduce of ~36*N bytes per
  step; keep it within a slice when possible.

This module is exercised on single-host virtual meshes in CI; real
multi-host runs need only `initialize_cluster()` before building the mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from gs2d_tpu.parallel.mesh import make_mesh


def initialize_cluster(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process or when the TPU runtime auto-detects (GKE/TPU VM)."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes
        or int(os.environ.get("NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("PROCESS_ID", "0")),
    )


def default_pod_mesh(data: int = 1, tile: Optional[int] = None,
                     splat: Optional[int] = None):
    """A sensible mesh over every device in the cluster: splat innermost
    (ICI), then tile, data outermost (DCN-tolerant)."""
    n = jax.device_count()
    if tile is None and splat is None:
        # default: no data parallelism, split the rest tile x splat evenly
        splat = 1
        while splat * splat * data <= n and n % (splat * 2 * data) == 0:
            splat *= 2
        tile = n // (data * splat)
    elif splat is None:
        splat = n // (data * tile)
    elif tile is None:
        tile = n // (data * splat)
    return make_mesh(data=data, tile=tile, splat=splat)
