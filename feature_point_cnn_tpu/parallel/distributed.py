"""Multi-host launch layer.

The reference is strictly single-process/single-device (SURVEY.md §2.3);
this is the new first-class component that takes the same training code to a
multi-host TPU slice: `jax.distributed.initialize` + a global data mesh, with
per-host batch feeding (each host loads its own shard of the file list; the
mesh glues the global batch together).

Usage on each host of a slice:

    from feature_point_cnn_tpu.parallel import distributed
    distributed.initialize()            # no-op on single host
    mesh = distributed.global_mesh()    # all chips across all hosts
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime.

    On TPU pods the arguments are auto-detected from the environment; on CPU
    test rigs pass them explicitly.  Safe to call when single-host (no-op if
    no coordinator is configured).
    """
    if num_processes is None and coordinator_address is None:
        in_pod = any(
            v in os.environ
            for v in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                      "COORDINATOR_ADDRESS")
        )
        if not in_pod:
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "data") -> Mesh:
    """Mesh over every chip of every host (ICI within a slice, DCN across)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_shard(n_items: int) -> slice:
    """This host's contiguous shard of a dataset of ``n_items``."""
    pid, n = jax.process_index(), jax.process_count()
    per = n_items // n
    start = pid * per
    end = start + per if pid < n - 1 else n_items
    return slice(start, end)
