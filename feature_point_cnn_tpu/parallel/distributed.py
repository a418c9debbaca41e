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

Exercised for real by ``tests/test_distributed.py``: two CPU processes with
gloo collectives run one sharded train step and must agree bit-for-bit on
the updated parameters.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Environment markers that mean "we are one process of a multi-process job".
# Deliberately NOT ``TPU_WORKER_HOSTNAMES``: the axon PJRT relay sets that
# for single-host tunnel sessions (see csrc/pjrt_runtime.cc), so sniffing it
# would try to rendezvous with a nonexistent coordinator and hang.
_COORDINATOR_VARS = (
    "MEGASCALE_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
)


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
        if not any(v in os.environ for v in _COORDINATOR_VARS):
            return
        coordinator_address = next(
            os.environ[v] for v in _COORDINATOR_VARS if v in os.environ
        )
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


def make_global_batch(
    batch: Dict[str, Any], mesh: Mesh, axis: str = "data"
) -> Dict[str, Any]:
    """Assemble each host's LOCAL batch into one global batch-sharded array.

    Each process feeds its ``global_batch / process_count`` slice; the
    result is a global `jax.Array` sharded over ``axis`` whose per-device
    shards live where the local data already is — no cross-host data motion.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def replicate_global(tree: Any, mesh: Mesh) -> Any:
    """Replicate host-identical values (params, opt state) across the global
    mesh.  All processes must pass the same values."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )
