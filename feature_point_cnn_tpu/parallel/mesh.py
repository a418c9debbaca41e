"""Device mesh + sharding layer — a first-class component the reference
simply does not have (SURVEY.md §2.3: no torch.distributed, no collectives,
single device).

Data parallelism here is JAX-native: batches are sharded over the ``data``
mesh axis, parameters/optimizer state are replicated, and XLA inserts the
gradient ``psum`` over ICI automatically when the jitted step consumes
sharded inputs.  Multi-host extension: `jax.distributed.initialize()` before
mesh creation and the same code runs, with DCN between hosts.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis: str = "data",
    batch_size: Optional[int] = None,
) -> Mesh:
    """Data mesh over the available devices.  When ``batch_size`` is given,
    use the largest device count that evenly divides it (a 4-image batch on
    an 8-device host uses 4 devices rather than failing)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devices = devices[:n]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded over the batch dimension."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_state(state: Any, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), state
    )


# ---------------------------------------------------------------------------
# Spatial (image) sharding — the CNN analog of sequence parallelism
# ---------------------------------------------------------------------------

def make_spatial_mesh(n_devices: Optional[int] = None, axis: str = "width") -> Mesh:
    return make_mesh(n_devices, axis=axis)


def spatial_sharding(mesh: Mesh, axis: str = "width") -> NamedSharding:
    """Shard NHWC images along W across the mesh.

    Convolutions over spatially sharded inputs compile under GSPMD with
    automatic halo exchanges over ICI — this scales a SINGLE large image
    across chips (the "context parallelism" analog for a conv net,
    SURVEY.md §5 long-context note).  Widths must divide by the mesh size x
    the total stride (cell) so cell boundaries align with shards.
    """
    return NamedSharding(mesh, P(None, None, axis, None))


def shard_images_spatial(images, mesh: Mesh, axis: str = "width"):
    """Place ``(B, H, W, C)`` images W-sharded on the mesh."""
    return jax.device_put(images, spatial_sharding(mesh, axis))
