"""Device-resident dataset: upload once, gather batches on-chip.

Round-2 measurement (RESULTS.md): with the packed memmap loader the
MagicPoint step still ran at ~106 img/s because every step shipped a ~5 MB
uint8 batch through the host<->device link, and this environment's relayed
link sustains only ~12 MB/s (417 ms per batch-64 upload — the whole step
budget).  The reference has the same structural pattern on GPU (DataLoader
workers feeding per-step H2D copies, `/root/reference/python/src/
basetrainer.py:96-172`); it survives it because PCIe is ~three orders of
magnitude faster than a tunneled link.

The TPU-native fix: the WHOLE packed split fits in HBM (27k synthetic
240x320 uint8 images = 2.1 GB against 16 GB/chip), so upload the dataset
ONCE and assemble every batch on device with an index gather inside a jitted
program.  Per step the host then ships a (B,) int32 index vector and a PRNG
key — a few hundred bytes.  Float conversion, grayscale repeat, label
encoding, and augmentation already happen inside the train step
(`train/steps.py:_prep_images`), so the gathered batch stays uint8 end to
end.

Sharding: two placements, both yielding batch-sharded outputs so the same
jitted train step consumes either —

* ``items_placement="replicated"`` (default): arrays replicated on the data
  mesh, batches gathered with a jitted global index gather (XLA partitions
  it; each device materializes only its batch shard).  Right for one chip or
  a small mesh where the dataset is tiny next to HBM.
* ``items_placement="sharded"``: the ITEM axis is sharded over the data
  mesh — each device holds ``N/d`` items and samples its batch shard from
  its local slice under `jax.shard_map` (no cross-device traffic at all).
  This is the pod-scale layout: HBM cost per chip shrinks with the mesh,
  matching how the host-side loader shards files across processes
  (`parallel/distributed.py:process_shard`).  Sampling is per-shard (each
  device shuffles its own slice), the standard distributed-loader semantic.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from feature_point_cnn_tpu.parallel.mesh import batch_sharding, replicated


def dataset_nbytes(ds) -> int:
    """Host-side size estimate of a packed dataset's arrays."""
    return int(
        ds.images.dtype.itemsize * np.prod(ds.images.shape)
        + ds.points.dtype.itemsize * np.prod(ds.points.shape)
        + ds.counts.dtype.itemsize * np.prod(ds.counts.shape)
    )


class DeviceBatchLoader:
    """Drop-in replacement for ``datasets.BatchLoader`` backed by
    device-resident arrays (``packed.PackedPointDataset`` source only).

    Yields batches of **committed device arrays** — ``trainer.shard_batch``
    sees the target sharding already in place and passes them through.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        max_points: int,
        mesh: Optional[Mesh] = None,
        seed: int = 0,
        shuffle: bool = True,
        items_placement: str = "replicated",
    ):
        from feature_point_cnn_tpu.parallel.mesh import make_mesh

        assert items_placement in ("replicated", "sharded"), items_placement
        self.batch_size = batch_size
        self.max_points = max_points
        self.seed = seed
        self.shuffle = shuffle
        self.items_placement = items_placement
        self.mesh = mesh if mesh is not None else make_mesh(batch_size=batch_size)
        d = int(self.mesh.devices.size)
        self._d = d
        if items_placement == "sharded":
            assert batch_size % d == 0, (batch_size, d)

        # materialize the dataset's (possibly size-capped, seed-permuted)
        # item view once on host, then upload; epoch shuffles index into it
        idx = np.sort(np.asarray(dataset.index))
        if items_placement == "sharded":
            # item axis must divide the mesh; drop the remainder tail
            idx = idx[: len(idx) - len(idx) % d]
        stored = dataset.points.shape[1]
        k = min(stored, max_points)
        points = np.zeros((len(idx), max_points, 2), np.float32)
        points[:, :k] = dataset.points[idx, :k]
        counts = np.minimum(np.asarray(dataset.counts[idx]), max_points)

        axis = self.mesh.axis_names[0]
        place = (
            replicated(self.mesh)
            if items_placement == "replicated"
            else NamedSharding(self.mesh, P(axis))
        )
        self.images = jax.device_put(np.asarray(dataset.images[idx]), place)
        self.points = jax.device_put(points, place)
        self.counts = jax.device_put(counts.astype(np.int32), place)
        jax.block_until_ready(self.images)

        out_shard = batch_sharding(self.mesh)

        if items_placement == "replicated":

            def gather(images, points, counts, batch_idx):
                img = jnp.take(images, batch_idx, axis=0)
                pts = jnp.take(points, batch_idx, axis=0)
                cnt = jnp.take(counts, batch_idx, axis=0)
                valid = jnp.arange(max_points)[None, :] < cnt[:, None]
                return {"image": img, "points": pts, "points_valid": valid}

            self._gather_pure = gather
            self._gather = jax.jit(
                gather,
                out_shardings={
                    "image": out_shard,
                    "points": out_shard,
                    "points_valid": out_shard,
                },
            )
        else:
            # each device gathers its (B/d) batch rows from its OWN item
            # shard — zero inter-chip traffic, HBM cost N/d per chip
            def local_gather(images, points, counts, batch_idx):
                idx_local = batch_idx[0]                     # (B/d,)
                img = jnp.take(images, idx_local, axis=0)
                pts = jnp.take(points, idx_local, axis=0)
                cnt = jnp.take(counts, idx_local, axis=0)
                valid = jnp.arange(max_points)[None, :] < cnt[:, None]
                return {"image": img, "points": pts, "points_valid": valid}

            self._gather_pure = jax.shard_map(
                local_gather,
                mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis)),
                out_specs={
                    "image": P(axis),
                    "points": P(axis),
                    "points_valid": P(axis),
                },
            )
            self._gather = jax.jit(self._gather_pure)

    def __len__(self) -> int:
        return self.images.shape[0] // self.batch_size

    def _epoch_order(self, epoch_index: int) -> np.ndarray:
        """Replicated: global permutation (N,).  Sharded: per-device local
        permutations, returned as (n_batches, d, B/d) local row indices."""
        rng = np.random.default_rng(self.seed + epoch_index)
        if self.items_placement == "replicated":
            order = np.arange(self.images.shape[0])
            if self.shuffle:
                rng.shuffle(order)
            return order
        d, n_local = self._d, self.images.shape[0] // self._d
        b_local = self.batch_size // d
        orders = np.stack([
            rng.permutation(n_local) if self.shuffle else np.arange(n_local)
            for _ in range(d)
        ])                                                   # (d, n_local)
        n_batches = len(self)
        out = np.stack([
            orders[:, i * b_local : (i + 1) * b_local]
            for i in range(n_batches)
        ])                                                   # (nb, d, B/d)
        return out

    def epoch_index_arrays(self, epoch_index: int = 0) -> Iterator[jnp.ndarray]:
        """Per-batch index arrays only — for callers that fuse the gather
        into their own jitted program (`Trainer` fuses it into the train
        step, removing one serialized device dispatch per step)."""
        order = self._epoch_order(epoch_index)
        idx_sharding = (
            None
            if self.items_placement == "replicated"
            else NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        )
        for i in range(len(self)):
            if self.items_placement == "replicated":
                yield jnp.asarray(
                    order[i * self.batch_size : (i + 1) * self.batch_size],
                    jnp.int32,
                )
            else:
                yield jax.device_put(
                    order[i].astype(np.int32), idx_sharding
                )                                            # (d, B/d)

    def epoch(self, epoch_index: int = 0) -> Iterator[Dict[str, jnp.ndarray]]:
        for batch_idx in self.epoch_index_arrays(epoch_index):
            yield self._gather(self.images, self.points, self.counts, batch_idx)

    def gather_fn(self):
        """The pure gather, traceable inside a caller's jitted program
        (`shard_map`-wrapped under item-sharded placement, so it composes
        and keeps the zero-traffic local gathers)."""
        return self._gather_pure

    def materialize(self, batch_idx) -> Dict[str, jnp.ndarray]:
        """One batch as device arrays (for summaries/debug)."""
        return self._gather(self.images, self.points, self.counts, batch_idx)


# Auto-selection threshold: leave the bulk of HBM for activations/optimizer.
MAX_RESIDENT_BYTES = 6 << 30


def make_loader(
    dataset,
    batch_size: int,
    max_points: int,
    seed: int = 0,
    shuffle: bool = True,
    device_resident: str = "auto",
):
    """Pick the device-resident loader when the source is packed and fits;
    fall back to the host prefetching loader otherwise."""
    from feature_point_cnn_tpu.data.datasets import BatchLoader
    from feature_point_cnn_tpu.data.packed import PackedPointDataset

    want = device_resident == "on" or (
        device_resident == "auto"
        and isinstance(dataset, PackedPointDataset)
        and dataset_nbytes(dataset) <= MAX_RESIDENT_BYTES
    )
    if want and isinstance(dataset, PackedPointDataset):
        return DeviceBatchLoader(
            dataset, batch_size, max_points, seed=seed, shuffle=shuffle
        )
    return BatchLoader(
        dataset, batch_size, max_points, seed=seed, shuffle=shuffle
    )
