"""Data layer tests: every synthetic primitive yields the on-disk contract
(`/root/reference/python/gen_synthetic_dataset.py:95-101`), loader
round-trips it, and batches are fixed-shape."""

from pathlib import Path

import numpy as np
import pytest

from feature_point_cnn_tpu.data.datasets import BatchLoader, NpzPointDataset, read_npz_item
from feature_point_cnn_tpu.data.synthetic_shapes import (
    PRIMITIVES,
    SyntheticShapeGenerator,
)

SMALL = dict(image_size=(192, 256), out_size=(48, 64), blur_size=5)


@pytest.mark.parametrize("primitive", PRIMITIVES)
def test_primitive_contract(primitive, rng):
    gen = SyntheticShapeGenerator(rng, **SMALL)
    image, points = gen.sample(primitive)
    assert image.shape == (1, 48, 64)
    assert image.dtype == np.float32
    assert 0.0 <= image.min() and image.max() <= 1.0
    assert points.shape[0] == 3
    if points.shape[1]:
        assert (points[0] >= -1).all() and (points[0] <= 64).all()  # x
        assert (points[1] >= -1).all() and (points[1] <= 48).all()  # y
        np.testing.assert_array_equal(points[2], 1.0)


def test_generator_deterministic():
    a = SyntheticShapeGenerator(np.random.default_rng(7), **SMALL).sample("star")
    b = SyntheticShapeGenerator(np.random.default_rng(7), **SMALL).sample("star")
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(0)
    gen = SyntheticShapeGenerator(rng, **SMALL)
    for split, n in (("train", 12), ("test", 6)):
        d = root / split
        d.mkdir()
        for i in range(n):
            prim = PRIMITIVES[i % len(PRIMITIVES)]
            image, points = gen.sample(prim)
            np.savez_compressed(d / f"{prim}_{i}.npz", image=image, points=points)
    return root


def test_read_npz_item(tiny_dataset):
    item = next(Path(tiny_dataset, "train").glob("*.npz"))
    image, points = read_npz_item(str(item))
    assert image.shape == (48, 64, 3)
    assert image.dtype == np.float32
    # gray replicated into 3 identical channels
    np.testing.assert_array_equal(image[..., 0], image[..., 1])
    assert points.ndim == 2 and points.shape[1] == 2
    if len(points):
        # (y, x) convention: y bounded by 48
        assert points[:, 0].max() <= 48


def test_batch_loader_shapes(tiny_dataset):
    ds = NpzPointDataset(str(tiny_dataset), "train", seed=0)
    loader = BatchLoader(ds, batch_size=4, max_points=32, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 3 == len(loader)
    for b in batches:
        assert b["image"].shape == (4, 48, 64, 3)
        assert b["points"].shape == (4, 32, 2)
        assert b["points_valid"].shape == (4, 32)
        assert b["points_valid"].dtype == bool


def test_batch_loader_reshuffles(tiny_dataset):
    ds = NpzPointDataset(str(tiny_dataset), "train", seed=0)
    loader = BatchLoader(ds, batch_size=4, max_points=32, seed=0)
    e0 = [b["image"].sum() for b in loader.epoch(0)]
    e0_again = [b["image"].sum() for b in loader.epoch(0)]
    e1 = [b["image"].sum() for b in loader.epoch(1)]
    np.testing.assert_allclose(e0, e0_again)
    assert not np.allclose(e0, e1)


def test_dataset_size_cap(tiny_dataset):
    ds = NpzPointDataset(str(tiny_dataset), "test", size=4)
    assert len(ds) == 4


# ---------------------------------------------------------------------------
# Packed memmap format (data/packed.py)
# ---------------------------------------------------------------------------

def test_pack_roundtrip(tiny_dataset, tmp_path):
    from feature_point_cnn_tpu.data.packed import (
        PackedPointDataset,
        is_packed,
        open_dataset,
        pack_dataset,
    )

    out = tmp_path / "packed"
    pack_dataset(str(tiny_dataset), str(out))
    assert is_packed(str(out), "train") and is_packed(str(out), "test")

    npz = NpzPointDataset(str(tiny_dataset), "train", seed=3)
    pk = PackedPointDataset(str(out), "train", seed=3)
    assert len(pk) == len(npz) == 12

    # every packed item matches some npz item exactly (uint8 quantization is
    # lossless: generated images are uint8-valued floats)
    npz_items = [npz.read(i) for i in range(len(npz))]
    for i in range(len(pk)):
        img, pts = pk.read(i)
        assert img.shape == (48, 64, 3) and img.dtype == np.float32
        match = [
            j for j, (im2, p2) in enumerate(npz_items)
            if im2.shape == img.shape and np.array_equal(im2, img)
            and np.array_equal(p2, pts)
        ]
        assert match, f"packed item {i} not found among npz items"

    assert isinstance(open_dataset(str(out), "train"), PackedPointDataset)
    assert isinstance(
        open_dataset(str(tiny_dataset), "train"), NpzPointDataset
    )


def test_packed_batch_loader_uint8(tiny_dataset, tmp_path):
    from feature_point_cnn_tpu.data.packed import PackedPointDataset, pack_dataset

    out = tmp_path / "packed"
    pack_dataset(str(tiny_dataset), str(out))
    ds = PackedPointDataset(str(out), "train", seed=0)
    loader = BatchLoader(ds, batch_size=4, max_points=32, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches:
        # raw uint8 single-channel: device-side _prep_images expands it
        assert b["image"].shape == (4, 48, 64, 1)
        assert b["image"].dtype == np.uint8
        assert b["points"].shape == (4, 32, 2)
        assert b["points_valid"].shape == (4, 32)

    # same underlying items as the npz loader, modulo batch-internal order
    npz_loader = BatchLoader(
        NpzPointDataset(str(tiny_dataset), "train", seed=0),
        batch_size=4, max_points=32, seed=0,
    )
    pk_sums = sorted(
        float(img.sum())
        for b in batches for img in b["image"].astype(np.float32) / 255.0
    )
    npz_sums = sorted(
        float(img[..., 0].sum())
        for b in npz_loader.epoch(0) for img in b["image"]
    )
    np.testing.assert_allclose(pk_sums, npz_sums, rtol=1e-5)


# ---------------------------------------------------------------------------
# Device-resident store (data/device_store.py)


def test_device_loader_matches_packed_arrays(tiny_dataset, tmp_path):
    import jax.numpy as jnp

    from feature_point_cnn_tpu.data.device_store import DeviceBatchLoader
    from feature_point_cnn_tpu.data.packed import PackedPointDataset, pack_dataset

    out = tmp_path / "packed_dev"
    pack_dataset(str(tiny_dataset), str(out))
    ds = PackedPointDataset(str(out), "train", seed=0)
    loader = DeviceBatchLoader(ds, batch_size=4, max_points=32, seed=0)
    assert len(loader) == 3

    # reconstruct the host-side view the loader uploaded
    idx = np.sort(np.asarray(ds.index))
    host_imgs = np.asarray(ds.images[idx])
    host_counts = np.asarray(ds.counts[idx])

    order = np.arange(host_imgs.shape[0])
    np.random.default_rng(loader.seed + 1).shuffle(order)
    batches = list(loader.epoch(1))
    for bi, b in enumerate(batches):
        assert b["image"].dtype == jnp.uint8
        assert b["image"].shape == (4, 48, 64, 1)
        assert b["points"].shape == (4, 32, 2)
        take = order[bi * 4 : (bi + 1) * 4]
        np.testing.assert_array_equal(np.asarray(b["image"]), host_imgs[take])
        np.testing.assert_array_equal(
            np.asarray(b["points_valid"]).sum(-1), host_counts[take]
        )


def test_device_loader_train_step(tiny_dataset, tmp_path):
    """A jitted MagicPoint step consumes device-resident batches as-is."""
    import jax

    from feature_point_cnn_tpu.config import SuperPointConfig
    from feature_point_cnn_tpu.data.device_store import DeviceBatchLoader
    from feature_point_cnn_tpu.data.packed import PackedPointDataset, pack_dataset
    from feature_point_cnn_tpu.models.superpoint import init_superpoint
    from feature_point_cnn_tpu.train import steps as S
    from feature_point_cnn_tpu.train.optimizer import make_optimizer

    out = tmp_path / "packed_dev2"
    pack_dataset(str(tiny_dataset), str(out))
    ds = PackedPointDataset(str(out), "train", seed=0)
    loader = DeviceBatchLoader(ds, batch_size=4, max_points=32, seed=0)

    cfg = SuperPointConfig(batch_size=4, max_points=32)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (48, 64))
    tx = make_optimizer(cfg, variables["params"], frozen_subtree="descriptor",
                        total_steps=10)
    state = S.create_train_state(variables, tx)
    batch = next(iter(loader.epoch(0)))
    state2, metrics = S.magicpoint_train_step(
        state, batch, jax.random.PRNGKey(1), model=model, tx=tx, config=cfg
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_make_loader_auto_selection(tiny_dataset, tmp_path):
    from feature_point_cnn_tpu.data.datasets import BatchLoader as HostLoader
    from feature_point_cnn_tpu.data.device_store import (
        DeviceBatchLoader,
        make_loader,
    )
    from feature_point_cnn_tpu.data.packed import PackedPointDataset, pack_dataset

    out = tmp_path / "packed_auto"
    pack_dataset(str(tiny_dataset), str(out))
    ds = PackedPointDataset(str(out), "train", seed=0)
    assert isinstance(make_loader(ds, 4, 32), DeviceBatchLoader)
    assert isinstance(make_loader(ds, 4, 32, device_resident="off"), HostLoader)
    npz = NpzPointDataset(str(tiny_dataset), "train", seed=0)
    assert isinstance(make_loader(npz, 4, 32), HostLoader)


def test_device_loader_item_sharded(tiny_dataset, tmp_path):
    """Pod-scale placement: item axis sharded over the mesh, each device
    samples its batch shard from its local slice (shard_map gather)."""
    import jax

    from feature_point_cnn_tpu.data.device_store import DeviceBatchLoader
    from feature_point_cnn_tpu.data.packed import PackedPointDataset, pack_dataset
    from feature_point_cnn_tpu.parallel.mesh import make_mesh

    out = tmp_path / "packed_shard"
    pack_dataset(str(tiny_dataset), str(out))
    ds = PackedPointDataset(str(out), "train", seed=0)   # 12 items
    mesh = make_mesh(4)
    loader = DeviceBatchLoader(
        ds, batch_size=8, max_points=32, mesh=mesh, seed=0,
        items_placement="sharded",
    )
    # 12 items truncated to 12 (12 % 4 == 0); 8-batch -> 1 batch
    assert len(loader) == 1
    # item arrays are sharded over the mesh: each device holds N/d rows
    shard_rows = {
        s.index[0] for s in loader.images.addressable_shards
    }
    assert len(loader.images.addressable_shards) == 4

    idx = np.sort(np.asarray(ds.index))
    host_imgs = np.asarray(ds.images[idx])
    d, n_local, b_local = 4, 3, 2
    (batch,) = list(loader.epoch(5))
    assert batch["image"].shape == (8, 48, 64, 1)
    # every batch row must come from the owning device's local slice
    order = loader._epoch_order(5)                        # (1, d, B/d)
    got = np.asarray(batch["image"])
    for k in range(d):
        local = host_imgs[k * n_local : (k + 1) * n_local]
        for j in range(b_local):
            expect = local[order[0, k, j]]
            np.testing.assert_array_equal(got[k * b_local + j], expect)


def test_device_loader_sharded_feeds_train_step(tiny_dataset, tmp_path):
    """Sharded-placement batches drive the jitted data-parallel train step."""
    import jax

    from feature_point_cnn_tpu.config import SuperPointConfig
    from feature_point_cnn_tpu.data.device_store import DeviceBatchLoader
    from feature_point_cnn_tpu.data.packed import PackedPointDataset, pack_dataset
    from feature_point_cnn_tpu.models.superpoint import init_superpoint
    from feature_point_cnn_tpu.parallel.mesh import make_mesh, replicate_state
    from feature_point_cnn_tpu.train import steps as S
    from feature_point_cnn_tpu.train.optimizer import make_optimizer

    out = tmp_path / "packed_shard2"
    pack_dataset(str(tiny_dataset), str(out))
    ds = PackedPointDataset(str(out), "train", seed=0)
    mesh = make_mesh(4)
    loader = DeviceBatchLoader(
        ds, batch_size=8, max_points=32, mesh=mesh,
        items_placement="sharded",
    )
    cfg = SuperPointConfig(batch_size=8, max_points=32)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (48, 64))
    tx = make_optimizer(cfg, variables["params"], frozen_subtree="descriptor",
                        total_steps=10)
    state = replicate_state(S.create_train_state(variables, tx), mesh)
    batch = next(iter(loader.epoch(0)))
    state2, metrics = jax.jit(
        lambda s, b, k: S.magicpoint_train_step(
            s, b, k, model=model, tx=tx, config=cfg
        )
    )(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
