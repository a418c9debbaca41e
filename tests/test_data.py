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
