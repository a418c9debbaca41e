"""Descriptor sampling vs torch grid_sample oracle
(`/root/reference/python/src/netutils.py:103-121`) and GEMM matching vs
OpenCV BFMatcher (`inference.py:88-96`)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from feature_point_cnn_tpu.ops.descriptors import sample_descriptors
from feature_point_cnn_tpu.ops.detection import Keypoints
from feature_point_cnn_tpu.ops.matching import mnn_match

H, W = 48, 64
HC, WC, D = 6, 8, 16


def _kp(ys, xs):
    k = len(ys)
    return Keypoints(
        y=jnp.asarray(ys, jnp.float32)[None],
        x=jnp.asarray(xs, jnp.float32)[None],
        score=jnp.ones((1, k), jnp.float32),
        valid=jnp.ones((1, k), bool),
    )


def test_sample_descriptors_matches_torch_grid_sample(rng):
    torch = pytest.importorskip("torch")
    dmap = rng.standard_normal((1, HC, WC, D)).astype(np.float32)
    ys = rng.random(10) * (H - 1)
    xs = rng.random(10) * (W - 1)
    kp = _kp(ys, xs)
    got = np.asarray(sample_descriptors(jnp.asarray(dmap), kp, H, W))[0]

    # reference path: normalize to [-1,1], grid_sample align_corners=True
    sample_pts = np.stack([xs / (W / 2.0) - 1.0, ys / (H / 2.0) - 1.0], -1)
    grid = torch.from_numpy(sample_pts.astype(np.float32)).view(1, 1, -1, 2)
    tmap = torch.from_numpy(dmap.transpose(0, 3, 1, 2))
    want = (
        torch.nn.functional.grid_sample(tmap, grid, align_corners=True)
        .numpy()
        .reshape(D, -1)
        .T
    )
    want = want / np.linalg.norm(want, axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_descriptors_zeroes_invalid(rng):
    dmap = jnp.asarray(rng.standard_normal((1, HC, WC, D)), jnp.float32)
    kp = Keypoints(
        y=jnp.asarray([[1.0, 2.0]]),
        x=jnp.asarray([[1.0, 2.0]]),
        score=jnp.asarray([[0.5, 0.0]]),
        valid=jnp.asarray([[True, False]]),
    )
    desc = np.asarray(sample_descriptors(dmap, kp, H, W))[0]
    assert np.all(desc[1] == 0)
    np.testing.assert_allclose(np.linalg.norm(desc[0]), 1.0, atol=1e-5)


def _unit_desc(rng, n, d=D):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_mnn_match_matches_bfmatcher(rng):
    da = _unit_desc(rng, 30)
    db = _unit_desc(rng, 25)
    got = mnn_match(
        jnp.asarray(da), jnp.ones(30, bool), jnp.asarray(db), jnp.ones(25, bool)
    )
    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)
    want = {(m.queryIdx, m.trainIdx) for m in bf.match(da, db)}
    got_pairs = {
        (i, int(np.asarray(got.index)[i]))
        for i in range(30)
        if np.asarray(got.valid)[i]
    }
    assert got_pairs == want


def test_mnn_match_distance_gate(rng):
    da = _unit_desc(rng, 10)
    db = np.concatenate([da[:5], _unit_desc(rng, 5)])  # first 5 exact matches
    got = mnn_match(
        jnp.asarray(da),
        jnp.ones(10, bool),
        jnp.asarray(db),
        jnp.ones(10, bool),
        max_l2_dist=0.1,
    )
    v = np.asarray(got.valid)
    assert v[:5].all()
    idx = np.asarray(got.index)
    np.testing.assert_array_equal(idx[:5], np.arange(5))


def test_mnn_match_respects_validity(rng):
    da = _unit_desc(rng, 8)
    db = da.copy()
    valid_b = np.ones(8, bool)
    valid_b[3] = False
    got = mnn_match(
        jnp.asarray(da), jnp.ones(8, bool), jnp.asarray(db), jnp.asarray(valid_b)
    )
    assert not np.asarray(got.valid)[3] or np.asarray(got.index)[3] != 3
    # no valid match may point at the masked-out B slot
    assert not np.any(
        (np.asarray(got.index) == 3) & np.asarray(got.valid)
    )
