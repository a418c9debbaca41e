"""Homography engine tests: algebra round-trips, warp/unwarp inversion,
OpenCV-parity erosion, torch-parity image warping — the properties the
reference only eyeballs (`/root/reference/python/tests/homographic-augmentation.py`).
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_point_cnn_tpu.config import HomographyConfig
from feature_point_cnn_tpu.geometry import homography as G
from feature_point_cnn_tpu.geometry import warp as Wp

H, W = 48, 64
IDENTITY = jnp.asarray([1.0, 0, 0, 0, 1, 0, 0, 0])


def test_flat_mat_roundtrip(rng):
    h = jnp.asarray(rng.standard_normal(8) * 0.1 + IDENTITY, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(G.mat2flat(G.flat2mat(h))), np.asarray(h), atol=1e-6
    )


def test_invert_homography():
    h = G.sample_homography(jax.random.PRNGKey(0), (H, W))
    hh = G.compose_homographies(h, G.invert_homography(h))
    np.testing.assert_allclose(np.asarray(hh), np.asarray(IDENTITY), atol=1e-4)


def test_warp_points_identity(rng):
    pts = jnp.asarray(rng.random((20, 2)) * [H - 1, W - 1], jnp.float32)
    out = G.warp_points(pts, IDENTITY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_warp_points_inversion(rng):
    """warp with h then with inv(h) restores the points."""
    h = G.sample_homography(jax.random.PRNGKey(1), (H, W))
    pts = jnp.asarray(rng.random((30, 2)) * [H - 1, W - 1], jnp.float32)
    fwd = G.warp_points(pts, h)
    back = G.warp_points(fwd, G.invert_homography(h))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_warp_points_translation():
    """A pure translation homography (output->input map tx) moves input
    points by -tx under warp_points' inverse-warp convention."""
    h = jnp.asarray([1.0, 0, 5.0, 0, 1, 3.0, 0, 0])  # x_in = x_out + 5
    pts = jnp.asarray([[10.0, 10.0]])
    out = G.warp_points(pts, h)
    # inverse maps (x,y) -> (x-5, y-3); (y,x) layout
    np.testing.assert_allclose(np.asarray(out), [[7.0, 5.0]], atol=1e-5)


def test_sample_homography_keeps_patch_in_bounds():
    """Non-artifact config: the corners of the central source patch (pts1)
    must map inside the image — every perturbation is validity-checked
    against the unit square (homographies.py:121-174).  (Pixels *outside*
    the patch may extrapolate out of bounds; that is what
    `compute_valid_mask` is for.)"""
    cfg = HomographyConfig(allow_artifacts=False)
    margin = (1.0 - cfg.patch_ratio) / 2.0
    unit = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
    patch = (margin + cfg.patch_ratio * unit) * [W, H]  # (x, y)
    for seed in range(20):
        h = G.sample_homography(jax.random.PRNGKey(seed), (H, W), cfg)
        src = np.asarray(
            Wp.apply_flat_homography(h, jnp.asarray(patch, jnp.float32))
        )
        assert (src[:, 0] > -1e-3).all() and (src[:, 0] < W + 1e-3).all()
        assert (src[:, 1] > -1e-3).all() and (src[:, 1] < H + 1e-3).all()


def test_sample_homography_batch_distinct():
    hs = G.sample_homography_batch(jax.random.PRNGKey(2), 4, (H, W))
    assert hs.shape == (4, 8)
    assert not np.allclose(np.asarray(hs[0]), np.asarray(hs[1]))


def test_ellipse_kernel_matches_opencv():
    for r in (2, 4, 8, 16):
        want = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * r, 2 * r))
        got = G.ellipse_kernel(r)
        np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_erode_matches_opencv(rng):
    mask = (rng.random((H, W)) > 0.3).astype(np.float32)
    for r in (2, 4, 8):
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * r,) * 2)
        want = cv2.erode(
            mask, kernel, iterations=1, borderType=cv2.BORDER_CONSTANT, borderValue=0
        )
        got = np.asarray(G.erode(jnp.asarray(mask), r))
        np.testing.assert_array_equal(got, want)


def test_warp_image_identity(rng):
    img = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    out = Wp.warp_image(img, IDENTITY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_image_integer_translation(rng):
    img = jnp.asarray(rng.random((H, W, 1)), jnp.float32)
    h = jnp.asarray([1.0, 0, 3.0, 0, 1, 2.0, 0, 0])  # src = out + (3, 2)
    out = np.asarray(Wp.warp_image(img, h))
    np.testing.assert_allclose(
        out[: H - 2, : W - 3], np.asarray(img)[2:, 3:], atol=1e-5
    )
    assert np.all(out[H - 2 :, :] == 0) and np.all(out[:, W - 3 :] == 0)


def test_warp_image_matches_torchvision(rng):
    """Parity with the exact op the reference calls
    (`homographies.py:219-220`), bilinear and nearest."""
    torch = pytest.importorskip("torch")
    try:
        from torchvision.transforms import _functional_tensor as FT
    except ImportError:
        try:
            from torchvision.transforms import functional_tensor as FT
        except ImportError:
            pytest.skip("torchvision functional_tensor unavailable")

    img = rng.random((1, H, W)).astype(np.float32)
    h = np.asarray(
        G.sample_homography(jax.random.PRNGKey(3), (H, W)), np.float64
    )
    for mode in ("bilinear", "nearest"):
        want = (
            FT.perspective(torch.from_numpy(img), list(h), interpolation=mode)
            .numpy()[0]
        )
        got = np.asarray(
            Wp.warp_image(jnp.asarray(img[0][..., None]), jnp.asarray(h, jnp.float32), mode)
        )[..., 0]
        atol = 1e-4 if mode == "bilinear" else 0.0
        mismatch = np.abs(got - want) > atol
        # nearest: allow rare half-sample rounding disagreements from float32
        assert mismatch.mean() < (0.002 if mode == "nearest" else 1e-6), mode


def test_compute_valid_mask_erodes_border():
    h = G.sample_homography(jax.random.PRNGKey(4), (H, W))
    m0 = np.asarray(G.compute_valid_mask((H, W), h, 0))
    m8 = np.asarray(G.compute_valid_mask((H, W), h, 8))
    assert m0.shape == (H, W)
    assert m8.sum() < m0.sum()
    assert set(np.unique(m8)) <= {0.0, 1.0}


def test_homographic_augmentation_batch(rng):
    imgs = jnp.asarray(rng.random((2, H, W, 3)), jnp.float32)
    pts = jnp.asarray(rng.random((2, 8, 2)) * [H - 1, W - 1], jnp.float32)
    valid = jnp.ones((2, 8), bool)
    wi, wp, wv, vm, hf = G.homographic_augmentation_batch(
        jax.random.PRNGKey(5), imgs, pts, valid
    )
    assert wi.shape == imgs.shape
    assert wp.shape == pts.shape
    assert wv.shape == valid.shape and wv.dtype == bool
    assert vm.shape == (2, H, W)
    assert hf.shape == (2, 8)
