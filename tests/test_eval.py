"""Evaluation harness sanity: perfect detections give perfect metrics; the
end-to-end pair evaluator runs on synthetic images."""

import numpy as np
import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
from feature_point_cnn_tpu.eval.benchmark import evaluate_pairs, synthetic_images
from feature_point_cnn_tpu.eval.metrics import matching_metrics, repeatability
from feature_point_cnn_tpu.geometry import homography as G
from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend
from feature_point_cnn_tpu.ops.detection import Keypoints

SHAPE = (48, 64)


def _kp_from_points(pts, k=32):
    n = len(pts)
    y = np.zeros(k, np.float32)
    x = np.zeros(k, np.float32)
    v = np.zeros(k, bool)
    y[:n] = pts[:, 0]
    x[:n] = pts[:, 1]
    v[:n] = True
    return Keypoints(
        y=jnp.asarray(y[None]), x=jnp.asarray(x[None]),
        score=jnp.asarray(v[None].astype(np.float32)), valid=jnp.asarray(v[None]),
    )


def test_repeatability_perfect(rng):
    pts = rng.random((12, 2)).astype(np.float32) * [30, 40] + 8
    hf = G.sample_homography(jax.random.PRNGKey(0), SHAPE)
    warped = np.asarray(G.warp_points(jnp.asarray(pts), hf))
    inb = np.asarray(G.points_in_image_mask(jnp.asarray(warped), SHAPE))
    kp1 = _kp_from_points(pts)
    kp2 = _kp_from_points(warped[inb])
    out = repeatability(kp1, kp2, np.asarray(hf), SHAPE, eps=1.0)
    assert out["repeatability"] == 1.0
    assert out["localization_error"] < 1e-3


def test_repeatability_zero_when_disjoint(rng):
    pts1 = rng.random((6, 2)).astype(np.float32) * 10 + 5
    pts2 = pts1 + 20
    ident = np.asarray([1.0, 0, 0, 0, 1, 0, 0, 0], np.float32)
    out = repeatability(_kp_from_points(pts1), _kp_from_points(pts2), ident, SHAPE, eps=2.0)
    assert out["repeatability"] == 0.0


def test_matching_metrics_perfect(rng):
    """Identical descriptors at corresponding locations under identity
    homography -> perfect precision + correct homography."""
    pts = (rng.random((16, 2)) * [38, 52] + 5).astype(np.float32)
    desc = rng.standard_normal((16, 32)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    k = 32
    d = np.zeros((1, k, 32), np.float32)
    d[0, :16] = desc
    kp = _kp_from_points(pts, k)
    ident = np.asarray([1.0, 0, 0, 0, 1, 0, 0, 0], np.float32)
    out = matching_metrics(
        kp, jnp.asarray(d), kp, jnp.asarray(d), ident, SHAPE, eps=2.0
    )
    assert out["match_precision"] == 1.0
    assert out["num_matches"] == 16
    assert out["homography_correct"] == 1.0
    assert out["matching_score"] == 1.0


def test_matching_metrics_warped(rng):
    """Perfect matches under a NON-trivial homography -> the framework
    RANSAC path must recover it (corner error ~0).  Pins the argument
    order of `ransac_homography` in `eval/metrics.py`: the identity-
    homography test alone cannot catch a direction swap."""
    pts = (rng.random((16, 2)) * [30, 44] + 8).astype(np.float32)
    hf = G.sample_homography(jax.random.PRNGKey(5), SHAPE)
    warped = np.asarray(G.warp_points(jnp.asarray(pts), hf))
    desc = rng.standard_normal((16, 32)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    d = np.zeros((1, 32, 32), np.float32)
    d[0, :16] = desc
    out = matching_metrics(
        _kp_from_points(pts), jnp.asarray(d),
        _kp_from_points(warped), jnp.asarray(d),
        np.asarray(hf), SHAPE, eps=2.0,
    )
    assert out["match_precision"] == 1.0
    assert out["homography_correct"] == 1.0
    assert out["homography_error"] < 0.5
    assert out["homography_error_cv2"] < 0.5


def test_evaluate_pairs_end_to_end():
    cfg = SuperPointConfig(
        train_image_size=SHAPE, max_keypoints=64, compute_dtype="float32"
    )
    frontend = SuperPointFrontend(cfg)
    images = list(synthetic_images(2, SHAPE, seed=1))
    out = evaluate_pairs(
        frontend, images, HomographyConfig(valid_border_margin=4), eps=3.0
    )
    assert out["pairs"] == 2.0
    assert 0.0 <= out["repeatability"] <= 1.0
    assert "homography_error" in out


def test_tracking_eval_ideal_provider_recovers_trajectory():
    """eval.tracking's ground-truth convention: an ideal feature provider
    (world points projected through the exact render transforms) must track
    with ~zero ATE, proving the (x,y)<->(y,x) and inverse-warp bookkeeping."""
    import numpy as np

    from feature_point_cnn_tpu.slam.tracking import FrameFeatures
    from feature_point_cnn_tpu.eval import tracking as T

    h, w, k = 120, 160, 64
    rng = np.random.default_rng(0)
    base_xy = np.stack(
        [rng.uniform(20, w - 20, k), rng.uniform(20, h - 20, k)], -1
    )  # world points, (x, y)
    desc = rng.standard_normal((k, 32)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    params = T.smooth_trajectory(12, max_shift=10.0)
    frame_idx = {"i": 0}

    def ideal_extract(_image):
        th, s, tx, ty = params[frame_idx["i"]]
        frame_idx["i"] += 1
        # render maps frame pt -> base: b = s*R(th)*f + t  =>  f = R^-1((b-t)/s)
        c, sn = np.cos(th), np.sin(th)
        shifted = (base_xy - [tx, ty]) / s
        fx = c * shifted[:, 0] + sn * shifted[:, 1]
        fy = -sn * shifted[:, 0] + c * shifted[:, 1]
        import jax.numpy as jnp

        return FrameFeatures(
            y=jnp.asarray(fy, jnp.float32),
            x=jnp.asarray(fx, jnp.float32),
            valid=jnp.ones(k, bool),
            desc=jnp.asarray(desc),
        )

    base = np.zeros((h, w, 3), np.float32)
    out = T.evaluate_tracking(ideal_extract, base, n_frames=12, max_shift=10.0)
    assert out["frac_tracked"] == 1.0
    assert out["ate_rmse_px"] < 0.2, out
    assert out["mean_inliers"] > 50
