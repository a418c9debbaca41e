"""Detector/descriptor quality metrics — the HPatches evaluation protocol.

The reference measures nothing (SURVEY.md §6); these are the standard
SuperPoint-paper metrics, computed from our fixed-K keypoint arrays:

* **repeatability** — fraction of keypoints re-detected within ``eps`` px
  under a known homography (symmetric, over points landing in the shared
  view region).  NOTE: compare at a fixed small top-K (e.g. 100-300): at
  saturated K dense random detections are trivially "repeatable";
* **localization error** — mean distance of repeated detections;
* **matching score** — fraction of shared-region keypoints whose MNN
  descriptor match is geometrically correct (within ``eps`` of the
  homography-warped location);
* **homography accuracy** — RANSAC homography from the matches; correct if
  the mean corner reprojection error is below ``eps``.

All geometry uses the framework's ``(y, x)`` convention and flat
output->input homographies; `warp_points` moves view-1 points into view 2.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from feature_point_cnn_tpu.geometry import homography as G
from feature_point_cnn_tpu.ops.detection import Keypoints
from feature_point_cnn_tpu.ops.matching import mnn_match
from feature_point_cnn_tpu.slam.twoview import ransac_homography

import jax.numpy as jnp


def _valid_points(kp: Keypoints, index: int) -> np.ndarray:
    v = np.asarray(kp.valid[index])
    return np.stack(
        [np.asarray(kp.y[index])[v], np.asarray(kp.x[index])[v]], -1
    )


def _pairwise_min_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """For each row of ``a``, distance to the nearest row of ``b``."""
    if len(a) == 0 or len(b) == 0:
        return np.full((len(a),), np.inf)
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return d.min(axis=1)


def repeatability(
    kp1: Keypoints,
    kp2: Keypoints,
    h_flat: np.ndarray,
    shape,
    eps: float = 3.0,
    index: int = 0,
) -> Dict[str, float]:
    """Symmetric repeatability + localization error for one pair."""
    p1 = _valid_points(kp1, index)
    p2 = _valid_points(kp2, index)
    h = jnp.asarray(h_flat, jnp.float32)
    h_inv = G.invert_homography(h)

    # view-1 points into view 2; keep those landing inside
    p1_in2 = np.asarray(G.warp_points(jnp.asarray(p1, jnp.float32), h)) if len(p1) else p1
    keep1 = (
        np.asarray(G.points_in_image_mask(jnp.asarray(p1_in2), shape))
        if len(p1)
        else np.zeros(0, bool)
    )
    p2_in1 = np.asarray(G.warp_points(jnp.asarray(p2, jnp.float32), h_inv)) if len(p2) else p2
    keep2 = (
        np.asarray(G.points_in_image_mask(jnp.asarray(p2_in1), shape))
        if len(p2)
        else np.zeros(0, bool)
    )

    d1 = _pairwise_min_dists(p1_in2[keep1], p2)
    d2 = _pairwise_min_dists(p2_in1[keep2], p1)
    n_shared = keep1.sum() + keep2.sum()
    n_repeat = (d1 <= eps).sum() + (d2 <= eps).sum()
    loc_err = (
        float(np.concatenate([d1[d1 <= eps], d2[d2 <= eps]]).mean())
        if n_repeat
        else float("nan")
    )
    return {
        "repeatability": float(n_repeat / n_shared) if n_shared else 0.0,
        "localization_error": loc_err,
        "num_shared": int(n_shared),
    }


def matching_metrics(
    kp1: Keypoints,
    desc1,
    kp2: Keypoints,
    desc2,
    h_flat: np.ndarray,
    shape,
    eps: float = 3.0,
    index: int = 0,
    nn_thresh: Optional[float] = None,
) -> Dict[str, float]:
    """Matching score + homography estimation accuracy for one pair."""
    import cv2

    m = mnn_match(
        desc1[index], kp1.valid[index], desc2[index], kp2.valid[index],
        max_l2_dist=nn_thresh,
    )
    mi = np.asarray(m.index)
    mv = np.asarray(m.valid)

    p1 = np.stack([np.asarray(kp1.y[index]), np.asarray(kp1.x[index])], -1)
    p2 = np.stack([np.asarray(kp2.y[index]), np.asarray(kp2.x[index])], -1)
    h = jnp.asarray(h_flat, jnp.float32)
    p1_in2 = np.asarray(G.warp_points(jnp.asarray(p1, jnp.float32), h))

    match_src = p1_in2[mv]
    match_dst = p2[mi[mv]]
    errs = np.linalg.norm(match_src - match_dst, axis=-1)
    correct = errs <= eps

    shared1 = np.asarray(
        G.points_in_image_mask(jnp.asarray(p1_in2), shape)
    ) & np.asarray(kp1.valid[index])
    denom = min(int(shared1.sum()), int(np.asarray(kp2.valid[index]).sum()))
    matching_score = float(correct.sum() / denom) if denom else 0.0

    # homography estimation from matches.  The MEASURED path is the
    # framework's own on-device RANSAC (`slam/twoview.py:85`) — the same
    # estimator serving/tracking uses; cv2.findHomography stays as an
    # independent host oracle, reported alongside for cross-checking.
    hh, ww = shape
    corners_yx = np.array(
        [[0, 0], [0, ww - 1], [hh - 1, ww - 1], [hh - 1, 0]], np.float32
    )
    true = np.asarray(G.warp_points(jnp.asarray(corners_yx), h))

    def corner_error(est_h_flat) -> float:
        proj = np.asarray(
            G.warp_points(jnp.asarray(corners_yx), jnp.asarray(est_h_flat))
        )
        return float(np.linalg.norm(proj - true, axis=-1).mean())

    h_correct = False
    h_err = float("nan")
    h_err_cv2 = float("nan")
    if mv.sum() >= 4:
        # The ground-truth ``h_flat`` is output->input: `warp_points(p, h)`
        # applies its INVERSE, so h itself maps view-2 points to view-1
        # under direct application.  `ransac_homography` returns H with
        # pts1 ≈ H·pts2 (direct), so view-1 points go FIRST and the matched
        # view-2 targets second — same direction as the ground truth.
        # (Pinned by `tests/test_eval.py::test_matching_metrics_warped`;
        # the swapped order passes only at identity homographies.)
        import jax as _jax

        dst_all = p2[mi]                         # (K, 2) matched targets
        est = ransac_homography(
            _jax.random.PRNGKey(0),
            jnp.asarray(p1, jnp.float32),
            jnp.asarray(dst_all, jnp.float32),
            jnp.asarray(mv),
            inlier_thresh=float(eps),
        )
        h_err = corner_error(np.asarray(est.h_flat))
        h_correct = h_err <= eps

        # host oracle (cv2 expects (x, y) and a 3x3 matrix)
        est_cv, _ = cv2.findHomography(
            p1[mv][:, ::-1].astype(np.float64),
            match_dst[:, ::-1].astype(np.float64),
            cv2.RANSAC, 3.0,
        )
        if est_cv is not None:
            c_xy = corners_yx[:, ::-1].astype(np.float64)
            proj = np.concatenate([c_xy, np.ones((4, 1))], -1) @ est_cv.T
            proj = (proj[:, :2] / proj[:, 2:])[:, ::-1]   # back to (y, x)
            h_err_cv2 = float(np.linalg.norm(proj - true, axis=-1).mean())
    out = {
        "matching_score": matching_score,
        "num_matches": int(mv.sum()),
        "num_correct_matches": int(correct.sum()),
        "match_precision": float(correct.mean()) if mv.sum() else 0.0,
        "homography_correct": float(h_correct),
        "homography_error": h_err,
        "homography_error_cv2": h_err_cv2,
    }
    # HPatches-protocol accuracy at the standard corner-error thresholds,
    # derived from the same estimate (0.0 when no estimate was possible)
    for tol in (1.0, 3.0, 5.0):
        out[f"homography_acc_{int(tol)}px"] = float(
            np.isfinite(h_err) and h_err <= tol
        )
    return out
