"""Tracking front-end: keyframe-based feature tracking over a sequence.

North-star component (BASELINE.json: "SuperPoint tracking with ... pose
graph"): per frame, extract features (any provider), then ONE jitted program
runs match-to-keyframe -> RANSAC homography; the host only decides keyframe
promotion (a scalar compare) and chains poses.

The tracker is decoupled from the CNN: it consumes a ``FrameFeatures``
struct from any extractor — the `SuperPointFrontend` in production, or a
synthetic provider in tests — so the matching/RANSAC/keyframing logic is
verifiable with ideal features independent of detector quality.

Outputs Sim(2) odometry suitable for `slam.posegraph` and ATE evaluation
(`slam.trajectory`).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend
from feature_point_cnn_tpu.ops.matching import mnn_match
from feature_point_cnn_tpu.slam.twoview import (
    ransac_homography,
    sim2_from_homography,
)


class FrameFeatures(NamedTuple):
    """Fixed-K features of one frame."""

    y: jnp.ndarray        # (K,)
    x: jnp.ndarray        # (K,)
    valid: jnp.ndarray    # (K,) bool
    desc: jnp.ndarray     # (K, D) unit descriptors


class TrackEstimate(NamedTuple):
    num_matches: jnp.ndarray
    num_inliers: jnp.ndarray
    rel_sim2: jnp.ndarray   # (4,) keyframe -> frame motion (image content)
    h_flat: jnp.ndarray


def frontend_extractor(frontend: SuperPointFrontend) -> Callable:
    """Wrap a `SuperPointFrontend` as a FrameFeatures provider."""

    def extract(image: np.ndarray) -> FrameFeatures:
        kp, desc = frontend.extract(np.asarray(image)[None])
        return FrameFeatures(kp.y[0], kp.x[0], kp.valid[0], desc[0])

    return extract


def _track_program(
    cur: FrameFeatures, key: FrameFeatures, rng: jax.Array, *,
    ransac_iters: int, inlier_thresh: float,
) -> TrackEstimate:
    m = mnn_match(cur.desc, cur.valid, key.desc, key.valid)
    # aligned correspondences over current-frame slots
    p_key = jnp.stack([key.y[m.index], key.x[m.index]], -1)
    p_cur = jnp.stack([cur.y, cur.x], -1)
    est = ransac_homography(
        rng, p_key, p_cur, m.valid, iters=ransac_iters,
        inlier_thresh=inlier_thresh,
    )
    # est.h_flat maps current-frame points into the keyframe (p_key ≈ H·p_cur)
    return TrackEstimate(
        m.num, est.num_inliers, sim2_from_homography(est.h_flat), est.h_flat
    )


class Tracker:
    """Sequential tracker with automatic keyframe promotion.

    ``extract``: callable ``image -> FrameFeatures``; defaults to the given
    frontend's.  Keyframe promotion: when RANSAC inliers fall below
    ``min_inliers`` the current frame becomes the new keyframe (compare the
    reference C++ app's manual 'k' capture, `main.cc:118-136` — here it is
    automatic).
    """

    def __init__(
        self,
        frontend: Optional[SuperPointFrontend] = None,
        extract: Optional[Callable] = None,
        min_inliers: int = 30,
        ransac_iters: int = 128,
        inlier_thresh: float = 3.0,
        seed: int = 0,
    ):
        assert frontend is not None or extract is not None
        self.extract = extract or frontend_extractor(frontend)
        self.min_inliers = min_inliers
        self.key = jax.random.PRNGKey(seed)
        self._program = jax.jit(
            functools.partial(
                _track_program,
                ransac_iters=ransac_iters,
                inlier_thresh=inlier_thresh,
            )
        )
        self._keyframe: Optional[FrameFeatures] = None
        self._key_pose = jnp.zeros(4)       # absolute Sim(2) of the keyframe
        self._last_pose = jnp.zeros(4)      # last trusted absolute pose
        self._frame_index = 0

    def process(self, image: np.ndarray) -> Dict[str, object]:
        """One frame -> tracking stats + absolute Sim(2) pose."""
        from feature_point_cnn_tpu.slam.posegraph import sim2_compose

        feats = self.extract(image)
        self._frame_index += 1
        if self._keyframe is None:
            self._keyframe = feats
            return {
                "pose": np.zeros(4), "num_matches": 0, "num_inliers": 0,
                "is_keyframe": True,
            }

        est = self._program(
            feats, self._keyframe,
            jax.random.fold_in(self.key, self._frame_index),
        )
        n_inl = int(est.num_inliers)
        # trust the geometric estimate only with a minimal inlier support —
        # RANSAC over <4 valid matches fits noise; committing such a pose
        # would permanently corrupt the trajectory
        trusted = n_inl >= max(4, self.min_inliers // 2)
        if trusted:
            pose = sim2_compose(self._key_pose, est.rel_sim2)
            self._last_pose = pose
        else:
            pose = self._last_pose           # hold the last good pose (lost)
        promoted = n_inl < self.min_inliers
        if promoted:
            # re-anchor the new keyframe at the best available pose
            self._keyframe = feats
            self._key_pose = pose
        return {
            "pose": np.asarray(pose),
            "num_matches": int(est.num_matches),
            "num_inliers": n_inl,
            "is_keyframe": promoted,
            "tracked": trusted,
        }

    def track(self, images: Iterable[np.ndarray]) -> List[Dict[str, object]]:
        return [self.process(im) for im in images]
