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
        trust_min_inliers: int = 15,
    ):
        assert frontend is not None or extract is not None
        self.extract = extract or frontend_extractor(frontend)
        self.min_inliers = min_inliers
        # geometric-trust floor, DECOUPLED from the promotion threshold:
        # `min_inliers` says "view overlap is getting thin, refresh the
        # keyframe"; `trust_min_inliers` says "this RANSAC estimate is
        # real".  Tying trust to min_inliers//2 (pre-round-5 behavior)
        # anchored promoted keyframes at STALE poses whenever overlap
        # dropped fast — a systematic odometry shortfall no pose graph can
        # repair (loop closures only enforce internal consistency).
        # Clamped to min_inliers: a floor ABOVE the promotion threshold
        # would freeze the pose forever (never trusted, never re-keyed)
        self.trust_min_inliers = max(4, min(trust_min_inliers, min_inliers))
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
        # keyframe database for loop closure / pose-graph refinement:
        # features + the absolute pose each keyframe was anchored at
        self.keyframes: List[FrameFeatures] = []
        self.keyframe_poses: List[np.ndarray] = []
        self.keyframe_frames: List[int] = []

    def _add_keyframe(self, feats: FrameFeatures, pose) -> int:
        self.keyframes.append(feats)
        self.keyframe_poses.append(np.asarray(pose))
        self.keyframe_frames.append(self._frame_index)
        return len(self.keyframes) - 1

    def process(self, image: np.ndarray) -> Dict[str, object]:
        """One frame -> tracking stats + absolute Sim(2) pose.

        The output also carries the pose-graph bookkeeping: ``key_id`` (the
        keyframe this frame's pose is anchored to) and ``rel`` (the Sim(2)
        keyframe->frame motion), so `refine_with_pose_graph` can recompose
        every frame from refined keyframe poses."""
        from feature_point_cnn_tpu.slam.posegraph import sim2_compose

        feats = self.extract(image)
        self._frame_index += 1
        if self._keyframe is None:
            self._keyframe = feats
            kid = self._add_keyframe(feats, np.zeros(4))
            return {
                "pose": np.zeros(4), "num_matches": 0, "num_inliers": 0,
                "is_keyframe": True, "tracked": True,
                "key_id": kid, "rel": np.zeros(4),
            }

        est = self._program(
            feats, self._keyframe,
            jax.random.fold_in(self.key, self._frame_index),
        )
        n_inl = int(est.num_inliers)
        # trust the geometric estimate only with a minimal inlier support —
        # RANSAC over too few valid matches fits noise; committing such a
        # pose would permanently corrupt the trajectory (measured: an 11-"inlier"
        # RANSAC fit on a 20%-overlap frame committed a rotated Sim(2))
        trusted = n_inl >= self.trust_min_inliers
        rel = np.asarray(est.rel_sim2)
        key_id = len(self.keyframes) - 1
        if trusted:
            pose = sim2_compose(self._key_pose, est.rel_sim2)
            self._last_pose = pose
        else:
            pose = self._last_pose           # hold the last good pose (lost)
            rel = np.zeros(4)
        promoted = n_inl < self.min_inliers
        if promoted:
            # re-anchor the new keyframe at the best available pose
            self._keyframe = feats
            self._key_pose = pose
            key_id = self._add_keyframe(feats, pose)
            rel = np.zeros(4)                # frame IS the new keyframe
        return {
            "pose": np.asarray(pose),
            "num_matches": int(est.num_matches),
            "num_inliers": n_inl,
            "is_keyframe": promoted,
            "tracked": trusted,
            "key_id": key_id,
            "rel": rel,
        }

    def track(self, images: Iterable[np.ndarray]) -> List[Dict[str, object]]:
        return [self.process(im) for im in images]


def detect_loop_closures(
    tracker: Tracker,
    min_inliers: int = 25,
    min_gap: int = 2,
    seed: int = 1,
) -> List[Dict[str, object]]:
    """Descriptor-match every non-adjacent keyframe pair; return accepted
    loop-closure edges.

    Closes the loop the reference never does (its demo matches only against
    one manually captured keyframe, `/root/reference/cpp/src/main.cc:118-136`):
    each pair runs the SAME jitted match+RANSAC program as frame tracking
    (one compile, fixed shapes), so an O(N²) sweep over the keyframe set is
    a few milliseconds per pair.  A pair (i, j) with ``j - i >= min_gap``
    and at least ``min_inliers`` RANSAC inliers yields an edge whose
    measurement is the Sim(2) relative pose ``T_i^-1 ∘ T_j`` — exactly the
    `slam.posegraph` edge convention.
    """
    key = jax.random.PRNGKey(seed)
    n = len(tracker.keyframes)
    closures: List[Dict[str, object]] = []
    for j in range(n):
        for i in range(0, j - min_gap + 1):
            est = tracker._program(
                tracker.keyframes[j], tracker.keyframes[i],
                jax.random.fold_in(key, i * n + j),
            )
            n_inl = int(est.num_inliers)
            if n_inl >= min_inliers:
                closures.append({
                    "i": i, "j": j,
                    "rel": np.asarray(est.rel_sim2),
                    "num_inliers": n_inl,
                })
    return closures


def refine_with_pose_graph(
    results: List[Dict[str, object]],
    tracker: Tracker,
    closures: List[Dict[str, object]],
    loop_weight: float = 5.0,
    iters: int = 20,
) -> np.ndarray:
    """Pose-graph refinement of a tracked trajectory: odometry edges chain
    consecutive keyframes (carrying the tracker's accumulated drift), loop
    edges re-observe old keyframes; Gauss-Newton redistributes the drift.
    Returns refined absolute ``(N_frames, 4)`` Sim(2) poses — every frame
    recomposed as ``refined_keyframe_pose ∘ rel``.
    """
    from feature_point_cnn_tpu.slam.posegraph import (
        PoseGraph,
        optimize_pose_graph,
        sim2_compose,
        sim2_inverse,
    )

    kf_poses = jnp.asarray(np.stack(tracker.keyframe_poses))     # (N, 4)
    n = kf_poses.shape[0]
    edges, meas, w = [], [], []
    for i in range(n - 1):
        rel = sim2_compose(sim2_inverse(kf_poses[i]), kf_poses[i + 1])
        edges.append((i, i + 1))
        meas.append(np.asarray(rel))
        w.append(1.0)
    for c in closures:
        edges.append((c["i"], c["j"]))
        meas.append(c["rel"])
        w.append(loop_weight)

    if edges:
        graph = PoseGraph(
            poses=kf_poses,
            edges_ij=jnp.asarray(np.asarray(edges, np.int32)),
            measurements=jnp.asarray(np.stack(meas).astype(np.float32)),
            weights=jnp.asarray(np.asarray(w, np.float32)),
        )
        refined = np.asarray(optimize_pose_graph(graph, iters=iters))
    else:
        refined = np.asarray(kf_poses)

    out = np.zeros((len(results), 4), np.float32)
    last = np.zeros(4, np.float32)
    for f, r in enumerate(results):
        if r.get("tracked", False) or r.get("is_keyframe", False):
            # a promoted frame IS its keyframe (rel = 0): even when the
            # promotion was untrusted, its refined pose is refined[key_id]
            last = np.asarray(
                sim2_compose(jnp.asarray(refined[r["key_id"]]),
                             jnp.asarray(r["rel"]))
            )
        out[f] = last
    return out
