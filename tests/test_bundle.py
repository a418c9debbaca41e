"""Distributed Schur-complement bundle adjustment tests: the sharded
8-device path must be algebraically identical to a dense full-system
Gauss-Newton oracle, and both must recover the ground-truth geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.parallel.mesh import make_mesh
from feature_point_cnn_tpu.slam.bundle import (
    BAProblem,
    bundle_adjust,
    dense_bundle_adjust_reference,
    observe,
    synthetic_ba_problem,
)


def test_observe_roundtrip():
    """observe(T, X) expresses X in T's local frame; T=identity is a no-op."""
    x = jnp.asarray([1.5, -0.5])
    np.testing.assert_allclose(
        np.asarray(observe(jnp.zeros(4), x)), np.asarray(x), atol=1e-7
    )
    # pure translation: local = world - t
    t = jnp.asarray([0.0, 0.0, 2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(observe(t, x)), np.asarray(x) - [2.0, 3.0], atol=1e-6
    )


def test_schur_matches_dense_oracle_single_device(rng):
    """Schur elimination == solving the full (4P+2L) system, per iteration."""
    problem, _, _ = synthetic_ba_problem(rng)
    p1, x1, c1 = bundle_adjust(problem, mesh=None, iters=5)
    p2, x2, c2 = dense_bundle_adjust_reference(problem, iters=5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=2e-4)


def test_distributed_matches_single_device(rng):
    """8-way landmark sharding (psum-reduced camera system) changes nothing
    but the float summation order."""
    problem, _, _ = synthetic_ba_problem(rng, n_poses=5, n_points=40)
    mesh = make_mesh(8)
    p1, x1, c1 = bundle_adjust(problem, mesh=mesh, iters=6)
    p2, x2, c2 = bundle_adjust(problem, mesh=None, iters=6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=2e-4)
    assert x1.shape == problem.points.shape  # padding stripped


def test_ba_recovers_ground_truth(rng):
    """Noisy init (sigma=0.05) + near-exact observations converge to truth
    on the mesh path; final cost is orders below the initial."""
    problem, true_poses, true_points = synthetic_ba_problem(
        rng, n_poses=6, n_points=48, noise=1e-4, init_noise=0.05
    )
    mesh = make_mesh(8)
    poses, points, costs = bundle_adjust(problem, mesh=mesh, iters=10)
    assert float(costs[-1]) < 1e-2 * float(costs[0])
    np.testing.assert_allclose(
        np.asarray(poses), true_poses, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(points), true_points, atol=5e-3
    )


def test_ba_landmark_count_not_divisible_by_mesh(rng):
    """L % n_devices != 0 pads internally with zero-observation landmarks
    and strips them from the output."""
    problem, _, _ = synthetic_ba_problem(rng, n_poses=4, n_points=37)
    mesh = make_mesh(8)
    p1, x1, c1 = bundle_adjust(problem, mesh=mesh, iters=4)
    p2, x2, c2 = bundle_adjust(problem, mesh=None, iters=4)
    assert x1.shape == (37, 2)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-4)


def test_ba_invalid_observations_ignored(rng):
    """Zeroing obs_valid on a landmark's slots must leave poses driven only
    by the remaining landmarks (and the dropped landmark unmoved)."""
    problem, _, _ = synthetic_ba_problem(rng, n_poses=4, n_points=24)
    dead = problem._replace(
        obs_valid=problem.obs_valid.at[3].set(False)
    )
    poses, points, _ = bundle_adjust(dead, mesh=None, iters=4)
    # the dead landmark has zero gradient: position unchanged
    np.testing.assert_allclose(
        np.asarray(points[3]), np.asarray(problem.points[3]), atol=1e-6
    )
    assert np.isfinite(np.asarray(poses)).all()
