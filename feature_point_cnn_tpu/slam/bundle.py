"""Distributed Schur-complement bundle adjustment over a device mesh.

Back-end refinement of keyframe poses AND map points jointly — the scale-out
companion to the dense pose-graph optimizer (`slam/posegraph.py`), and a
first-class parallel component the reference has no analog of (its C++ app
tracks against a single keyframe, `/root/reference/cpp/src/main.cc:62-112`;
no global optimization exists anywhere in the reference).

Problem.  Keyframe poses are Sim(2) elements ``(theta, log_scale, tx, ty)``
(same parameterization as `slam/posegraph.py`); landmarks are 2-D world
points.  An observation ``(i, l, z)`` predicts the landmark in keyframe
``i``'s local frame, ``pred = T_i^{-1} · X_l``, with residual ``z - pred``.

Structure → distribution.  The Gauss-Newton normal system

    [ Hpp  Hpl ] [dp]   [bp]
    [ Hpl' Hll ] [dl] = [bl]

has block-diagonal ``Hll`` (2x2 per landmark: a landmark couples only to
itself) and pose-block-diagonal ``Hpp`` (each observation touches ONE pose).
Eliminating landmarks gives the reduced camera system

    S  = Hpp - Hpl Hll^{-1} Hpl'        (4P x 4P, dense across poses)
    bs = bp  - Hpl Hll^{-1} bl

in which every landmark contributes an independent, additive term.  That
additive structure IS the distribution strategy: landmarks (with their
observation rows) are sharded over the mesh, each device accumulates its
shard's contribution to ``(S, bs)`` in local VMEM-sized blocks, and one
``psum`` over the mesh axis materializes the replicated reduced system.
The 4P x 4P solve is replicated (P keyframes ~ hundreds → trivially small
next to the landmark side), and the landmark back-substitution
``dl = Hll^{-1}(bl - Hpl' dp)`` is again purely shard-local.  Per GN
iteration the only communication is the single ``psum`` of
``(4P x 4P + 4P)`` floats — independent of landmark and observation count,
so the method scales to maps far beyond one device's memory.

Levenberg damping is applied to both blocks; the first pose is gauge-fixed
with a quadratic prior.  Everything is fixed-shape: observations are stored
``(L, M)`` (per-landmark observation slots with a validity mask), landmarks
pad to a multiple of the mesh size with zero-observation entries whose
``Hll = damping·I`` stays invertible and whose updates are discarded.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from feature_point_cnn_tpu.slam.posegraph import sim2_inverse


class BAProblem(NamedTuple):
    """Fixed-shape bundle-adjustment problem.

    poses: ``(P, 4)`` Sim(2) ``(theta, log_scale, tx, ty)`` initial guesses.
    points: ``(L, 2)`` initial landmark positions (world frame).
    obs_pose: ``(L, M)`` int32 — keyframe index of each observation slot.
    obs_xy: ``(L, M, 2)`` — measured landmark position in that keyframe's
      local frame.
    obs_valid: ``(L, M)`` bool — slot validity (ragged → fixed-shape).
    """

    poses: jnp.ndarray
    points: jnp.ndarray
    obs_pose: jnp.ndarray
    obs_xy: jnp.ndarray
    obs_valid: jnp.ndarray


def observe(pose: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Landmark in the keyframe's local frame: ``T^{-1} · X`` (Sim(2))."""
    inv = sim2_inverse(pose)
    c, s = jnp.cos(inv[0]), jnp.sin(inv[0])
    scale = jnp.exp(inv[1])
    x = scale * (c * point[0] - s * point[1]) + inv[2]
    y = scale * (s * point[0] + c * point[1]) + inv[3]
    return jnp.stack([x, y])


def _residual(pose, point, z):
    return z - observe(pose, point)


# Per-observation Jacobians: r is 2-D, pose 4-D, point 2-D → (2,4) and (2,2).
_jac_pose = jax.jacfwd(_residual, argnums=0)
_jac_point = jax.jacfwd(_residual, argnums=1)


def _landmark_terms(poses, point, obs_pose, obs_xy, obs_valid):
    """All Schur ingredients for ONE landmark's observation rows.

    Returns (hpp_blocks (M,4,4), hpl (M,4,2) per-obs, hll (2,2), bp_rows
    (M,4), bl (2), cost, obs pose indices) — everything additive over M.
    """
    p_rows = poses[obs_pose]                               # (M, 4)
    r = jax.vmap(_residual, (0, None, 0))(p_rows, point, obs_xy)   # (M, 2)
    jp = jax.vmap(_jac_pose, (0, None, 0))(p_rows, point, obs_xy)  # (M, 2, 4)
    jl = jax.vmap(_jac_point, (0, None, 0))(p_rows, point, obs_xy) # (M, 2, 2)
    w = obs_valid.astype(jnp.float32)[:, None, None]
    jp = jp * w
    jl = jl * w
    r = r * obs_valid.astype(jnp.float32)[:, None]
    hpp = jnp.einsum("mki,mkj->mij", jp, jp)               # (M, 4, 4)
    hpl = jnp.einsum("mki,mkj->mij", jp, jl)               # (M, 4, 2)
    hll = jnp.einsum("mki,mkj->ij", jl, jl)                # (2, 2)
    bp = jnp.einsum("mki,mk->mi", jp, r)                   # (M, 4)
    bl = jnp.einsum("mki,mk->i", jl, r)                    # (2,)
    return hpp, hpl, hll, bp, bl, jnp.sum(r * r)


def _shard_system(poses, points, obs_pose, obs_xy, obs_valid, n_poses, damping):
    """This shard's additive contribution to the reduced camera system.

    Returns ``(S_contrib (4P,4P), bs_contrib (4P,), cost_contrib ())`` plus
    the shard-local ``Hll^{-1}`` and landmark gradient needed later for
    back-substitution.
    """
    hpp, hpl, hll, bp, bl, cost = jax.vmap(
        functools.partial(_landmark_terms, poses)
    )(points, obs_pose, obs_xy, obs_valid)                 # leading dim Ls

    hll = hll + damping * jnp.eye(2)                       # (Ls, 2, 2)
    hll_inv = jnp.linalg.inv(hll)

    # scatter-add per-observation pose blocks into the (P, 4, ...) frame
    def scatter_pose(blocks, idx, width):
        flat = blocks.reshape(-1, *blocks.shape[2:])       # (Ls*M, 4, w)
        out = jnp.zeros((n_poses, 4, width))
        return out.at[idx.reshape(-1)].add(flat)

    hpp_p = scatter_pose(hpp, obs_pose, 4)                 # (P, 4, 4)
    bp_p = jnp.zeros((n_poses, 4)).at[obs_pose.reshape(-1)].add(
        bp.reshape(-1, 4)
    )

    # W_l = sum_m hpl rows grouped by pose: build (Ls, P, 4, 2) sparsely via
    # scatter, then contract over landmarks for the Schur outer product.
    # Memory: Ls*P*8 floats — fine for shard-local landmark counts; for very
    # large maps raise the mesh size (Ls shrinks linearly).
    ls, m = obs_pose.shape
    w_full = jnp.zeros((ls, n_poses, 4, 2))
    lidx = jnp.repeat(jnp.arange(ls), m)
    w_full = w_full.at[lidx, obs_pose.reshape(-1)].add(hpl.reshape(-1, 4, 2))

    # S -= W Hll^-1 W' ; bs -= W Hll^-1 bl   (contract over landmark axis)
    whi = jnp.einsum("lpij,ljk->lpik", w_full, hll_inv)    # (Ls, P, 4, 2)
    s_off = jnp.einsum("lpik,lqjk->piqj", whi, w_full)     # (P,4,P,4)
    bs_off = jnp.einsum("lpik,lk->pi", whi, bl)

    s_contrib = -s_off.reshape(4 * n_poses, 4 * n_poses)
    diag = jnp.zeros((n_poses, 4, n_poses, 4))
    diag = diag.at[jnp.arange(n_poses), :, jnp.arange(n_poses), :].add(hpp_p)
    s_contrib = s_contrib + diag.reshape(4 * n_poses, 4 * n_poses)
    bs_contrib = (bp_p - bs_off).reshape(-1)
    return s_contrib, bs_contrib, cost.sum(), hll_inv, bl, w_full


def _back_substitute(hll_inv, bl, w_full, dp):
    """Shard-local landmark update ``dl = Hll^{-1} (bl - W' dp)``."""
    n_poses = w_full.shape[1]
    wtdp = jnp.einsum(
        "lpik,pi->lk", w_full, dp.reshape(n_poses, 4)
    )                                                      # (Ls, 2)
    return jnp.einsum("lij,lj->li", hll_inv, bl - wtdp)


def _pad_landmarks(problem: BAProblem, n_shards: int) -> BAProblem:
    l = problem.points.shape[0]
    pad = (-l) % n_shards
    if pad == 0:
        return problem
    return BAProblem(
        problem.poses,
        jnp.pad(problem.points, ((0, pad), (0, 0))),
        jnp.pad(problem.obs_pose, ((0, pad), (0, 0))),
        jnp.pad(problem.obs_xy, ((0, pad), (0, 0), (0, 0))),
        jnp.pad(problem.obs_valid, ((0, pad), (0, 0))),
    )


def bundle_adjust(
    problem: BAProblem,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    iters: int = 10,
    damping: float = 1e-4,
    anchor_weight: float = 1e4,
):
    """Distributed Schur-complement Gauss-Newton bundle adjustment.

    Landmarks and observations are sharded over ``mesh[axis]``; per
    iteration the only cross-device traffic is one ``psum`` of the reduced
    camera system.  With ``mesh=None`` runs the identical algorithm on one
    device.  Returns ``(poses (P,4), points (L,2), costs (iters,))``.
    """
    n_shards = mesh.shape[axis] if mesh is not None else 1
    l_orig = problem.points.shape[0]
    problem = _pad_landmarks(problem, n_shards)
    n_poses = problem.poses.shape[0]

    def gn_iter(poses, points, obs_pose, obs_xy, obs_valid):
        s, bs, cost, hll_inv, bl, w_full = _shard_system(
            poses, points, obs_pose, obs_xy, obs_valid, n_poses, damping
        )
        if mesh is not None:
            s = jax.lax.psum(s, axis)
            bs = jax.lax.psum(bs, axis)
            cost = jax.lax.psum(cost, axis)
        # gauge fix: quadratic prior pinning pose 0 at its current value
        # (contributes H += w·I on its block, b += 0)
        anchor = jnp.zeros(4 * n_poses).at[:4].set(anchor_weight)
        s = s + jnp.diag(anchor) + damping * jnp.eye(4 * n_poses)
        # b-vectors were accumulated as +J'r; GN solves H δ = -J'r, so the
        # computed (dp, dl) are the NEGATED update
        dp = jnp.linalg.solve(s, bs)
        dl = _back_substitute(hll_inv, bl, w_full, dp)
        return poses - dp.reshape(n_poses, 4), points - dl, cost

    if mesh is not None:
        spec_l = P(axis)
        gn_iter = shard_map(
            gn_iter,
            mesh=mesh,
            in_specs=(P(), spec_l, spec_l, spec_l, spec_l),
            out_specs=(P(), spec_l, P()),
            check_vma=False,
        )

    @jax.jit
    def run(problem):
        def body(carry, _):
            poses, points = carry
            poses, points, cost = gn_iter(
                poses, points, problem.obs_pose, problem.obs_xy,
                problem.obs_valid,
            )
            return (poses, points), cost

        (poses, points), costs = jax.lax.scan(
            body, (problem.poses, problem.points), None, length=iters
        )
        return poses, points, costs

    if mesh is not None:
        shard = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        problem = BAProblem(
            jax.device_put(problem.poses, rep),
            jax.device_put(problem.points, shard),
            jax.device_put(problem.obs_pose, shard),
            jax.device_put(problem.obs_xy, shard),
            jax.device_put(problem.obs_valid, shard),
        )
    poses, points, costs = run(problem)
    return poses, points[:l_orig], costs


def dense_bundle_adjust_reference(
    problem: BAProblem, iters: int = 10, damping: float = 1e-4,
    anchor_weight: float = 1e4,
):
    """Oracle: the SAME GN iteration solved densely (no Schur elimination,
    no sharding) via the full ``(4P + 2L)`` normal system.  Used by tests to
    prove the distributed path is algebraically identical."""
    n_poses = problem.poses.shape[0]
    n_points = problem.points.shape[0]

    def full_residuals(x):
        poses = x[: 4 * n_poses].reshape(n_poses, 4)
        points = x[4 * n_poses :].reshape(n_points, 2)

        def one(point, op, oz, ov):
            r = jax.vmap(_residual, (0, None, 0))(poses[op], point, oz)
            return r * ov.astype(jnp.float32)[:, None]

        r = jax.vmap(one)(points, problem.obs_pose, problem.obs_xy,
                          problem.obs_valid)
        return r.reshape(-1)

    x = jnp.concatenate(
        [problem.poses.reshape(-1), problem.points.reshape(-1)]
    )
    costs = []
    for _ in range(iters):
        r = full_residuals(x)
        jac = jax.jacfwd(full_residuals)(x)
        h = jac.T @ jac + damping * jnp.eye(x.shape[0])
        h = h.at[jnp.arange(4), jnp.arange(4)].add(anchor_weight)
        b = -jac.T @ r                       # residual convention: z - pred
        dx = jnp.linalg.solve(h, -b)
        x = x - dx
        costs.append(jnp.sum(r * r))
    return (
        x[: 4 * n_poses].reshape(n_poses, 4),
        x[4 * n_poses :].reshape(n_points, 2),
        jnp.stack(costs),
    )


def synthetic_ba_problem(
    rng: np.random.Generator,
    n_poses: int = 6,
    n_points: int = 48,
    obs_per_point: int = 4,
    noise: float = 0.01,
    init_noise: float = 0.05,
) -> tuple:
    """Random well-conditioned Sim(2) BA instance; returns
    ``(problem, true_poses, true_points)``."""
    true_poses = np.concatenate(
        [
            rng.uniform(-0.3, 0.3, (n_poses, 1)),          # theta
            rng.uniform(-0.1, 0.1, (n_poses, 1)),          # log scale
            rng.uniform(-1.0, 1.0, (n_poses, 2)),          # t
        ],
        axis=1,
    ).astype(np.float32)
    true_poses[0] = 0.0                                    # gauge anchor
    true_points = rng.uniform(-2.0, 2.0, (n_points, 2)).astype(np.float32)

    obs_pose = np.stack(
        [
            rng.choice(n_poses, obs_per_point, replace=False)
            for _ in range(n_points)
        ]
    ).astype(np.int32)
    obs_xy = np.zeros((n_points, obs_per_point, 2), np.float32)
    for li in range(n_points):
        for mi in range(obs_per_point):
            z = observe(
                jnp.asarray(true_poses[obs_pose[li, mi]]),
                jnp.asarray(true_points[li]),
            )
            obs_xy[li, mi] = np.asarray(z) + rng.normal(0, noise, 2)
    obs_valid = np.ones((n_points, obs_per_point), bool)
    # ragged reality: drop a few slots
    obs_valid[rng.random((n_points, obs_per_point)) < 0.1] = False

    problem = BAProblem(
        jnp.asarray(
            true_poses + rng.normal(0, init_noise, true_poses.shape)
        ).astype(jnp.float32).at[0].set(jnp.asarray(true_poses[0])),
        jnp.asarray(true_points + rng.normal(0, init_noise, true_points.shape)
                    ).astype(jnp.float32),
        jnp.asarray(obs_pose),
        jnp.asarray(obs_xy),
        jnp.asarray(obs_valid),
    )
    return problem, true_poses, true_points
