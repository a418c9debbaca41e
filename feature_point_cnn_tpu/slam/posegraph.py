"""Pose-graph optimization over Sim(2) keyframe poses — jitted Gauss-Newton.

North-star back-end component (BASELINE.json: pose-graph optimization in
JAX).  Poses are ``(theta, log_scale, tx, ty)`` Sim(2) elements; edges carry
relative measurements in the same parameterization (from
`slam.twoview.sim2_from_homography` or loop closures).

The optimizer is a fixed-iteration Gauss-Newton loop under `lax.scan`:
residuals for all edges are computed in parallel, the (4N x 4N) normal
system is assembled densely and solved with Cholesky — appropriate up to a
few thousand keyframes on one chip; the distributed Schur-complement
variant over a sharded map is future work (SURVEY.md §7 stage 7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PoseGraph(NamedTuple):
    poses: jnp.ndarray     # (N, 4) Sim(2): theta, log_scale, tx, ty
    edges_ij: jnp.ndarray  # (E, 2) int32 node indices
    measurements: jnp.ndarray  # (E, 4) relative pose i -> j
    weights: jnp.ndarray   # (E,) information weight per edge


def sim2_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a ∘ b``: apply ``b`` then ``a``.  t = t_a + s_a·R(θ_a)·t_b."""
    theta = a[..., 0] + b[..., 0]
    log_s = a[..., 1] + b[..., 1]
    c, s = jnp.cos(a[..., 0]), jnp.sin(a[..., 0])
    scale = jnp.exp(a[..., 1])
    tx = a[..., 2] + scale * (c * b[..., 2] - s * b[..., 3])
    ty = a[..., 3] + scale * (s * b[..., 2] + c * b[..., 3])
    return jnp.stack([theta, log_s, tx, ty], axis=-1)


def sim2_inverse(p: jnp.ndarray) -> jnp.ndarray:
    theta, log_s = p[..., 0], p[..., 1]
    c, s = jnp.cos(-theta), jnp.sin(-theta)
    inv_scale = jnp.exp(-log_s)
    tx = -inv_scale * (c * p[..., 2] - s * p[..., 3])
    ty = -inv_scale * (s * p[..., 2] + c * p[..., 3])
    return jnp.stack([-theta, -log_s, tx, ty], axis=-1)


def _wrap_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def edge_residuals(poses, edges_ij, measurements) -> jnp.ndarray:
    """``r_e = log( m^-1 ∘ (T_i^-1 ∘ T_j) )`` per edge, ``(E, 4)``."""
    ti = poses[edges_ij[:, 0]]
    tj = poses[edges_ij[:, 1]]
    rel = sim2_compose(sim2_inverse(ti), tj)
    err = sim2_compose(sim2_inverse(measurements), rel)
    return err.at[:, 0].set(_wrap_angle(err[:, 0]))


def optimize_pose_graph(
    graph: PoseGraph,
    iters: int = 20,
    damping: float = 1e-6,
    fix_first: bool = True,
) -> jnp.ndarray:
    """Gauss-Newton refinement; returns optimized ``(N, 4)`` poses.

    The first pose is gauge-fixed by a large prior when ``fix_first``.
    """
    n = graph.poses.shape[0]

    def residual_vec(poses_flat):
        poses = poses_flat.reshape(n, 4)
        r = edge_residuals(poses, graph.edges_ij, graph.measurements)
        r = r * jnp.sqrt(graph.weights)[:, None]
        if fix_first:
            anchor = (poses[0] - graph.poses[0]) * 1e3
            return jnp.concatenate([r.reshape(-1), anchor])
        return r.reshape(-1)

    def gn_step(poses_flat, _):
        r = residual_vec(poses_flat)
        jac = jax.jacfwd(residual_vec)(poses_flat)              # (R, 4N)
        jtj = jac.T @ jac + damping * jnp.eye(4 * n)
        jtr = jac.T @ r
        delta = jnp.linalg.solve(jtj, jtr)
        return poses_flat - delta, jnp.sum(r * r)

    init = graph.poses.reshape(-1)
    final, costs = jax.lax.scan(gn_step, init, None, length=iters)
    poses = final.reshape(n, 4)
    return poses.at[:, 0].set(_wrap_angle(poses[:, 0]))


def chain_poses(relative: jnp.ndarray) -> jnp.ndarray:
    """Integrate relative motions ``(N-1, 4)`` into absolute poses ``(N, 4)``
    starting at identity (odometry chaining)."""

    def step(carry, rel):
        new = sim2_compose(carry, rel)
        return new, new

    _, poses = jax.lax.scan(step, jnp.zeros(4), relative)
    return jnp.concatenate([jnp.zeros((1, 4)), poses], axis=0)
