"""Two-view geometry on device: weighted DLT + fixed-shape RANSAC.

North-star extension beyond the reference (which stops at descriptor
matching, SURVEY.md §7 stage 7): robust relative-geometry estimation from
the fixed-K match arrays, designed TPU-first —

* RANSAC is a **fixed-iteration parallel hypothesis sweep**: all ``iters``
  4-point minimal samples are drawn at once, all DLT solves and inlier
  counts run under `vmap`, and the winner refits on its inliers.  No
  data-dependent loop, one XLA program;
* homographies use the framework's flat ``(8,)`` output->input convention
  and ``(y, x)`` points, so estimates compose directly with
  `geometry.homography`.

Here "pose" is the planar homography (the reference's domain is
homography-related views); `slam.posegraph` reduces these to Sim(2) motions
for trajectory optimization.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.geometry.homography import mat2flat
from feature_point_cnn_tpu.geometry.warp import apply_flat_homography


class TwoViewEstimate(NamedTuple):
    h_flat: jnp.ndarray      # (8,) homography mapping view-2 pts -> view-1 pts
    inliers: jnp.ndarray     # (K,) bool over the match slots
    num_inliers: jnp.ndarray  # ()


def _normalization(pts_xy: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Hartley normalization matrix: weighted centroid to origin, weighted
    mean distance to sqrt(2)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mean = jnp.sum(pts_xy * w[:, None], axis=0) / wsum
    dist = jnp.linalg.norm(pts_xy - mean, axis=-1)
    mean_dist = jnp.sum(dist * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-6)
    return jnp.asarray(
        [[s, 0.0, -s * mean[0]], [0.0, s, -s * mean[1]], [0.0, 0.0, 1.0]]
    )


def _dlt_homography(src_xy: jnp.ndarray, dst_xy: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted, Hartley-normalized DLT: h maps ``dst`` (output frame) to
    ``src`` (input frame), i.e. ``src ≈ H·dst`` — the framework's
    inverse-warp convention.

    Solves the 9-vector via the smallest eigenvector of the weighted normal
    matrix (cheap and `vmap`-able).  ``src_xy, dst_xy``: ``(N, 2)``;
    ``w``: ``(N,)``.
    """
    t_src = _normalization(src_xy, w)
    t_dst = _normalization(dst_xy, w)
    sn = src_xy * t_src[0, 0] + t_src[:2, 2]
    dn = dst_xy * t_dst[0, 0] + t_dst[:2, 2]

    x, y = dn[:, 0], dn[:, 1]
    u, v = sn[:, 0], sn[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    ax = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * u, -y * u, -u], -1)
    ay = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * v, -y * v, -v], -1)
    a = jnp.concatenate([ax, ay], axis=0) * jnp.concatenate([w, w])[:, None]
    ata = a.T @ a
    _, vecs = jnp.linalg.eigh(ata)
    h_norm = vecs[:, 0].reshape(3, 3)
    # denormalize: src_n = Ĥ·dst_n  =>  src = T_src^-1 Ĥ T_dst · dst
    h_full = jnp.linalg.inv(t_src) @ h_norm @ t_dst
    return mat2flat(h_full)


def _sym_transfer_error(h_flat: jnp.ndarray, pts1_xy, pts2_xy) -> jnp.ndarray:
    """One-sided transfer error |H·p2 - p1| (pixels)."""
    proj = apply_flat_homography(h_flat, pts2_xy)
    return jnp.linalg.norm(proj - pts1_xy, axis=-1)


def ransac_homography(
    key: jax.Array,
    pts1_yx: jnp.ndarray,
    pts2_yx: jnp.ndarray,
    valid: jnp.ndarray,
    iters: int = 128,
    inlier_thresh: float = 3.0,
) -> TwoViewEstimate:
    """Estimate the homography relating matched point sets.

    Args:
      pts1_yx / pts2_yx: ``(K, 2)`` corresponding points ``(y, x)`` (invalid
        slots arbitrary); ``valid``: ``(K,)`` bool.

    Returns the refit estimate with ``h_flat`` mapping view-2 points into
    view 1 (``p1 ≈ H·p2``).
    """
    k = pts1_yx.shape[0]
    p1 = pts1_yx[:, ::-1].astype(jnp.float32)    # (K, 2) (x, y)
    p2 = pts2_yx[:, ::-1].astype(jnp.float32)
    w_valid = valid.astype(jnp.float32)

    # draw `iters` minimal samples among valid matches (Gumbel top-4 without
    # replacement per hypothesis)
    def sample_idx(k_i):
        g = jax.random.gumbel(k_i, (k,))
        scores = jnp.where(valid, g, -jnp.inf)
        return jax.lax.top_k(scores, 4)[1]

    keys = jax.random.split(key, iters)
    idx = jax.vmap(sample_idx)(keys)             # (iters, 4)

    def hypothesis(sel):
        w = jnp.zeros((k,)).at[sel].set(1.0) * w_valid
        h = _dlt_homography(p1, p2, w)
        err = _sym_transfer_error(h, p1, p2)
        inl = (err <= inlier_thresh) & valid
        return h, jnp.sum(inl)

    hs, counts = jax.vmap(hypothesis)(idx)       # (iters, 8), (iters,)
    best = jnp.argmax(counts)
    h_best = hs[best]

    # local optimization (LO-RANSAC): iterate refit-on-inliers from the best
    # minimal hypothesis, keeping the iterate with the most inliers.  Each
    # round is a weighted DLT over the current inlier set; fixed trip count
    # keeps it one XLA program.
    err = _sym_transfer_error(h_best, p1, p2)
    inl = (err <= inlier_thresh) & valid
    h_out, inl_out, n_out = h_best, inl, jnp.sum(inl)
    for _ in range(3):
        h_refit = _dlt_homography(p1, p2, inl_out.astype(jnp.float32))
        err2 = _sym_transfer_error(h_refit, p1, p2)
        inl2 = (err2 <= inlier_thresh) & valid
        n2 = jnp.sum(inl2)
        better = n2 >= n_out  # ties advance too: same count, lower residual
        h_out = jnp.where(better, h_refit, h_out)
        inl_out = jnp.where(better, inl2, inl_out)
        n_out = jnp.where(better, n2, n_out)
    return TwoViewEstimate(
        h_flat=h_out, inliers=inl_out, num_inliers=n_out
    )


def sim2_from_homography(h_flat: jnp.ndarray) -> jnp.ndarray:
    """Project a homography onto Sim(2): ``(theta, log_scale, tx, ty)``.

    Uses the upper-left 2x2 affine part (valid for mostly-planar,
    low-perspective motion): scale = sqrt(|det A|), theta from the polar
    factor, translation from the affine offset.
    """
    a = jnp.stack(
        [jnp.stack([h_flat[0], h_flat[1]]), jnp.stack([h_flat[3], h_flat[4]])]
    )
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    scale = jnp.sqrt(jnp.maximum(jnp.abs(det), 1e-12))
    theta = jnp.arctan2(a[1, 0] - a[0, 1], a[0, 0] + a[1, 1])
    return jnp.stack([theta, jnp.log(scale), h_flat[2], h_flat[5]])
