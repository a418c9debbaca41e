"""Random homography engine — sampling, algebra, point warping, valid masks.

TPU-first re-design of `/root/reference/python/src/homographies.py`:

* `sample_homography` is pure JAX under an explicit PRNG key, fully
  `vmap`-able (the reference solves DLT per-sample on the host with unseeded
  scipy/torch RNG, `homographies.py:78-192`);
* data-dependent candidate selection (valid scales / rotations) uses a
  Gumbel-argmax over a validity mask instead of `torch.nonzero` + randint —
  fixed shapes, no host sync;
* morphological erosion of valid masks is an on-device convolution against an
  OpenCV-identical ellipse structuring element (the reference round-trips
  device→cv2.erode→device per warp, `homographies.py:239-247`);
* ragged `filter_points` becomes a validity-mask update (fixed shapes).

Conventions (identical to the reference):

* flat homography ``(8,)`` with ``h22=1`` maps output ``(x, y)`` pixel coords
  to input coords;
* `warp_points` takes/returns ``(y, x)`` points and warps with the **inverse**
  homography (`homographies.py:349-376`) — it moves input-frame points into
  the warped frame.

Deviation note: the reference's `truncated_normal` calls
``scipy.truncnorm(a, b).rvs`` with ``a = -2*std`` and no scale, which yields a
*standard* normal truncated to ``[-2·std, 2·std]`` (≈ uniform for small std)
rather than a normal with that std (`homographies.py:64-67`).  We implement
the intended distribution: ``truncated_normal(-2, 2) * std + mean``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.config import HomographyConfig
from feature_point_cnn_tpu.geometry.warp import warp_image


# ---------------------------------------------------------------------------
# Flat homography algebra (homographies.py:195-216)
# ---------------------------------------------------------------------------

def flat2mat(h: jnp.ndarray) -> jnp.ndarray:
    """``(..., 8) -> (..., 3, 3)`` with ``h22 = 1``."""
    one = jnp.ones(h.shape[:-1] + (1,), h.dtype)
    return jnp.concatenate([h, one], axis=-1).reshape(h.shape[:-1] + (3, 3))


def mat2flat(m: jnp.ndarray) -> jnp.ndarray:
    """``(..., 3, 3) -> (..., 8)``, normalized by ``m[2, 2]``."""
    flat = m.reshape(m.shape[:-2] + (9,))
    return (flat / flat[..., 8:9])[..., :8]


def invert_homography(h: jnp.ndarray) -> jnp.ndarray:
    return mat2flat(jnp.linalg.inv(flat2mat(h)))


def compose_homographies(h1: jnp.ndarray, h2: jnp.ndarray) -> jnp.ndarray:
    """Flat homography of applying ``h2`` then ``h1`` (matrix product)."""
    return mat2flat(flat2mat(h1) @ flat2mat(h2))


# ---------------------------------------------------------------------------
# Point warping (homographies.py:349-387)
# ---------------------------------------------------------------------------

def warp_points(points: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Warp ``(N, 2)`` ``(y, x)`` points with the INVERSE of ``h``.

    ``h``: ``(8,)`` or ``(B, 8)``.  Returns ``(N, 2)`` or ``(B, N, 2)``.
    """
    batched = h.ndim == 2
    hb = h if batched else h[None]
    xy = points[:, ::-1].astype(jnp.float32)                  # (N, 2) (x, y)
    ones = jnp.ones((xy.shape[0], 1), jnp.float32)
    homog = jnp.concatenate([xy, ones], axis=-1)              # (N, 3)
    h_inv = flat2mat(invert_homography(hb))                   # (B, 3, 3)
    warped = jnp.einsum("bij,nj->bni", h_inv, homog)
    warped = warped[..., :2] / warped[..., 2:]
    warped = warped[..., ::-1]                                # back to (y, x)
    return warped if batched else warped[0]


def points_in_image_mask(points: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Bool mask of ``(..., 2)`` ``(y, x)`` points inside ``[0, shape-1]``.

    Fixed-shape replacement for `filter_points` (`homographies.py:379-387`).
    """
    limit = jnp.asarray(shape, jnp.float32) - 1.0
    ok = (points >= 0.0) & (points <= limit)
    return jnp.all(ok, axis=-1)


# ---------------------------------------------------------------------------
# Homography sampling (homographies.py:78-192)
# ---------------------------------------------------------------------------

def _truncated_normal(key, shape, mean=0.0, std=1.0):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape) * std + mean


def _uniform_swapped(key, low, high):
    """Uniform on [low, high], swapping bounds if inverted and widening
    degenerate intervals — semantics of `random_uniform`
    (`homographies.py:70-75`)."""
    lo = jnp.minimum(low, high)
    hi = jnp.maximum(low, high)
    hi = jnp.where(hi - lo < 1e-12, lo + 1e-5, hi)
    return jax.random.uniform(key, (), jnp.float32, 0.0, 1.0) * (hi - lo) + lo


def _choose_uniform_valid(key, valid: jnp.ndarray) -> jnp.ndarray:
    """Uniformly pick one index among True entries (Gumbel-argmax)."""
    g = jax.random.gumbel(key, valid.shape)
    return jnp.argmax(jnp.where(valid, g, -jnp.inf))


def sample_homography(
    key: jax.Array,
    shape: Tuple[int, int],
    config: HomographyConfig = HomographyConfig(),
) -> jnp.ndarray:
    """Sample a random valid homography as a flat ``(8,)`` vector.

    A half-size (``patch_ratio``) centered patch is perturbed in perspective,
    scaled, translated, and rotated; the flat homography maps output (warped)
    points to input-patch points — semantics of `homographies.py:78-192`.
    ``shape`` is ``(H, W)``.
    """
    k_persp, k_scale, k_scale_pick, k_tx, k_ty, k_rot, k_rot_pick = (
        jax.random.split(key, 7)
    )
    margin = (1.0 - config.patch_ratio) / 2.0
    unit = jnp.array(
        [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]], jnp.float32
    )
    pts1 = margin + config.patch_ratio * unit                 # (4, 2) (x, y)
    pts2 = pts1

    if config.perspective:
        ax = config.perspective_amplitude_x
        ay = config.perspective_amplitude_y
        if not config.allow_artifacts:
            ax = min(ax, margin)
            ay = min(ay, margin)
        kp1, kp2, kp3 = jax.random.split(k_persp, 3)
        persp = _truncated_normal(kp1, (), std=ay / 2.0)
        left = _truncated_normal(kp2, (), std=ax / 2.0)
        right = _truncated_normal(kp3, (), std=ax / 2.0)
        pts2 = pts2 + jnp.stack(
            [
                jnp.stack([left, persp]),
                jnp.stack([left, -persp]),
                jnp.stack([right, persp]),
                jnp.stack([right, -persp]),
            ]
        )

    if config.scaling:
        n = config.n_scales
        scales = jnp.concatenate(
            [jnp.ones((1,)), _truncated_normal(k_scale, (n,), 1.0, config.scaling_amplitude / 2.0)]
        )                                                      # (n+1,)
        center = jnp.mean(pts2, axis=0, keepdims=True)
        scaled = (pts2 - center)[None] * scales[:, None, None] + center  # (n+1, 4, 2)
        if config.allow_artifacts:
            valid = jnp.arange(n + 1) < n                      # indices 0..n-1
        else:
            valid = jnp.all((scaled >= 0.0) & (scaled < 1.0), axis=(1, 2))
        pts2 = scaled[_choose_uniform_valid(k_scale_pick, valid)]

    if config.translation:
        t_min = jnp.min(pts2, axis=0)
        t_max = jnp.min(1.0 - pts2, axis=0)
        if config.allow_artifacts:
            t_min = t_min + config.translation_overflow
            t_max = t_max + config.translation_overflow
        tx = _uniform_swapped(k_tx, -t_min[0], t_max[0])
        ty = _uniform_swapped(k_ty, -t_min[1], t_max[1])
        pts2 = pts2 + jnp.stack([tx, ty])[None]

    if config.rotation:
        n = config.n_angles
        angles = jnp.concatenate(
            [jnp.zeros((1,)), jnp.linspace(-config.max_angle, config.max_angle, n)]
        )                                                      # (n+1,), 0 first
        center = jnp.mean(pts2, axis=0, keepdims=True)
        cos, sin = jnp.cos(angles), jnp.sin(angles)
        # row-vector convention: p' = p @ [[cos, -sin], [sin, cos]]
        rot = jnp.stack(
            [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], axis=-2
        )                                                      # (n+1, 2, 2)
        rotated = jnp.einsum("pj,ajk->apk", pts2 - center, rot) + center
        if config.allow_artifacts:
            valid = jnp.arange(n + 1) < n
        else:
            valid = jnp.all((rotated >= 0.0) & (rotated < 1.0), axis=(1, 2))
        pts2 = rotated[_choose_uniform_valid(k_rot_pick, valid)]

    wh = jnp.array([shape[1], shape[0]], jnp.float32)
    pts1 = pts1 * wh
    pts2 = pts2 * wh

    # DLT: solve the 8x8 system mapping pts1 -> pts2 (homographies.py:181-192)
    px, py = pts1[:, 0], pts1[:, 1]
    qx, qy = pts2[:, 0], pts2[:, 1]
    zeros = jnp.zeros((4,))
    ones = jnp.ones((4,))
    ax_rows = jnp.stack([px, py, ones, zeros, zeros, zeros, -px * qx, -py * qx], -1)
    ay_rows = jnp.stack([zeros, zeros, zeros, px, py, ones, -px * qy, -py * qy], -1)
    a_mat = jnp.concatenate([ax_rows[:, None], ay_rows[:, None]], axis=1).reshape(8, 8)
    b_vec = jnp.stack([qx, qy], axis=-1).reshape(8)
    return jnp.linalg.solve(a_mat, b_vec)


def sample_homography_batch(key, batch, shape, config=HomographyConfig()):
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: sample_homography(k, shape, config))(keys)


# ---------------------------------------------------------------------------
# Valid masks + erosion (homographies.py:239-247, 327-346)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def ellipse_kernel(radius: int) -> np.ndarray:
    """OpenCV-identical ``getStructuringElement(MORPH_ELLIPSE, (2r, 2r))``.

    Reproduces OpenCV's rasterization: per row ``i``, fill columns
    ``[c-dx, c+dx]`` where ``dx = round(c·sqrt(r²-dy²)/r)`` (ties to even).
    """
    ksize = 2 * radius
    r = c = ksize // 2
    kernel = np.zeros((ksize, ksize), np.float32)
    inv_r2 = 1.0 / (r * r) if r else 0.0
    for i in range(ksize):
        dy = i - r
        if abs(dy) <= r:
            # round half to even == C++ cvRound
            dx = int(np.round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, ksize)
            kernel[i, j1:j2] = 1.0
    return kernel


def erode(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary erosion with the OpenCV ellipse element, zero border.

    On-device equivalent of `erode` (`homographies.py:239-247`): anchor at
    ``(r, r)`` of a ``2r x 2r`` kernel, ``BORDER_CONSTANT`` value 0.  Exact
    for {0,1} masks.  ``mask``: ``(H, W)`` or ``(B, H, W)``.
    """
    if radius <= 0:
        return mask
    np_kernel = ellipse_kernel(radius)
    ksum = float(np_kernel.sum())       # host-side: stays concrete under trace
    kernel = jnp.asarray(np_kernel)
    squeeze = mask.ndim == 2
    x = mask[None] if squeeze else mask
    x4 = x[..., None].astype(jnp.float32)                     # (B, H, W, 1)
    hits = jax.lax.conv_general_dilated(
        x4,
        kernel[..., None, None],                              # (kh, kw, 1, 1)
        window_strides=(1, 1),
        padding=((radius, radius - 1), (radius, radius - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]
    out = (hits > ksum - 0.5).astype(mask.dtype)
    return out[0] if squeeze else out


def compute_valid_mask(
    shape: Tuple[int, int], h_flat: jnp.ndarray, erosion_radius: int = 0
) -> jnp.ndarray:
    """Mask of valid (non-border-artifact) pixels after warping by ``h_flat``.

    Equivalent of `compute_valid_mask` (`homographies.py:327-346`); returns
    ``(H, W)`` float32 in {0, 1}.
    """
    ones = jnp.ones(shape + (1,), jnp.float32)
    mask = warp_image(ones, h_flat, mode="nearest")[..., 0]
    return erode(mask, erosion_radius)


# ---------------------------------------------------------------------------
# Homographic augmentation (homographies.py:223-236), on-device & batched
# ---------------------------------------------------------------------------

def homographic_augmentation(
    key: jax.Array,
    image: jnp.ndarray,
    points: jnp.ndarray,
    points_valid: jnp.ndarray,
    config: HomographyConfig = HomographyConfig(),
):
    """Warp one image + its point set by a random homography.

    Args:
      image: ``(H, W, C)`` float.
      points: ``(P, 2)`` ``(y, x)`` padded point set; ``points_valid``: ``(P,)``.

    Returns ``(warped_image, warped_points, warped_valid, valid_mask, h_flat)``
    where ``valid_mask`` is the eroded ``(H, W)`` border-artifact mask.
    """
    h, w = image.shape[:2]
    h_flat = sample_homography(key, (h, w), config)
    warped_image = warp_image(image, h_flat, mode="bilinear")
    valid_mask = compute_valid_mask((h, w), h_flat, config.valid_border_margin)
    warped_points = warp_points(points, h_flat)
    warped_valid = points_valid & points_in_image_mask(warped_points, (h, w))
    return warped_image, warped_points, warped_valid, valid_mask, h_flat


def homographic_augmentation_batch(key, images, points, points_valid, config=HomographyConfig()):
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(homographic_augmentation, in_axes=(0, 0, 0, 0, None))(
        keys, images, points, points_valid, config
    )
