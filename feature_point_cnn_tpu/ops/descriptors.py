"""Descriptor sampling at keypoint locations.

Replaces `get_descriptors` (`/root/reference/python/src/netutils.py:103-121`):
the reference normalizes coordinates and calls `torch.grid_sample`
(align_corners=True) then L2-normalizes on the host.  Here the bilinear
interpolation is a fixed-shape on-device gather over the ``(B, K)`` keypoint
arrays, fused into the same XLA program as the decode.

`grid_sample(align_corners=True)` with the reference's normalization
``g = p / (size/2) - 1`` reduces to sampling the ``(Hc, Wc)`` descriptor map
at ``(y/H·(Hc-1), x/W·(Wc-1))`` — implemented directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.ops.detection import Keypoints


def sample_descriptors(
    desc_map: jnp.ndarray, kp: Keypoints, img_h: int, img_w: int
) -> jnp.ndarray:
    """Bilinearly sample + L2-normalize descriptors at keypoints.

    Args:
      desc_map: ``(B, Hc, Wc, D)`` descriptor map (1/cell resolution).
      kp: fixed-K keypoints in full-resolution pixel coords.

    Returns ``(B, K, D)`` unit descriptors (zeros for invalid slots).
    """
    b, hc, wc, d = desc_map.shape
    # sample positions (see module docstring): p_cell = p_img / img * (cells-1)
    sy = kp.y / img_h * (hc - 1)
    sx = kp.x / img_w * (wc - 1)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, hc - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, wc - 1)
    y1i = jnp.clip(y0i + 1, 0, hc - 1)
    x1i = jnp.clip(x0i + 1, 0, wc - 1)

    # ONE row gather for all four bilinear taps (flat cell indices,
    # concatenated) instead of four separate gathers — identical taps and
    # arithmetic, but a single gather op amortizes the TPU gather overhead
    flat = jnp.stack(
        [
            y0i * wc + x0i, y0i * wc + x1i,
            y1i * wc + x0i, y1i * wc + x1i,
        ],
        axis=1,
    )                                                         # (B, 4, K)
    dmap_flat = desc_map.reshape(b, hc * wc, d)
    taps = jax.vmap(lambda m, i: m[i])(
        dmap_flat, flat.reshape(b, -1)
    ).reshape(b, 4, -1, d)                                    # (B, 4, K, D)
    top = taps[:, 0] * (1 - wx) + taps[:, 1] * wx
    bot = taps[:, 2] * (1 - wx) + taps[:, 3] * wx
    desc = top * (1 - wy) + bot * wy                          # (B, K, D)

    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return jnp.where(kp.valid[..., None], desc, 0.0)
