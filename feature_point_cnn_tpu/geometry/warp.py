"""On-device perspective image warping.

TPU-native replacement for torchvision's `functional_tensor.perspective`
(used by the reference at `/root/reference/python/src/homographies.py:219-220`):
pure-JAX gather-based sampling, fully `vmap`/`jit`-able, so warps run on
device inside the training step and the self-labeling loop instead of on the
host per item.

Conventions (matching the reference / torchvision exactly):

* A flat homography ``h = (h00..h21)`` with ``h22 = 1`` maps **output** (warped)
  pixel coords ``(x, y)`` to **input** coords — the inverse-warp convention of
  ``tf.contrib.image.transform`` (`homographies.py:83-90`).
* Pixel centers sit at half-integer offsets: the source sample position for
  output index ``(xi, yi)`` is ``H·(xi+0.5, yi+0.5) - 0.5``, which reproduces
  torchvision's `align_corners=False` grid construction.
* Out-of-image samples are zero (``padding_mode='zeros'``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_flat_homography(h: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply a flat 8-vector homography to ``(..., 2)`` ``(x, y)`` points."""
    x, y = xy[..., 0], xy[..., 1]
    den = h[6] * x + h[7] * y + 1.0
    xs = (h[0] * x + h[1] * y + h[2]) / den
    ys = (h[3] * x + h[4] * y + h[5]) / den
    return jnp.stack([xs, ys], axis=-1)


def bilinear_sample(image: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image (H, W, C)`` at float ``(..., 2)`` ``(y, x)`` positions.

    Bilinear with zero padding: out-of-bounds corner taps contribute 0.
    Returns ``(..., C)``.
    """
    h, w = image.shape[:2]
    y, x = yx[..., 0], yx[..., 1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    wy = wy[..., None]
    wx = wx[..., None]
    top = tap(y0i, x0i) * (1 - wx) + tap(y0i, x0i + 1) * wx
    bot = tap(y0i + 1, x0i) * (1 - wx) + tap(y0i + 1, x0i + 1) * wx
    return top * (1 - wy) + bot * wy


def nearest_sample(image: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sampling with zero padding (round half to even,
    matching torch grid_sample's nearbyint)."""
    h, w = image.shape[:2]
    yi = jnp.round(yx[..., 0]).astype(jnp.int32)
    xi = jnp.round(yx[..., 1]).astype(jnp.int32)
    inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(inb[..., None], v, 0.0)


def warp_image(
    image: jnp.ndarray, h_flat: jnp.ndarray, mode: str = "bilinear"
) -> jnp.ndarray:
    """Warp ``image (H, W, C)`` by the flat homography (output -> input map).

    Equivalent of `homography_transform` (`homographies.py:219-220`) for a
    single image; `vmap` for batches.
    """
    h, w = image.shape[:2]
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    out_xy = jnp.stack([xx + 0.5, yy + 0.5], axis=-1)       # pixel centers
    src_xy = apply_flat_homography(h_flat, out_xy) - 0.5
    src_yx = src_xy[..., ::-1]
    if mode == "bilinear":
        return bilinear_sample(image, src_yx)
    elif mode == "nearest":
        return nearest_sample(image, src_yx)
    raise ValueError(f"unknown mode {mode!r}")


warp_image_batch = jax.vmap(warp_image, in_axes=(0, 0, None))
