"""65-way cell label codec — the encoding every layer of the pipeline speaks.

Keypoints are encoded as per-cell 65-class labels over ``cell x cell`` blocks
(64 in-cell positions + 1 dustbin), and decoded back to a full-resolution
probability map by depth-to-space.  Semantics match the reference codec
(`/root/reference/python/src/netutils.py:31-75`), re-designed for TPU:

* everything is pure JAX, fixed-shape, `vmap`-able, and runs **on device**
  (the reference computes labels per-item in CPU DataLoader workers,
  `coco_dataset.py:35-37`);
* ragged point lists are replaced by fixed-size ``(P, 2)`` arrays with a
  validity mask;
* RNG is explicit (`jax.random` keys) instead of global numpy state.

Conventions: points are ``(y, x)`` row/col float pixel coordinates (same as
the reference's in-memory convention after `dataset_utils.py:40`).  Within a
cell, class index = ``dy * cell + dx`` (row-major), class 64 = dustbin.
Arrays are channel-last (NHWC) throughout — the TPU-native layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, cell: int) -> jnp.ndarray:
    """``(..., H, W) -> (..., H/cell, W/cell, cell*cell)``, row-major in-cell."""
    *lead, h, w = x.shape
    hc, wc = h // cell, w // cell
    x = x.reshape(*lead, hc, cell, wc, cell)
    x = jnp.moveaxis(x, -3, -2)           # (..., hc, wc, cell, cell)
    return x.reshape(*lead, hc, wc, cell * cell)


def depth_to_space(x: jnp.ndarray, cell: int) -> jnp.ndarray:
    """``(..., Hc, Wc, cell*cell) -> (..., Hc*cell, Wc*cell)``; inverse of
    :func:`space_to_depth`."""
    *lead, hc, wc, cc = x.shape
    assert cc == cell * cell
    x = x.reshape(*lead, hc, wc, cell, cell)
    x = jnp.moveaxis(x, -2, -3)           # (..., hc, cell, wc, cell)
    return x.reshape(*lead, hc * cell, wc * cell)


def make_points_labels(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    img_h: int,
    img_w: int,
    cell: int,
) -> jnp.ndarray:
    """Encode a fixed-size point set into per-cell 65-class labels.

    Mirrors `netutils.py:31-53`: paint score 2 at point pixels, space-to-depth,
    pad a dustbin plane of score 1, and argmax with a small uniform noise to
    randomly break ties when a cell holds several points.

    Args:
      points: ``(P, 2)`` float ``(y, x)`` coordinates (padded).
      valid:  ``(P,)`` bool mask — padded / out-of-image entries are dropped.
      key:    PRNG key for the tie-break noise.
      img_h, img_w, cell: geometry.

    Returns: ``(img_h/cell, img_w/cell)`` int32 labels in ``[0, 64]``.
    """
    ys = points[:, 0].astype(jnp.int32)
    xs = points[:, 1].astype(jnp.int32)
    in_bounds = (ys >= 0) & (ys < img_h) & (xs >= 0) & (xs < img_w)
    keep = valid & in_bounds
    # Route invalid entries out of range; scatter mode="drop" discards them.
    ys = jnp.where(keep, ys, img_h)
    xs = jnp.where(keep, xs, img_w)

    point_map = jnp.zeros((img_h, img_w), jnp.float32)
    point_map = point_map.at[ys, xs].set(2.0, mode="drop")

    cells = space_to_depth(point_map, cell)                     # (Hc, Wc, c*c)
    dustbin = jnp.ones(cells.shape[:-1] + (1,), jnp.float32)    # score 1 > noise
    cells = jnp.concatenate([cells, dustbin], axis=-1)          # (Hc, Wc, 65)
    noise = jax.random.uniform(key, cells.shape, jnp.float32, 0.0, 0.1)
    return jnp.argmax(cells + noise, axis=-1).astype(jnp.int32)


def make_points_labels_batch(points, valid, key, img_h, img_w, cell):
    """Batched :func:`make_points_labels` over a leading batch axis."""
    keys = jax.random.split(key, points.shape[0])
    return jax.vmap(make_points_labels, in_axes=(0, 0, 0, None, None, None))(
        points, valid, keys, img_h, img_w, cell
    )


def restore_prob_map(prob: jnp.ndarray, cell: int) -> jnp.ndarray:
    """Decode cell probabilities to a full-resolution map.

    ``(B, Hc, Wc, 65) -> (B, H, W)``: drop the dustbin channel, depth-to-space.
    Mirrors `netutils.py:64-75` (the reference is NCHW; this is NHWC).
    """
    return depth_to_space(prob[..., :-1], cell)


def make_prob_map_from_labels(labels: jnp.ndarray, cell: int) -> jnp.ndarray:
    """One-hot decode: labels ``(B, Hc, Wc)`` -> prob map ``(B, H, W)`` with 1.0
    at encoded point pixels.  Mirrors `netutils.py:21-28`."""
    one_hot = jax.nn.one_hot(labels, cell * cell + 1, dtype=jnp.float32)
    return restore_prob_map(one_hot, cell)


def scale_valid_map(mask: jnp.ndarray, cell: int) -> jnp.ndarray:
    """Full-resolution mask ``(..., H, W)`` -> per-cell binary mask
    ``(..., Hc, Wc)``: a cell is valid if any of its pixels is valid.
    Mirrors `netutils.py:6-18`."""
    cells = space_to_depth(mask.astype(jnp.float32), cell)
    return (jnp.sum(cells, axis=-1) > 0.0).astype(jnp.float32)
