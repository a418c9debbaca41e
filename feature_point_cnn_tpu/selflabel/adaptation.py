"""Homography adaptation — robust self-labeling by aggregating detections
over random warps.

TPU-native re-design of `homography_adaptation`
(`/root/reference/python/src/homographies.py:250-324`): the reference runs a
sequential Python loop of 15 iterations, each with a host DLT solve, a
torchvision warp, an OpenCV erosion (device->host->device) and a separate
net forward.  Here the whole procedure is ONE jitted program:

* all ``num`` homographies are sampled with `vmap`;
* all warped views are stacked into a single ``(num·B)`` forward — the MXU
  sees one large batch instead of 15 small ones;
* masks/erosions/unwarps run on device;
* aggregation (mean or max over warps, low-coverage zeroing) is a reduction
  over the warp axis.

Semantics match the reference: per warp, predictions on the warped image are
masked by the eroded warped-ones mask, projected back with the inverse
homography, weighted by the eroded inverse-coverage ``count``; aggregated
probabilities are zeroed where fewer than ``num // 3`` warps saw the pixel.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.config import HomographyConfig
from feature_point_cnn_tpu.geometry.homography import (
    erode,
    invert_homography,
    sample_homography_batch,
)
from feature_point_cnn_tpu.geometry.warp import warp_image


def _is_per_item_keys(key: jax.Array) -> bool:
    """True when ``key`` is a batch of per-image keys rather than one key
    shared by the whole batch.  Handles both typed PRNG keys (scalar key has
    ``ndim == 0``) and raw ``uint32[2]`` keys (scalar key has ``ndim == 1``)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim >= 1
    return key.ndim >= 2


def homography_adaptation(
    key: jax.Array,
    images: jnp.ndarray,
    prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    config: HomographyConfig = HomographyConfig(),
) -> jnp.ndarray:
    """Aggregate detection probabilities over ``config.num`` random warps.

    Args:
      key: either ONE key (the reference's semantics — every image in the
        batch sees the same ``num`` warps) or a batch of ``B`` per-image
        keys, in which case each image gets its own warp set and the result
        is **independent of batch composition** — the property that makes
        sharded multi-host labeling bit-identical to a single-process run
        (`preprocess_coco.py:41-74` sharding analog).
      images: ``(B, H, W, C)`` float in [0, 1].
      prob_fn: ``(N, H, W, C) -> (N, H, W)`` detection probability map
        (typically ``lambda x: model.apply(vars, x)[0]``).

    Returns ``(B, H, W)`` aggregated probabilities.
    """
    b, h, w, c = images.shape
    n = config.num
    shape = (h, w)
    per_item = _is_per_item_keys(key)

    base_prob = prob_fn(images)                               # (B, H, W)

    ones = jnp.ones(shape + (1,), jnp.float32)

    def masks_for(hs_flat, hs_inv_flat):
        # mask: valid pixels of the warped view; count: unwarp coverage
        m = jax.vmap(lambda hf: warp_image(ones, hf, "nearest"))(hs_flat)[..., 0]
        ct = jax.vmap(lambda hf: warp_image(ones, hf, "nearest"))(hs_inv_flat)[..., 0]
        if config.valid_border_margin:
            m = erode(m, config.valid_border_margin)
            ct = erode(ct, config.valid_border_margin)
        return m, ct

    if per_item:
        # (B, N, 8) -> (N, B, 8): each image b draws its own warp set
        hs = jax.vmap(
            lambda k: sample_homography_batch(k, n, shape, config)
        )(key)
        hs = jnp.swapaxes(hs, 0, 1)
        hs_inv = invert_homography(hs.reshape(n * b, 8)).reshape(n, b, 8)
        mask, count = masks_for(
            hs.reshape(n * b, 8), hs_inv.reshape(n * b, 8)
        )
        mask = mask.reshape(n, b, h, w)
        count = count.reshape(n, b, h, w)
        warped = jax.vmap(
            jax.vmap(lambda im, hf: warp_image(im, hf, "bilinear")),
            in_axes=(None, 0),
        )(images, hs)                                         # (N, B, H, W, C)
    else:
        hs = sample_homography_batch(key, n, shape, config)   # (N, 8)
        hs_inv = invert_homography(hs)
        mask, count = masks_for(hs, hs_inv)                   # (N, H, W)
        mask = mask[:, None]                                  # (N, 1, H, W)
        count = count[:, None]
        warped = jax.vmap(
            lambda hf: jax.vmap(lambda im: warp_image(im, hf, "bilinear"))(images)
        )(hs)                                                 # (N, B, H, W, C)

    # one big forward over every (warp, image) pair
    probs = prob_fn(warped.reshape(n * b, h, w, c)).reshape(n, b, h, w)
    probs = probs * mask

    # project detections back to the original frame
    if per_item:
        proj = jax.vmap(
            jax.vmap(
                lambda p, hf: warp_image(p[..., None], hf, "bilinear")[..., 0]
            )
        )(probs, hs_inv)                                      # (N, B, H, W)
    else:
        proj = jax.vmap(
            lambda p_n, h_n: jax.vmap(
                lambda p: warp_image(p[..., None], h_n, "bilinear")[..., 0]
            )(p_n)
        )(probs, hs_inv)                                      # (N, B, H, W)
    proj = proj * count

    all_probs = jnp.concatenate([base_prob[None], proj], axis=0)   # (N+1, B, H, W)
    all_counts = jnp.concatenate(
        [
            jnp.ones((1, b, h, w)),
            jnp.broadcast_to(count, (n, b, h, w)),
        ],
        axis=0,
    )
    counts_sum = jnp.sum(all_counts, axis=0)

    if config.aggregation == "max":
        prob = jnp.max(all_probs, axis=0)
    elif config.aggregation == "sum":
        prob = jnp.sum(all_probs, axis=0) / jnp.maximum(counts_sum, 1e-6)
    else:
        raise ValueError(f"unknown aggregation {config.aggregation!r}")

    return jnp.where(counts_sum >= config.num // 3, prob, 0.0)
