"""Training losses: detector position loss + hinge descriptor loss.

Re-design of `/root/reference/python/src/losses.py` with two deliberate
fixes (documented deviations — the reference versions are defective):

* `masked_distance_loss` (`losses.py:40-63`) measures the squared cell-grid
  distance between the **hard argmax** of the prediction and the target — a
  piecewise-constant function with zero gradient for every in-cell target
  (only dustbin targets contribute gradient through their CE term).  Here the
  predicted position is the **soft-argmax** (probability-weighted expected
  cell position), which preserves the distance-loss idea and is
  differentiable.  The hard variant is available for eval parity.
* The reference's `torch.where(target >= 64., classification_losses, losses)`
  broadcasts a ``(B,1,Hc,Wc)`` tensor against ``(B,Hc,Wc)`` producing a
  ``(B,B,Hc,Wc)`` cross-batch mixture (`losses.py:53-56`).  Here the select
  is elementwise per sample, the evident intent.

The descriptor hinge loss (`losses.py:194-276`) is reproduced exactly, but
the ``B x Hc x Wc x Hc x Wc`` all-pairs dot-product — materialized in the
reference by broadcast-multiply-reduce over a 6-D tensor, its memory hot
spot (SURVEY.md §3.1) — is computed as a ``(B, N, N)`` batched GEMM on the
MXU in float32.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.geometry.homography import warp_points


def _masked_mean(losses: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(losses)
    mask = mask.astype(losses.dtype)
    return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def detector_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray],
    cell: int,
    kind: str = "ce",
    hard_assignment: bool = False,
) -> jnp.ndarray:
    """Detector head loss.

    Args:
      logits: ``(B, Hc, Wc, 65)`` float.
      targets: ``(B, Hc, Wc)`` int labels in ``[0, 64]``.
      valid_mask: optional ``(B, Hc, Wc)`` in {0,1} (per-cell valid map).
      kind: ``"distance"`` (reference deviation, see module doc) or ``"ce"``
        (vanilla SuperPoint cross-entropy, `losses.py:30-37`).
      hard_assignment: use the reference's non-differentiable argmax position
        (for eval-metric parity only).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if kind == "ce":
        return _masked_mean(ce, valid_mask)

    import warnings

    warnings.warn(
        "detector_loss kind='distance' constrains only the soft-argmax "
        "position; cell confidences collapse below the fixed 0.015 "
        "operating threshold after convergence (see RESULTS.md). "
        "Prefer kind='ce'.",
        stacklevel=2,
    )

    probs = jax.nn.softmax(logits, axis=-1)
    idx = jnp.arange(logits.shape[-1], dtype=jnp.float32)
    h_of = jnp.floor(idx / cell)           # dustbin (64) -> (8, 0), as reference
    w_of = idx - h_of * cell
    if hard_assignment:
        pred = jnp.argmax(probs, axis=-1)
        h_pred = jnp.floor(pred.astype(jnp.float32) / cell)
        w_pred = pred.astype(jnp.float32) - h_pred * cell
    else:
        h_pred = jnp.einsum("...c,c->...", probs, h_of)
        w_pred = jnp.einsum("...c,c->...", probs, w_of)

    t = targets.astype(jnp.float32)
    h_t = jnp.floor(t / cell)
    w_t = t - h_t * cell
    dist = ((h_t - h_pred) ** 2 + (w_t - w_pred) ** 2) / float(cell * cell)
    losses = jnp.where(targets >= cell * cell, ce, dist)
    return _masked_mean(losses, valid_mask)


def _l2_normalize(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """torch F.normalize semantics, differentiably safe at zero.

    ``x / max(||x||, eps)`` matches torch in value, but ``||x||``'s JAX
    gradient at an exactly-zero row is NaN (0/0 through sqrt), and relu'd
    dot-product rows ARE exactly zero early in descriptor training — every
    joint-phase gradient was NaN before this form.  The smooth
    ``x * rsqrt(sum x^2 + eps^2)`` is identical to torch to ~1e-10 relative
    for healthy rows and has bounded gradients at zero.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sq + 1e-12)


def descriptor_loss(
    desc: jnp.ndarray,
    warped_desc: jnp.ndarray,
    homographies: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray],
    config: SuperPointConfig,
) -> jnp.ndarray:
    """Hinge descriptor loss over all cell pairs (`losses.py:194-276`).

    Args:
      desc / warped_desc: ``(B, Hc, Wc, D)`` raw (unnormalized) descriptors.
      homographies: ``(B, 8)`` flat homographies of the warped view.
      valid_mask: optional ``(B, Hc, Wc)`` per-cell mask of the warped view.
    """
    b, hc, wc, dd = desc.shape
    n = hc * wc
    cell = config.cell

    d = _l2_normalize(desc.reshape(b, n, dd).astype(jnp.float32), axis=-1)
    wd = _l2_normalize(warped_desc.reshape(b, n, dd).astype(jnp.float32), axis=-1)

    # correspondence geometry: cell-center i warped into the warped frame
    # lands within (cell - 0.5) px of cell-center j (losses.py:242-264)
    ys, xs = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    centers = (
        jnp.stack([ys, xs], axis=-1).reshape(n, 2).astype(jnp.float32) * cell
        + cell // 2
    )
    warped_centers = warp_points(centers, homographies)        # (B, N, 2)

    if valid_mask is None:
        mask = jnp.ones((b, n), jnp.float32)
    else:
        mask = valid_mask.reshape(b, n).astype(jnp.float32)
    normalization = jnp.maximum(jnp.sum(mask) * float(n), 1.0)

    use_pallas = config.use_pallas_desc_loss
    if use_pallas == "on" or (
        use_pallas == "auto" and jax.default_backend() == "tpu"
    ):
        # blockwise Pallas kernel: never materializes the (B, N, N) tensors
        # (custom VJP; see ops/pallas/descriptor_loss.py)
        from feature_point_cnn_tpu.ops.pallas.descriptor_loss import (
            hinge_descriptor_loss_pallas,
        )

        raw = hinge_descriptor_loss_pallas(
            d, wd, warped_centers, centers, mask,
            config.lambda_d, config.positive_margin, config.negative_margin,
            cell,
        )
        return raw / normalization

    # XLA reference path (and the oracle the kernel is tested against):
    # dot[b, i, j]: descriptor at cell i (original) vs cell j (warped) — GEMM
    dot = jnp.einsum("bid,bjd->bij", d, wd, preferred_element_type=jnp.float32)
    dot = jax.nn.relu(dot)
    # reference double-normalization (losses.py:226-231): over warped cells,
    # then over original cells
    dot = _l2_normalize(dot, axis=2)
    dot = _l2_normalize(dot, axis=1)

    positive = jnp.maximum(0.0, config.positive_margin - dot)
    negative = jnp.maximum(0.0, dot - config.negative_margin)

    diff = warped_centers[:, :, None, :] - centers[None, None, :, :]
    cell_dist = jnp.linalg.norm(diff, axis=-1)                 # (B, N, N)
    s = (cell_dist < (cell - 0.5)).astype(jnp.float32)

    loss = config.lambda_d * s * positive + (1.0 - s) * negative
    return jnp.sum(loss * mask[:, None, :]) / normalization


def descriptor_hinge_hn_loss(
    desc: jnp.ndarray,
    warped_desc: jnp.ndarray,
    homographies: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray],
    config: SuperPointConfig,
) -> jnp.ndarray:
    """Hard-negative-mined hinge descriptor loss (round-4 quality push).

    Two deliberate changes vs `descriptor_loss` (the reference formulation,
    `losses.py:194-276`), both aimed at held-out match PRECISION — the
    weakest model axis (VERDICT r3):

    * the hinge acts on PLAIN cosine similarities of the unit descriptors
      (vanilla SuperPoint, arXiv:1712.07629 eq. 4) instead of the
      reference's relu + per-row/column re-normalized dot matrix, which
      rescales similarities relative to each row's competitors and makes
      the fixed margins mean different things per cell;
    * negatives are MINED: per original cell only the ``desc_hn_topk``
      hardest non-corresponding warped cells (highest similarity)
      contribute, instead of averaging ~N easy negatives whose hinge is
      already zero — the classic hardest-in-batch contrastive recipe
      (HardNet, arXiv:1705.10872).  Mining is symmetric (per warped cell
      over original cells too), like mutual-NN matching at serving time.

    Positive and mined-negative terms are each averaged over their own
    pair counts, so their gradients are balanced without the reference's
    ``lambda_d=250`` rebalancing; ``config.lambda_hn`` scales the whole
    descriptor term against the detector CE terms.

    Memory note: mining needs the full similarity matrix, so this loss
    materializes (B, N, N) f32 tensors in HBM (~184 MB at 240x320 b32) —
    the blockwise Pallas kernel (``use_pallas_desc_loss``) applies only to
    the reference hinge; use ``--microbatch-steps`` if batch/resolution
    scaling hits HBM limits here.
    """
    b, hc, wc, dd = desc.shape
    n = hc * wc
    cell = config.cell
    k = min(config.desc_hn_topk, n - 1)

    d = _l2_normalize(desc.reshape(b, n, dd).astype(jnp.float32), axis=-1)
    wd = _l2_normalize(warped_desc.reshape(b, n, dd).astype(jnp.float32), axis=-1)
    dot = jnp.einsum("bid,bjd->bij", d, wd, preferred_element_type=jnp.float32)

    ys, xs = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    centers = (
        jnp.stack([ys, xs], axis=-1).reshape(n, 2).astype(jnp.float32) * cell
        + cell // 2
    )
    warped_centers = warp_points(centers, homographies)        # (B, N, 2)
    # squared-distance GEMM expansion |wc|^2 + |c|^2 - 2 wc.c: one (B,N,N)
    # f32 tensor instead of the (B,N,N,2) broadcast difference (the
    # correspondence test is a threshold, exact values don't matter)
    sq = (
        jnp.sum(warped_centers**2, -1)[:, :, None]
        + jnp.sum(centers**2, -1)[None, None, :]
        - 2.0 * jnp.einsum("bik,jk->bij", warped_centers, centers)
    )
    s = (sq < (cell - 0.5) ** 2).astype(jnp.float32)           # (B, N, N)

    if valid_mask is None:
        mask = jnp.ones((b, n), jnp.float32)
    else:
        mask = valid_mask.reshape(b, n).astype(jnp.float32)
    pair_ok = s * mask[:, None, :]                             # (B, N, N)

    pos = jnp.maximum(0.0, config.positive_margin - dot)
    pos_term = jnp.sum(pos * pair_ok) / jnp.maximum(jnp.sum(pair_ok), 1.0)

    neg = jnp.maximum(0.0, dot - config.negative_margin)
    # exclude correspondences and masked warped cells from the mining pool
    neg = jnp.where((s > 0.0) | (mask[:, None, :] == 0.0), -jnp.inf, neg)
    hard_ij = jax.lax.top_k(neg, k)[0]                         # (B, N, k)
    hard_ji = jax.lax.top_k(neg.transpose(0, 2, 1), k)[0]      # (B, N, k)
    hard = jnp.concatenate([hard_ij, hard_ji], axis=-1)
    # -inf marks slots whose mining pool was exhausted (masked cells,
    # correspondences): exclude them from the DENOMINATOR too, or heavily
    # masked samples train with a diluted negative gradient
    finite = jnp.isfinite(hard)
    neg_term = jnp.sum(jnp.where(finite, hard, 0.0)) / jnp.maximum(
        jnp.sum(finite.astype(jnp.float32)), 1.0
    )

    return config.lambda_hn * (pos_term + neg_term)


def descriptor_mse_loss(
    desc: jnp.ndarray,
    warped_desc: jnp.ndarray,
    homographies: jnp.ndarray,
    config: SuperPointConfig,
) -> jnp.ndarray:
    """Alternative correspondence-MSE descriptor loss.

    The reference ships this as `descriptor_distance_loss`
    (`losses.py:137-192`, present but commented out of `GlobalLoss`): for
    each cell, find its warped counterpart cell via the homography and
    penalize the squared descriptor difference; out-of-image
    correspondences are excluded from the mean.
    """
    b, hc, wc, dd = desc.shape
    cell = config.cell
    ys, xs = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    centers = (
        jnp.stack([ys, xs], -1).reshape(-1, 2).astype(jnp.float32) * cell
        + cell // 2
    )                                                          # (N, 2) (y, x)
    warped_centers = warp_points(centers, homographies)        # (B, N, 2)

    limit = jnp.asarray([hc * cell, wc * cell], jnp.float32) - 1.0
    inlier = jnp.all(
        (warped_centers >= 0.0) & (warped_centers <= limit), axis=-1
    )                                                          # (B, N)
    cell_idx = jnp.clip(
        ((warped_centers - cell // 2) / cell).astype(jnp.int32),
        0,
        jnp.asarray([hc - 1, wc - 1]),
    )
    flat_idx = cell_idx[..., 0] * wc + cell_idx[..., 1]        # (B, N)

    d = desc.reshape(b, -1, dd).astype(jnp.float32)
    wd = warped_desc.reshape(b, -1, dd).astype(jnp.float32)
    wd_at = jnp.take_along_axis(wd, flat_idx[..., None], axis=1)
    sq = jnp.sum((d - wd_at) ** 2, axis=-1) * inlier
    denom = jnp.maximum(jnp.sum(inlier) * dd, 1.0)
    return jnp.sum(sq) / denom


def global_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    warped_logits: jnp.ndarray,
    warped_targets: jnp.ndarray,
    desc: jnp.ndarray,
    warped_desc: jnp.ndarray,
    homographies: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray],
    config: SuperPointConfig,
) -> Dict[str, jnp.ndarray]:
    """Joint SuperPoint loss (`losses.py:90-118`): detector on the normal view
    (unmasked), detector on the warped view (masked), descriptor hinge."""
    det = detector_loss(logits, targets, None, config.cell, config.detector_loss)
    warped_det = detector_loss(
        warped_logits, warped_targets, valid_mask, config.cell, config.detector_loss
    )
    if config.descriptor_loss == "mse":
        desc_l = descriptor_mse_loss(desc, warped_desc, homographies, config)
    elif config.descriptor_loss == "hinge_hn":
        desc_l = descriptor_hinge_hn_loss(
            desc, warped_desc, homographies, valid_mask, config
        )
    else:
        desc_l = descriptor_loss(desc, warped_desc, homographies, valid_mask, config)
    return {
        "detector": det,
        "warped_detector": warped_det,
        "descriptor": desc_l,
        "total": det + warped_det + desc_l,
    }
