"""Jitted training / evaluation steps.

One XLA program per step, containing everything the reference spreads over
DataLoader workers + autocast + host-side augmentation
(`/root/reference/python/src/basetrainer.py:96-195`,
`coco_dataset.py:27-40`):

* label encoding on device (``make_points_labels_batch``);
* for the SuperPoint phase, homographic augmentation (sampling, image warp,
  valid-mask erosion, point warp) on device per batch;
* the two views are concatenated into ONE forward of ``2B`` images — a TPU
  optimization over the reference's two sequential forwards
  (`superpointtrainer.py:24-25`); BatchNorm train-mode statistics therefore
  pool both views (documented deviation);
* bf16 compute replaces AMP/GradScaler; f32 master params and losses.

States are plain pytrees (`TrainState`), steps are pure functions — `jit`
with donation at the call site.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
from feature_point_cnn_tpu.data.photometric import photometric_augment_batch
from feature_point_cnn_tpu.geometry.homography import homographic_augmentation_batch
from feature_point_cnn_tpu.ops.labels import (
    make_points_labels_batch,
    scale_valid_map,
)
from feature_point_cnn_tpu.train.loss import detector_loss, global_loss
from feature_point_cnn_tpu.utils.metrics import samplewise_f1


def _prep_images(images: jnp.ndarray, config: SuperPointConfig) -> jnp.ndarray:
    """Normalize a batch to ``(B, H, W, image_channels) float32 in [0, 1]``.

    Packed loaders ship raw ``uint8`` (possibly single-channel) batches so
    the host does no float conversion and the relay moves 12x fewer bytes
    (`data/packed.py:read_batch`); the reference does this work per item in
    DataLoader workers (`dataset_utils.py:12-32`).
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if images.shape[-1] == 1 and config.image_channels > 1:
        images = jnp.repeat(images, config.image_channels, axis=-1)
    return images


def _grad_norms(grads) -> Dict[str, jnp.ndarray]:
    """Per-head gradient global norms — the scalar core of the reference's
    per-parameter grad histograms (`basetrainer.py:265-274`)."""
    return {
        f"grad_norm/{k}": optax.global_norm(v) for k, v in grads.items()
    }


def _microbatched_value_and_grad(micro_loss_fn, params, batch_stats, data, k):
    """``lax.scan`` over ``k`` microbatches of ``data`` (leading axis split
    ``B -> (k, B//k)``): per-microbatch ``value_and_grad`` at the SAME params,
    gradients and losses averaged, BatchNorm statistics threaded sequentially
    — exactly the reference's ``batch_size_divider`` accumulation semantics
    (`basetrainer.py:133-166`) but inside one XLA program, with peak
    activation memory of a single microbatch.

    ``micro_loss_fn(params, batch_stats, micro) -> (loss, (new_stats, aux))``.
    Returns ``(mean_loss, final_stats, stacked_aux, mean_grads)``.

    Sharding note: under the data-parallel mesh the batch axis is sharded
    over devices.  The split is STRIDED — microbatch ``i`` takes items
    ``[i, i+k, i+2k, ...]`` via ``(B,) -> (B//k, k) -> swap -> (k, B//k)`` —
    so the sharded leading axis shrinks ``B -> B//k`` in place (still
    divisible across devices) and every microbatch stays evenly sharded.  A
    contiguous ``(k, B//k)`` split would put each microbatch on a SUBSET of
    devices and force GSPMD all-to-alls every scan iteration.
    """
    b = jax.tree_util.tree_leaves(data)[0].shape[0]
    if b % k != 0:
        raise ValueError(
            f"batch size {b} is not divisible by microbatch_steps={k}; "
            f"pick --microbatch-steps dividing --batch-size"
        )
    split = jax.tree_util.tree_map(
        lambda x: x.reshape((x.shape[0] // k, k) + x.shape[1:]).swapaxes(0, 1),
        data,
    )
    grad_fn = jax.value_and_grad(micro_loss_fn, has_aux=True)

    def body(carry, micro):
        stats, gsum, lsum = carry
        (loss, (new_stats, aux)), grads = grad_fn(params, stats, micro)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        return (new_stats, gsum, lsum + loss), aux

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    (stats, gsum, lsum), aux = jax.lax.scan(
        body, (batch_stats, zero, jnp.zeros(())), split
    )
    inv_k = 1.0 / k
    grads = jax.tree_util.tree_map(lambda g: g * inv_k, gsum)
    return lsum * inv_k, stats, aux, grads


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )


def _apply(model, params, batch_stats, images, train, enable_descriptor):
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        images,
        train=train,
        enable_descriptor=enable_descriptor,
        mutable=["batch_stats"] if train else [],
    )
    new_stats = mutated["batch_stats"] if train else batch_stats
    return out, new_stats


# ---------------------------------------------------------------------------
# MagicPoint phase: detector-only on (image, points) batches
# (`magicpointtrainer.py:18-34`)
# ---------------------------------------------------------------------------

def magicpoint_train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    *,
    model,
    tx,
    config: SuperPointConfig,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    images = _prep_images(batch["image"], config)
    b, h, w, _ = images.shape
    key, k_photo = jax.random.split(key)
    if config.photometric_augment:
        images = photometric_augment_batch(k_photo, images)
    labels = make_points_labels_batch(
        batch["points"], batch["points_valid"], key, h, w, config.cell
    )

    def micro_loss(params, stats, micro):
        (_, _, logits), new_stats = _apply(
            model, params, stats, micro["images"], True, False
        )
        loss = detector_loss(
            logits, micro["labels"], None, config.cell, config.detector_loss
        )
        return loss, (new_stats, logits)

    k = config.microbatch_steps
    if k > 1:
        loss, new_stats, logits_k, grads = _microbatched_value_and_grad(
            micro_loss, state.params, state.batch_stats,
            {"images": images, "labels": labels}, k,
        )
        logits = logits_k.reshape((-1,) + logits_k.shape[2:])
    else:
        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            micro_loss, has_aux=True
        )(state.params, state.batch_stats, {"images": images, "labels": labels})
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {
        "loss": loss,
        "detector_loss": loss,
        "f1": samplewise_f1(logits, labels),
        **_grad_norms(grads),
    }
    return (
        TrainState(state.step + 1, params, new_stats, new_opt),
        metrics,
    )


def magicpoint_eval_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    *,
    model,
    config: SuperPointConfig,
) -> Dict[str, jnp.ndarray]:
    images = _prep_images(batch["image"], config)
    b, h, w, _ = images.shape
    labels = make_points_labels_batch(
        batch["points"], batch["points_valid"], key, h, w, config.cell
    )
    (_, _, logits), _ = _apply(
        model, state.params, state.batch_stats, images, False, False
    )
    loss = detector_loss(logits, labels, None, config.cell, config.detector_loss)
    return {"loss": loss, "f1": samplewise_f1(logits, labels)}


# ---------------------------------------------------------------------------
# SuperPoint phase: joint detector+descriptor on augmented pairs
# (`superpointtrainer.py:22-51`); augmentation on device
# ---------------------------------------------------------------------------

def _augment_and_encode(batch, key, config, homo_config):
    images = _prep_images(batch["image"], config)
    b, h, w, _ = images.shape
    k_aug, k_lab, k_wlab, k_photo = jax.random.split(key, 4)
    if config.photometric_augment:
        # photometric aug before the geometric warp, as the reference applies
        # its transforms at dataset-read time (coco_dataset.py:29)
        images = photometric_augment_batch(k_photo, images)
    warped, wpoints, wvalid, valid_mask, homog = homographic_augmentation_batch(
        k_aug, images, batch["points"], batch["points_valid"], homo_config
    )
    labels = make_points_labels_batch(
        batch["points"], batch["points_valid"], k_lab, h, w, config.cell
    )
    wlabels = make_points_labels_batch(
        wpoints, wvalid, k_wlab, h, w, config.cell
    )
    cell_mask = scale_valid_map(valid_mask, config.cell)       # (B, Hc, Wc)
    return warped, labels, wlabels, cell_mask, homog, images


def superpoint_train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    *,
    model,
    tx,
    config: SuperPointConfig,
    homo_config: HomographyConfig = HomographyConfig(),
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    images = batch["image"]
    warped, labels, wlabels, cell_mask, homog, images = _augment_and_encode(
        batch, key, config, homo_config
    )
    data = {
        "images": images, "warped": warped, "labels": labels,
        "wlabels": wlabels, "cell_mask": cell_mask, "homog": homog,
    }

    def micro_loss(params, stats, m):
        mb = m["images"].shape[0]
        both = jnp.concatenate([m["images"], m["warped"]], axis=0)  # (2b,...)
        (_, desc2, logits2), new_stats = _apply(
            model, params, stats, both, True, True
        )
        losses = global_loss(
            logits2[:mb], m["labels"], logits2[mb:], m["wlabels"],
            desc2[:mb], desc2[mb:], m["homog"], m["cell_mask"], config,
        )
        return losses["total"], (new_stats, (losses, logits2[:mb]))

    k = config.microbatch_steps
    if k > 1:
        loss, new_stats, (losses_k, logits_k), grads = (
            _microbatched_value_and_grad(
                micro_loss, state.params, state.batch_stats, data, k
            )
        )
        losses = jax.tree_util.tree_map(jnp.mean, losses_k)
        logits = logits_k.reshape((-1,) + logits_k.shape[2:])
    else:
        (loss, (new_stats, (losses, logits))), grads = jax.value_and_grad(
            micro_loss, has_aux=True
        )(state.params, state.batch_stats, data)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {
        "loss": loss,
        "detector_loss": losses["detector"] + losses["warped_detector"],
        "descriptor_loss": losses["descriptor"],
        "f1": samplewise_f1(logits, labels),
        **_grad_norms(grads),
    }
    return TrainState(state.step + 1, params, new_stats, new_opt), metrics


def superpoint_eval_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    *,
    model,
    config: SuperPointConfig,
    homo_config: HomographyConfig = HomographyConfig(),
) -> Dict[str, jnp.ndarray]:
    images = batch["image"]
    b = images.shape[0]
    warped, labels, wlabels, cell_mask, homog, images = _augment_and_encode(
        batch, key, config, homo_config
    )
    both = jnp.concatenate([images, warped], axis=0)
    (_, desc2, logits2), _ = _apply(
        model, state.params, state.batch_stats, both, False, True
    )
    losses = global_loss(
        logits2[:b], labels, logits2[b:], wlabels, desc2[:b], desc2[b:],
        homog, cell_mask, config,
    )
    return {
        "loss": losses["total"],
        "descriptor_loss": losses["descriptor"],
        "f1": samplewise_f1(logits2[:b], labels),
    }
