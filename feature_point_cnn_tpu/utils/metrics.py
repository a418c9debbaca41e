"""On-device evaluation metrics.

The reference computes test F1 with
``torchmetrics.F1(num_classes=65, mdmc_average='samplewise')`` on the CPU
(`/root/reference/python/src/basetrainer.py:51,184`).  For single-label
multiclass data, micro-averaged F1 per sample equals per-sample accuracy, so
samplewise F1 == mean over samples of prediction accuracy — computed here on
device, no transfer.
"""

from __future__ import annotations

import jax.numpy as jnp


def samplewise_f1(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """``logits (B, ..., C)``, ``targets (B, ...)`` int -> scalar F1.

    Micro F1 per sample (== accuracy for single-label multiclass), averaged
    over the batch — torchmetrics ``mdmc_average='samplewise'`` semantics.
    """
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == targets).astype(jnp.float32)
    per_sample = jnp.mean(correct.reshape(correct.shape[0], -1), axis=-1)
    return jnp.mean(per_sample)
