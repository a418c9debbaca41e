"""Optimizer: AdamW with the reference's weight-decay exemptions + freezing.

Replicates `create_optimizer` (`/root/reference/python/src/basetrainer.py:
197-216`): AdamW(lr 1e-3, betas (0.9, 0.999), eps 1e-8, wd 0.01) with decay
excluded for parameters whose path contains ``bn``, ``bias``, or
``identity`` (our module naming preserves those tokens).  Gradient
accumulation (`batch_size_divider`, `basetrainer.py:133-166`) becomes
`optax.MultiSteps`; the MagicPoint-phase descriptor freeze
(`superpoint.py:74-78`) becomes an `optax.multi_transform` that zeroes
updates for the ``descriptor`` subtree.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax

from feature_point_cnn_tpu.config import SuperPointConfig


def _path_tokens(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path).lower()


def decay_mask(params: Any) -> Any:
    """True where weight decay applies (the reference's `include` rule)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not any(
            t in _path_tokens(path) for t in ("bn", "bias", "identity")
        ),
        params,
    )


def make_schedule(config: SuperPointConfig, total_steps: Optional[int] = None):
    """LR schedule.  The reference's scheduler is dead code
    (`basetrainer.py:217-220`) and it trains at constant 1e-3; round-1
    training at constant LR showed a transient F1 collapse (RESULTS.md), so
    the default is linear warmup + cosine decay to
    ``lr_final_ratio * learning_rate`` over ``total_steps``."""
    if config.lr_schedule == "constant" or not total_steps:
        return config.learning_rate
    if config.lr_schedule != "warmup_cosine":
        raise ValueError(f"unknown lr_schedule {config.lr_schedule!r}")
    warmup = min(config.warmup_steps, max(total_steps // 10, 1))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=config.learning_rate,
        warmup_steps=warmup,
        decay_steps=total_steps,
        end_value=config.learning_rate * config.lr_final_ratio,
    )


def make_optimizer(
    config: SuperPointConfig,
    params: Any,
    frozen_subtree: Optional[str] = None,
    total_steps: Optional[int] = None,
) -> optax.GradientTransformation:
    """AdamW with decay mask; optionally freezes a top-level subtree
    (e.g. ``"descriptor"`` during the MagicPoint phase) and wraps in
    MultiSteps when ``grad_accum_steps > 1``."""
    tx = optax.adamw(
        learning_rate=make_schedule(config, total_steps),
        b1=config.adam_beta1,
        b2=config.adam_beta2,
        eps=config.adam_eps,
        weight_decay=config.weight_decay,
        mask=decay_mask,
    )
    if config.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.grad_clip_norm), tx)
    # Skip steps whose gradients contain inf/NaN — the protection the
    # reference gets implicitly from GradScaler.step (`basetrainer.py:154-158`
    # skips unscaled-inf steps); without it bf16 joint training can diverge
    # within tens of steps.  The error budget is effectively infinite:
    # apply_if_finite APPLIES the poisoned update once the budget is
    # exhausted, which must never happen (GradScaler never does).
    tx = optax.apply_if_finite(tx, max_consecutive_errors=10**9)
    if frozen_subtree is not None:
        labels = {
            k: ("frozen" if k == frozen_subtree else "trained") for k in params
        }
        tx = optax.multi_transform(
            {"trained": tx, "frozen": optax.set_to_zero()}, labels
        )
    if config.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum_steps)
    return tx
