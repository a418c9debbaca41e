"""Pallas TPU kernel: fused keypoint-probability decode.

Fuses the decode chain ``cell softmax -> dustbin drop -> depth-to-space ->
confidence threshold`` (`/root/reference/python/src/superpoint.py:111-115` +
`netutils.py:64-75` + the threshold from `netutils.py:78-79`) into one VMEM
pass: the (Hc·Wc, 65) logits never materialize their softmax in HBM and the
full-resolution map is written exactly once, already thresholded for NMS.

Layout trick: instead of a 4-D depth-to-space transpose (Mosaic-hostile),
the grid walks (batch, cell-row); each step reads one ``(Wc, 65)`` logit row
and emits its ``(cell, W)`` output rows by slicing the in-cell axis per
``dy`` and collapsing ``(Wc, cell) -> (W,)`` — minor-dim reshapes only.

The kernel runs in interpret mode off-TPU, so the same code path is
unit-tested on CPU against the XLA reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(logits_ref, out_ref, *, cell: int, threshold: float):
    # logits_ref: (1, 1, Wc, 65); out_ref: (1, 1, cell, Wc, cell)
    logits = logits_ref[0, 0].astype(jnp.float32)              # (Wc, 65)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    # reference epsilon semantics (superpoint.py:112), shifted stably
    denom = jnp.sum(e, axis=-1, keepdims=True) + 1e-5 * jnp.exp(-m)
    probs = e / denom                                          # (Wc, 65)
    for dy in range(cell):
        row = probs[:, dy * cell : (dy + 1) * cell]            # (Wc, cell)
        out_ref[0, 0, dy] = jnp.where(row >= threshold, row, 0.0)


def decode_threshold_pallas(
    logits: jnp.ndarray,
    cell: int,
    threshold: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``(B, Hc, Wc, 65) logits -> (B, H, W)`` thresholded probability map.

    Equals ``where(p >= t, p, 0)`` of `decode_prob_map` exactly.
    """
    b, hc, wc, ch = logits.shape
    assert ch == cell * cell + 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_decode_kernel, cell=cell, threshold=threshold)
    # 5-D kernel output (B, Hc, cell, Wc, cell): avoids in-kernel lane
    # relayouts; the final merge of adjacent dims is a free XLA reshape.
    out5 = pl.pallas_call(
        kernel,
        grid=(b, hc),
        in_specs=[
            pl.BlockSpec(
                (1, 1, wc, ch),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cell, wc, cell),
            lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hc, cell, wc, cell), jnp.float32),
        interpret=interpret,
    )(logits)
    return out5.reshape(b, hc * cell, wc * cell)
