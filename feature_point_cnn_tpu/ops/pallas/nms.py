"""Pallas TPU kernel: exact-greedy grid NMS with the loop held in VMEM.

Kernel twin of `ops/detection.py::grid_nms` (the reformulation of the
reference's `corners_nms`, `/root/reference/python/src/nms.py:4-53`): greedy
NMS as iterated max-pool suppression run to convergence, on the same
strict-total-order key (`detection.nms_priority_key`) as the XLA path so
bit-identical score plateaus resolve deterministically on both.  The XLA path
round-trips the (H, W) map through HBM every suppression round; here one
batch item's full score map is pinned in VMEM (480x640 f32 = 1.2 MB, well
under the ~16 MB budget) and the `lax.while_loop` iterates entirely on-chip
— the map is read from HBM once and the suppressed result written once, no
matter how deep the suppression chains go.

The max-pool over the inf-norm ball of radius ``r`` is separable
(rows then columns); each pass is 2r static shift-and-max slices of a
padded buffer, which Mosaic lowers to sublane/lane shifts.

Runs in interpret mode off-TPU, so the same code path is unit-tested on CPU
against both the XLA implementation and the numpy greedy oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _maxpool2d(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable (2r+1)^2 max over a (H, W) block, -inf padded."""
    h, w = x.shape
    pad_r = jnp.full((radius, w), -jnp.inf, x.dtype)
    xp = jnp.concatenate([pad_r, x, pad_r], axis=0)  # (h + 2r, w)
    m = x
    for d in range(-radius, radius + 1):
        if d:
            m = jnp.maximum(m, jax.lax.slice(xp, (radius + d, 0), (radius + d + h, w)))
    pad_c = jnp.full((h, radius), -jnp.inf, x.dtype)
    mp = jnp.concatenate([pad_c, m, pad_c], axis=1)  # (h, w + 2r)
    out = m
    for d in range(-radius, radius + 1):
        if d:
            out = jnp.maximum(out, jax.lax.slice(mp, (0, radius + d), (h, radius + d + w)))
    return out


def _nms_kernel(scores_ref, out_ref, *, radius: int):
    s = scores_ref[0].astype(jnp.float32)  # (H, W)
    pos = s > 0.0
    zero = jnp.zeros_like(s)

    def covered_by(keep):  # float 0/1 keep mask -> bool "in a kept window"
        return _maxpool2d(keep, radius) > 0.0

    def one_round(keep):
        remaining = jnp.where(covered_by(keep) | ~pos, 0.0, s)
        new_keep = (remaining > 0.0) & (remaining == _maxpool2d(remaining, radius))
        return jnp.maximum(keep, new_keep.astype(jnp.float32))

    cap = s.shape[0] * s.shape[1]

    def cond(carry):
        keep, i = carry
        return jnp.any(pos & ~covered_by(keep)) & (i < cap)

    def body(carry):
        keep, i = carry
        return one_round(keep), i + 1

    keep, _ = jax.lax.while_loop(cond, body, (zero, jnp.int32(0)))
    out_ref[0] = jnp.where(keep > 0.0, s, 0.0)


def grid_nms_pallas(
    scores: jnp.ndarray, dist_thresh: int, interpret: bool | None = None
) -> jnp.ndarray:
    """``(B, H, W)`` thresholded scores -> suppressed scores; exact greedy
    equivalence like `grid_nms(num_iters=0)`.

    Suppression runs on the SAME strict-total-order key as the XLA path
    (`detection.nms_priority_key`: local position priority packed into the
    score's low mantissa byte) — round-4 fix: suppressing on raw scores
    kept every member of a bit-identical plateau, violating the
    ``> dist_thresh`` spacing invariant the block-max top-K reduction
    assumes.  The packing and the score restore are elementwise and fuse
    into the surrounding XLA program; only the convergence loop runs in
    the kernel.
    """
    from feature_point_cnn_tpu.ops.detection import nms_priority_key

    b, h, w = scores.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key = nms_priority_key(scores, dist_thresh)
    kernel = functools.partial(_nms_kernel, radius=int(dist_thresh))
    kept = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        # the convergence loop keeps ~14 map-sized temporaries live (keep
        # mask, pad buffers, two max-pool passes); at 480x640 that is ~18 MB,
        # above the default 16 MB scoped-VMEM cap — raise it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(key)
    return jnp.where(kept > 0.0, scores, 0.0)
