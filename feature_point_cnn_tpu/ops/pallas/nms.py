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
(rows then columns), and each 1-D pass uses the log-step running-max
doubling trick: a window of ``m = 2r+1`` needs only ``ceil(log2 m) + 1``
shift-and-max steps instead of ``2r`` (for the default r=4: 4 steps vs 8).
Each step is a static slice of a padded buffer, which Mosaic lowers to
sublane/lane shifts.

Round-5 loop restructure: the convergence test no longer recomputes a
"covered" max-pool per iteration — the carry holds the *remaining*
candidate map directly (winners' windows are zeroed each round), so one
round costs exactly TWO max-pools (find window-maxima, suppress their
neighborhoods) plus a cheap ``any``; the previous shape cost three.

Runs in interpret mode off-TPU, so the same code path is unit-tested on CPU
against both the XLA implementation and the numpy greedy oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _running_max_axis(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Centered window max of width ``m = 2r+1`` along ``axis`` in
    ``ceil(log2 m) + 1`` shift-and-max steps (log-step doubling).

    The buffer is padded with ``r`` of -inf on both sides; after each step
    it holds the max over ``covered`` forward offsets, and one static slice
    extends coverage by ``min(covered, m - covered)``.  The first ``h``
    entries of the final buffer are exactly the centered-window maxima:
    ``out[i] = max_{j=0..m-1} pad(x)[i+j] = max_{d=-r..r} x[i+d]``.
    """
    h, w = x.shape
    m = 2 * radius + 1
    if axis == 0:
        pad = jnp.full((radius, w), -jnp.inf, x.dtype)
    else:
        pad = jnp.full((h, radius), -jnp.inf, x.dtype)
    xp = jnp.concatenate([pad, x, pad], axis=axis)  # length h + 2r
    n = xp.shape[axis]
    covered = 1
    while covered < m:
        step = min(covered, m - covered)
        if axis == 0:
            shifted = jax.lax.slice(xp, (step, 0), (n, w))
            shifted = jnp.concatenate(
                [shifted, jnp.full((step, w), -jnp.inf, x.dtype)], axis=0
            )
        else:
            shifted = jax.lax.slice(xp, (0, step), (h, n))
            shifted = jnp.concatenate(
                [shifted, jnp.full((h, step), -jnp.inf, x.dtype)], axis=1
            )
        xp = jnp.maximum(xp, shifted)
        covered += step
    return jax.lax.slice(xp, (0, 0), (h, w))


def _maxpool2d(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable (2r+1)^2 max over a (H, W) block, -inf padded."""
    return _running_max_axis(
        _running_max_axis(x, radius, 0), radius, 1
    )


def _nms_kernel(scores_ref, out_ref, *, radius: int):
    s = scores_ref[0].astype(jnp.float32)  # (H, W) strict-order key map
    cap = s.shape[0] * s.shape[1]

    # carry = (remaining, keep, i): `remaining` holds the not-yet-resolved
    # candidates — winners' windows are zeroed as they are kept, so the
    # convergence test is a plain `any` instead of a third max-pool.
    def cond(carry):
        remaining, keep, i = carry
        return jnp.any(remaining > 0.0) & (i < cap)

    def body(carry):
        remaining, keep, i = carry
        # window-maxima of the remaining candidates: no larger candidate
        # within `radius`, so sequential greedy would keep them too
        winners = (remaining > 0.0) & (
            remaining == _maxpool2d(remaining, radius)
        )
        keep = jnp.maximum(keep, winners.astype(jnp.float32))
        dead = _maxpool2d(winners.astype(jnp.float32), radius) > 0.0
        return jnp.where(dead, 0.0, remaining), keep, i + 1

    _, keep, _ = jax.lax.while_loop(
        cond, body, (s, jnp.zeros_like(s), jnp.int32(0))
    )
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
