"""Pallas TPU kernel: blockwise hinge descriptor loss with custom VJP.

The SuperPoint descriptor loss contracts every original cell against every
warped cell (`/root/reference/python/src/losses.py:203-231`): with N = Hc*Wc
cells the XLA path (`train/loss.py:descriptor_loss`) materializes several
``(B, N, N)`` tensors in HBM across forward+backward (dot, relu, two
normalizations, hinges) — measured round 1 at 2.15 ms fwd / 3.7 ms bwd for
b16 240x320, HBM-bound.  This kernel never writes an ``(B, N, N)`` tensor to
HBM: each pass re-computes 128-row tiles of the dot product on the MXU in
VMEM (FLOPs are ~50x cheaper than the saved HBM traffic) and reduces in
place.

Key structural fact making this cheap: the row normalization ``r_i = sum_j
relu(dot_ij)^2`` is complete within a row tile (full j range in VMEM), so
only the column statistic ``c_j = sum_i u_ij^2`` crosses tiles.  Forward is
2 tile passes (one to build ``c``, one for the hinge reduction); backward is
2 passes (one for the column cotangent ``T_j``, one fused pass computing the
row cotangent and both descriptor gradients).

The correspondence mask ``s_ij = ||warp(center_i) - center_j|| < cell-0.5``
(`losses.py:242-264`) is evaluated per tile from the (N, 2) center arrays —
it also never materializes.

All math is float32 on the MXU/VPU and matches the XLA path bit-closely
(unit-tested in interpret mode on CPU, `tests/test_pallas.py`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12      # matches train/loss.py:_l2_normalize
_TILE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot_nt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(TI, D) x (Np, D) -> (TI, Np) contraction over D, f32 on the MXU."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _tile_stats(d_ref, wd, t):
    """Row tile t: relu'd dots A (TI, Np), row stat Rr (TI, 1), u = A*Rr.

    Tiles are loaded straight from the VMEM ref with `pl.ds` — Mosaic has no
    lowering for value-level ``dynamic_slice`` of an already-loaded array.
    """
    dt = d_ref[0, pl.ds(t * _TILE, _TILE), :]
    a = jnp.maximum(_dot_nt(dt, wd), 0.0)
    rr = jax.lax.rsqrt(jnp.sum(a * a, axis=1, keepdims=True) + _EPS)
    return dt, a, a * rr


def _tile_s(wc_ref, ct, t, cell: float):
    """Correspondence mask tile (TI, Np) from warped/plain cell centers."""
    wt = wc_ref[0, pl.ds(t * _TILE, _TILE), :]
    wy = wt[:, 0:1]
    wx = wt[:, 1:2]
    cy = ct[0:1, :]
    cx = ct[1:2, :]
    dist2 = (wy - cy) ** 2 + (wx - cx) ** 2
    return (dist2 < (cell - 0.5) ** 2).astype(jnp.float32)


def _fwd_kernel(
    d_ref, wd_ref, wc_ref, ct_ref, mj_ref, loss_ref, c_ref,
    *, n_tiles: int, lambda_d: float, mp: float, mn: float, cell: float,
):
    wd = wd_ref[0]
    ct = ct_ref[:]
    mj = mj_ref[0]                                     # (1, Np)

    def acc_c(t, c_acc):
        _, _, u = _tile_stats(d_ref, wd, t)
        return c_acc + jnp.sum(u * u, axis=0, keepdims=True)

    c = jax.lax.fori_loop(
        0, n_tiles, acc_c, jnp.zeros((1, n_tiles * _TILE), jnp.float32)
    )
    c_ref[0] = c
    rc = jax.lax.rsqrt(c + _EPS)                       # (1, Np)

    def acc_loss(t, loss_acc):
        _, _, u = _tile_stats(d_ref, wd, t)
        v = u * rc
        s = _tile_s(wc_ref, ct, t, cell)
        hinge = lambda_d * s * jnp.maximum(0.0, mp - v) + (
            1.0 - s
        ) * jnp.maximum(0.0, v - mn)
        return loss_acc + jnp.sum(hinge * mj)

    # the (B, 1) SMEM loss buffer is one full-array block shared by every
    # grid step (Mosaic rejects (1, 1) sub-blocks of a (B, 1) array); each
    # step writes its own batch element
    loss_ref[pl.program_id(0), 0] = jax.lax.fori_loop(
        0, n_tiles, acc_loss, 0.0
    )


def _bwd_kernel(
    d_ref, wd_ref, wc_ref, ct_ref, mj_ref, c_ref, g_ref, dd_ref, dwd_ref,
    *, n_tiles: int, lambda_d: float, mp: float, mn: float, cell: float,
):
    wd = wd_ref[0]
    ct = ct_ref[:]
    mj = mj_ref[0]
    rc = jax.lax.rsqrt(c_ref[0] + _EPS)                # (1, Np)
    gscale = g_ref[pl.program_id(0), 0]

    def tile_g(t):
        """Recompute tile intermediates + dL/dv cotangent G."""
        dt, a, u = _tile_stats(d_ref, wd, t)
        v = u * rc
        s = _tile_s(wc_ref, ct, t, cell)
        g = gscale * mj * (
            -lambda_d * s * (mp - v > 0.0).astype(jnp.float32)
            + (1.0 - s) * (v - mn > 0.0).astype(jnp.float32)
        )
        return dt, a, u, v, g

    # pass 1: column cotangent T_j = Rc_j^3 * sum_i G_ij u_ij
    def acc_t(t, t_acc):
        _, _, u, _, g = tile_g(t)
        return t_acc + jnp.sum(g * u, axis=0, keepdims=True)

    t_col = jax.lax.fori_loop(
        0, n_tiles, acc_t, jnp.zeros_like(rc)
    ) * (rc * rc * rc)

    # pass 2: per-tile row cotangent + both descriptor gradients
    dwd_ref[0] = jnp.zeros(wd.shape, jnp.float32)

    def body(t, _):
        dt, a, u, _, g = tile_g(t)
        rr = jax.lax.rsqrt(jnp.sum(a * a, axis=1, keepdims=True) + _EPS)
        h = g * rc - t_col * u                         # dL/du
        s_row = (
            jnp.sum(h * a, axis=1, keepdims=True) * rr * rr * rr
        )                                              # (TI, 1)
        da = h * rr - s_row * a
        dg = jnp.where(a > 0.0, da, 0.0)               # relu'(x)=0 at x<=0
        dd_ref[0, pl.ds(t * _TILE, _TILE), :] = jnp.dot(
            dg, wd, preferred_element_type=jnp.float32
        )
        dwd_ref[0] += jax.lax.dot_general(
            dg, dt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)


def _pad_inputs(d, wd, warped_centers, centers, mask_j):
    """Zero-pad N to a 128 multiple; padded centers pushed far away so the
    correspondence mask is 0 and padded cells contribute exactly nothing."""
    b, n, dd = d.shape
    np_ = _round_up(n, _TILE)
    pad = np_ - n
    if pad:
        d = jnp.pad(d, ((0, 0), (0, pad), (0, 0)))
        wd = jnp.pad(wd, ((0, 0), (0, pad), (0, 0)))
        warped_centers = jnp.pad(
            warped_centers, ((0, 0), (0, pad), (0, 0)), constant_values=1e9
        )
        centers = jnp.pad(centers, ((0, pad), (0, 0)), constant_values=-1e9)
        mask_j = jnp.pad(mask_j, ((0, 0), (0, pad)))
    return d, wd, warped_centers, centers, mask_j, np_


def _call_fwd(d, wd, wc, ct, mj, params):
    lambda_d, mp, mn, cell, interpret = params
    b, np_, dd = d.shape
    kernel = functools.partial(
        _fwd_kernel, n_tiles=np_ // _TILE,
        lambda_d=lambda_d, mp=mp, mn=mn, cell=float(cell),
    )
    loss, c = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, dd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, dd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, np_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
        ],
        interpret=interpret,
    )(d, wd, wc, ct, mj)
    return loss[:, 0], c


def _call_bwd(d, wd, wc, ct, mj, c, g_b, params):
    lambda_d, mp, mn, cell, interpret = params
    b, np_, dd = d.shape
    kernel = functools.partial(
        _bwd_kernel, n_tiles=np_ // _TILE,
        lambda_d=lambda_d, mp=mp, mn=mn, cell=float(cell),
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, dd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, dd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, np_, dd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, dd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, dd), jnp.float32),
            jax.ShapeDtypeStruct((b, np_, dd), jnp.float32),
        ],
        interpret=interpret,
    )(d, wd, wc, ct, mj, c, g_b[:, None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _hinge_sum(d, wd, wc, ct, mj, params):
    """Per-batch UNNORMALIZED hinge sum ``(B,)``; inputs already padded."""
    loss, _ = _call_fwd(d, wd, wc, ct, mj, params)
    return loss


def _hinge_sum_fwd(d, wd, wc, ct, mj, params):
    loss, c = _call_fwd(d, wd, wc, ct, mj, params)
    return loss, (d, wd, wc, ct, mj, c)


def _hinge_sum_bwd(params, res, g):
    d, wd, wc, ct, mj, c = res
    dd, dwd = _call_bwd(d, wd, wc, ct, mj, c, g.astype(jnp.float32), params)
    return (
        dd, dwd, jnp.zeros_like(wc), jnp.zeros_like(ct), jnp.zeros_like(mj)
    )


_hinge_sum.defvjp(_hinge_sum_fwd, _hinge_sum_bwd)


def hinge_descriptor_loss_pallas(
    d: jnp.ndarray,
    wd: jnp.ndarray,
    warped_centers: jnp.ndarray,
    centers: jnp.ndarray,
    mask_j: jnp.ndarray,
    lambda_d: float,
    positive_margin: float,
    negative_margin: float,
    cell: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Blockwise double-normalized hinge loss, differentiable w.r.t. d/wd.

    Args:
      d / wd: ``(B, N, D)`` row-L2-normalized descriptors (original/warped).
      warped_centers: ``(B, N, 2)`` original cell centers in the warped frame.
      centers: ``(N, 2)`` cell centers ``(y, x)``.
      mask_j: ``(B, N)`` warped-view cell validity in {0, 1}.

    Returns the UNNORMALIZED loss sum (caller divides by ``sum(mask) * N``,
    `losses.py:270-274` semantics — see `train/loss.py:descriptor_loss`).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d, wd, warped_centers, centers, mask_j, _ = _pad_inputs(
        d.astype(jnp.float32), wd.astype(jnp.float32),
        warped_centers.astype(jnp.float32), centers.astype(jnp.float32),
        mask_j.astype(jnp.float32),
    )
    params = (
        float(lambda_d), float(positive_margin), float(negative_margin),
        float(cell), bool(interpret),
    )
    ct = centers.T                                      # (2, Np)
    mj = mask_j[:, None, :]                             # (B, 1, Np)
    return jnp.sum(_hinge_sum(d, wd, warped_centers, ct, mj, params))
