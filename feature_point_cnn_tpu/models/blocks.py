"""Building blocks: ResNet residual blocks + torch-parity conv helpers.

Topology mirrors `/root/reference/python/src/resnet_blocks.py:4-41` so that
reference checkpoints can be ported for parity testing, but the
implementation is Flax/NHWC with explicit torch-style padding (torch pads
symmetrically; XLA ``SAME`` pads asymmetrically for even sizes, which would
shift activations and break weight-porting parity).

Module names deliberately contain ``bn`` / ``identity`` so the optimizer's
weight-decay exemption mask can replicate the reference's name-based rule
(`basetrainer.py:198-206`: exclude params whose name contains ``bn``,
``bias``, or ``identity``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def torch_conv(
    features: int,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
    use_bias: bool = False,
    dtype: Any = jnp.float32,
    name: str | None = None,
) -> nn.Conv:
    """`nn.Conv` with torch-style symmetric explicit padding."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def batch_norm(train: bool, dtype: Any, name: str) -> nn.BatchNorm:
    """BatchNorm with torch semantics: eps 1e-5, running-stat momentum 0.9
    (torch ``momentum=0.1`` means ``new = 0.9·old + 0.1·batch``)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class TorchConvTranspose(nn.Module):
    """`torch.nn.ConvTranspose2d(k=3, s=2, p=1, output_padding=1)` parity.

    Implemented as a dilated correlation: transposed conv with stride ``s``,
    padding ``p``, output padding ``op`` equals correlating the
    ``s``-dilated input (padded ``(k-1-p, k-1-p+op)``) with the spatially
    flipped kernel.  The kernel parameter here is stored directly in
    correlation (HWIO) layout; the torch-checkpoint importer flips/permutes.
    Doubles spatial size for the reference's configuration
    (`superpoint.py:45`).
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
            jnp.float32,
        )
        pad = ((k - 1 - p, k - 1 - p + op), (k - 1 - p, k - 1 - p + op))
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class S2DStemConv(nn.Module):
    """The 7x7/2/pad-3 stem conv computed as an EXACT space-to-depth
    reparametrization: a 4x4/1 conv over the 2x2-space-to-depth input.

    Identity:  ``out(i,j) = sum_{a,b} W[a,b] in[2i+a-3, 2j+b-3]``.  Writing
    every padded input row as ``u = 2m + r`` (``r`` the parity), the 7 taps
    ``a in [0,7)`` regroup into 4 taps ``p in [0,4)`` per parity with
    ``a = 2p + r - 1`` (the single out-of-range pair ``p=0, r=0`` gets a
    zero weight), so the whole stem is one stride-1 conv with padding
    ``(2, 1)`` over the ``(H/2, W/2, 4*C)`` space-to-depth view.

    The parameter keeps the standard ``(7, 7, C, F)`` kernel layout under
    the same ``conv1/kernel`` path, so checkpoints are interchangeable with
    the plain `torch_conv` stem; the regrouping is a compile-time-fused
    reshape of the weights.  Motivation: a 3-channel 7x7 contraction
    (K=147) starves the MXU; the s2d form contracts K=192 over a
    12-channel input at 1/4 the spatial positions.
    """

    features: int
    dtype: Any = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, c, self.features),
            jnp.float32,
        )
        # W2[p,q,(r,s,ch),o] = W[2p+r-1, 2q+s-1, ch, o]; pad the front so
        # index -1 lands on a zero row/col, then regroup 8 = (4 taps, 2
        # parities) on each spatial axis
        wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = wp.reshape(4, 2, 4, 2, c, self.features)
        w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        # space-to-depth: channel index (r, s, ch) to match w2's regrouping
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        y = lax.conv_general_dilated(
            x2.astype(self.dtype),
            w2.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class ResNetBlock(nn.Module):
    """conv3x3-BN-ReLU + conv1x1-BN, with an always-projected identity on the
    first block of a layer (`resnet_blocks.py:4-41`).

    ``fold_bn=True`` is the inference-export topology: BatchNorms are folded
    into conv kernel+bias by `models/fold.py::fold_batchnorm`.
    """

    channels: int
    stride: int = 1
    project_identity: bool = False
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dt, fold = self.dtype, self.fold_bn
        identity = x
        y = torch_conv(
            self.channels, 3, self.stride, 1, use_bias=fold, dtype=dt,
            name="conv1",
        )(x)
        if not fold:
            y = batch_norm(train, dt, "bn1")(y)
        y = nn.relu(y)
        y = torch_conv(
            self.channels, 1, 1, 0, use_bias=fold, dtype=dt, name="conv2"
        )(y)
        if not fold:
            y = batch_norm(train, dt, "bn2")(y)
        if self.project_identity:
            identity = torch_conv(
                self.channels, 1, self.stride, 0, use_bias=fold, dtype=dt,
                name="identity_conv",
            )(identity)
            if not fold:
                identity = batch_norm(train, dt, "identity_bn")(identity)
        return nn.relu(y + identity)


class ResNetLayer(nn.Module):
    """`make_resnet_layers` (`resnet_blocks.py:30-41`): first block projects
    the identity (1x1 conv + BN) and carries the stride; the rest are plain."""

    num_blocks: int
    channels: int
    stride: int = 1
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = ResNetBlock(
            self.channels,
            stride=self.stride,
            project_identity=True,
            dtype=self.dtype,
            fold_bn=self.fold_bn,
            name="block0",
        )(x, train)
        for i in range(1, self.num_blocks):
            x = ResNetBlock(
                self.channels, dtype=self.dtype, fold_bn=self.fold_bn,
                name=f"block{i}",
            )(x, train)
        return x
