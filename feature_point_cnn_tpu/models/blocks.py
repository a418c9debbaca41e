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


class ResNetBlock(nn.Module):
    """conv3x3-BN-ReLU + conv1x1-BN, with an always-projected identity on the
    first block of a layer (`resnet_blocks.py:4-41`)."""

    channels: int
    stride: int = 1
    project_identity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dt = self.dtype
        identity = x
        y = torch_conv(self.channels, 3, self.stride, 1, dtype=dt, name="conv1")(x)
        y = batch_norm(train, dt, "bn1")(y)
        y = nn.relu(y)
        y = torch_conv(self.channels, 1, 1, 0, dtype=dt, name="conv2")(y)
        y = batch_norm(train, dt, "bn2")(y)
        if self.project_identity:
            identity = torch_conv(
                self.channels, 1, self.stride, 0, dtype=dt, name="identity_conv"
            )(identity)
            identity = batch_norm(train, dt, "identity_bn")(identity)
        return nn.relu(y + identity)


class ResNetLayer(nn.Module):
    """`make_resnet_layers` (`resnet_blocks.py:30-41`): first block projects
    the identity (1x1 conv + BN) and carries the stride; the rest are plain."""

    num_blocks: int
    channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = ResNetBlock(
            self.channels,
            stride=self.stride,
            project_identity=True,
            dtype=self.dtype,
            name="block0",
        )(x, train)
        for i in range(1, self.num_blocks):
            x = ResNetBlock(self.channels, dtype=self.dtype, name=f"block{i}")(
                x, train
            )
        return x
