"""ResNet-backbone SuperPoint — the flagship model, as a Flax module.

Topology mirrors `/root/reference/python/src/superpoint.py:8-115` (so
reference checkpoints port 1:1 for parity tests), re-designed TPU-first:

* NHWC layout, bfloat16 compute / float32 params by default (replacing
  AMP + GradScaler, `basetrainer.py:48`);
* one model definition shared by train and serve (the reference's C++ app
  hand-builds a *different* VGG model, `cpp/src/model.cc` — see
  ``models/vgg_superpoint.py`` for that family);
* descriptor enablement is a **static** argument: disabling it for the
  MagicPoint phase (`superpoint.py:74-78`) removes the head from the traced
  program entirely instead of multiplying by zero.

Total stride 8 == cell size: conv7x7/2 + maxpool/2 + layer2/2.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.models.blocks import (
    ResNetLayer,
    S2DStemConv,
    TorchConvTranspose,
    batch_norm,
    torch_conv,
)
from feature_point_cnn_tpu.ops.detection import decode_prob_map


class Encoder(nn.Module):
    """conv7x7/2(3->64)+BN+ReLU+maxpool3/2, then residual layers 64/1 and
    128/2 (`superpoint.py:8-26`)."""

    dtype: Any = jnp.bfloat16
    stem_s2d: bool = False
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dt, fold = self.dtype, self.fold_bn
        if self.stem_s2d:
            # exact reparametrization of the 7x7/2 conv — same `conv1/kernel`
            # param, MXU-friendly geometry (blocks.py::S2DStemConv)
            x = S2DStemConv(64, dtype=dt, use_bias=fold, name="conv1")(x)
        else:
            x = torch_conv(64, 7, 2, 3, use_bias=fold, dtype=dt, name="conv1")(x)
        if not fold:
            x = batch_norm(train, dt, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        x = ResNetLayer(2, 64, stride=1, dtype=dt, fold_bn=fold, name="layer1")(
            x, train
        )
        x = ResNetLayer(2, 128, stride=2, dtype=dt, fold_bn=fold, name="layer2")(
            x, train
        )
        return x


class Detector(nn.Module):
    """Residual layer 128 -> 65 logits; also exposes its 128-ch input as the
    embedding consumed by the descriptor head (`superpoint.py:29-36`)."""

    dtype: Any = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = ResNetLayer(
            2, 65, stride=1, dtype=self.dtype, fold_bn=self.fold_bn,
            name="layer",
        )(x, train)
        return logits, x


class Descriptor(nn.Module):
    """128 -> 256/2 residual layer, ConvT upsample back to 1/8 res, concat
    with the detector embedding (256ch), residual layer -> 128-d
    (`superpoint.py:39-61`)."""

    dtype: Any = jnp.bfloat16
    descriptor_dim: int = 128
    fold_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, embeddings: jnp.ndarray, train: bool
    ) -> jnp.ndarray:
        dt, fold = self.dtype, self.fold_bn
        y = ResNetLayer(2, 256, stride=2, dtype=dt, fold_bn=fold, name="layer_in")(
            x, train
        )
        y = TorchConvTranspose(128, dtype=dt, name="up_sample")(y)
        if not fold:
            y = batch_norm(train, dt, "bn")(y)
        y = nn.relu(y)
        # crop to the embedding grid: for odd Hc/Wc the doubling transposed
        # conv overshoots by one row/col (the reference crashes at such sizes
        # — torch concat of 16 vs 15 — we support any multiple of 8)
        hc, wc = embeddings.shape[1:3]
        y = y[:, :hc, :wc, :]
        y = jnp.concatenate([y, embeddings.astype(dt)], axis=-1)
        y = ResNetLayer(
            2, self.descriptor_dim, stride=1, dtype=dt, fold_bn=fold,
            name="layer_out",
        )(y, train)
        return y


class SuperPoint(nn.Module):
    """Full detector+descriptor network.

    ``__call__(image (B, H, W, 3) in [0,1], train, enable_descriptor)``
    returns ``(prob_map (B, H, W) f32, desc (B, Hc, Wc, D) f32,
    logits (B, Hc, Wc, 65) f32)`` — the reference's contract
    (`superpoint.py:91-115`) in NHWC.
    """

    config: SuperPointConfig = SuperPointConfig()

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        train: bool = False,
        enable_descriptor: bool = True,
    ):
        cfg = self.config
        dt = cfg.compute_jnp_dtype
        b, h, w, _ = image.shape
        hc, wc = cfg.grid_size(h, w)

        stem_s2d = cfg.stem_s2d == "on" or (
            cfg.stem_s2d == "auto" and jax.default_backend() == "tpu"
        )
        fold = cfg.fold_bn
        if fold and train:
            raise ValueError("fold_bn is an inference-export topology")
        x = Encoder(dtype=dt, stem_s2d=stem_s2d, fold_bn=fold, name="encoder")(
            image.astype(dt), train
        )
        logits, embeddings = Detector(dtype=dt, fold_bn=fold, name="detector")(
            x, train
        )
        logits = logits.astype(jnp.float32)

        if enable_descriptor:
            desc = Descriptor(
                dtype=dt, descriptor_dim=cfg.descriptor_dim, fold_bn=fold,
                name="descriptor",
            )(x, embeddings, train).astype(jnp.float32)
        else:
            desc = jnp.zeros((b, hc, wc, cfg.descriptor_dim), jnp.float32)

        prob_map = decode_prob_map(logits, cfg.cell)
        return prob_map, desc, logits


def init_superpoint(
    key: jax.Array,
    config: SuperPointConfig = SuperPointConfig(),
    image_size: Tuple[int, int] | None = None,
):
    """Initialize params + batch_stats on a dummy image.

    Returns ``(model, variables)``; ``variables = {"params", "batch_stats"}``.
    """
    h, w = image_size or config.train_image_size
    model = SuperPoint(config=config)
    dummy = jnp.zeros((1, h, w, config.image_channels), jnp.float32)
    variables = model.init(key, dummy, train=False, enable_descriptor=True)
    return model, variables
