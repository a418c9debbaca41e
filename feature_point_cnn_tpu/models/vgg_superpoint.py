"""Original (magicleap-style) VGG SuperPoint — the second model family.

The reference's C++ app hand-builds this variant as its fallback model
(`/root/reference/cpp/src/model.cc:4-94`, dims in `cpp/src/settings.h:19-25`):
1-channel input, 4 conv pairs 1->64->64->128->128 with 2x2 maxpool between
pairs (total stride 8), detector head 128->256->65, descriptor head
128->256->256 with in-model L2 normalization.  Implemented here as a Flax
module so magicleap-style checkpoints can be imported (see
``torch_import.vgg_variables_from_torch_state``) and served through the same
decode/NMS/matching stack as the flagship ResNet model.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.models.blocks import torch_conv
from feature_point_cnn_tpu.ops.detection import decode_prob_map

# (in, out) channel pairs of the encoder (settings.h:19-22)
ENCODER_DIMS: Tuple[Tuple[int, int], ...] = ((1, 64), (64, 64), (64, 128), (128, 128))


class VGGSuperPoint(nn.Module):
    """``__call__(image (B, H, W, 1)) -> (prob_map, desc_map, logits)``.

    ``desc_map`` is the L2-normalized 256-d half-VGG descriptor grid at 1/8
    resolution (normalization in-model, `model.cc:90-91`).  No BatchNorm —
    faithful to the original architecture.
    """

    config: SuperPointConfig = SuperPointConfig(
        image_channels=1, descriptor_dim=256
    )

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False):
        cfg = self.config
        dt = cfg.compute_jnp_dtype
        x = image.astype(dt)
        h, w = image.shape[1:3]

        last = len(ENCODER_DIMS) - 1
        for i, (_, out_ch) in enumerate(ENCODER_DIMS):
            x = torch_conv(out_ch, 3, 1, 1, use_bias=True, dtype=dt,
                           name=f"encoder_conv{i}_a")(x)
            x = nn.relu(x)
            x = torch_conv(out_ch, 3, 1, 1, use_bias=True, dtype=dt,
                           name=f"encoder_conv{i}_b")(x)
            x = nn.relu(x)
            if i != last:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        point = torch_conv(256, 3, 1, 1, use_bias=True, dtype=dt,
                           name="detector_conv_a")(x)
        point = nn.relu(point)
        logits = torch_conv(65, 1, 1, 0, use_bias=True, dtype=dt,
                            name="detector_conv_b")(point).astype(jnp.float32)

        desc = torch_conv(256, 3, 1, 1, use_bias=True, dtype=dt,
                          name="descriptor_conv_a")(x)
        desc = nn.relu(desc)
        desc = torch_conv(cfg.descriptor_dim, 1, 1, 0, use_bias=True, dtype=dt,
                          name="descriptor_conv_b")(desc).astype(jnp.float32)
        norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
        desc = desc / jnp.maximum(norm, 1e-12)

        prob_map = decode_prob_map(logits, cfg.cell)
        return prob_map, desc, logits


def init_vgg_superpoint(
    key: jax.Array,
    config: SuperPointConfig | None = None,
    image_size: Tuple[int, int] | None = None,
):
    config = config or SuperPointConfig(image_channels=1, descriptor_dim=256)
    h, w = image_size or config.train_image_size
    model = VGGSuperPoint(config=config)
    dummy = jnp.zeros((1, h, w, config.image_channels), jnp.float32)
    variables = model.init(key, dummy)
    return model, variables
