"""On-device photometric augmentation.

Equivalent of the reference's albumentations pipeline
(`/root/reference/python/src/dataset_transforms.py:5-21`: random
brightness/contrast, one-of motion/median/box blur, one-of
multiplicative/gaussian noise, each applied with probability 1/3) — but as a
pure-JAX batched transform inside the jitted train step, instead of per-item
CPU work in DataLoader processes.  Like the reference (which constructs the
pipeline with ``do_augmentation=False`` in both trainers,
`magicpointtrainer.py:10-11`), it is OFF by default.

Blur choice nuance: the reference picks one of three blur types; a median
filter is sort-based and TPU-hostile, so the blur family here is a random
3x3 box/motion blur — the photometric effect class is preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rand_bool(key, p):
    return jax.random.uniform(key) < p


def _brightness_contrast(key, img):
    """RandomBrightnessContrast defaults: brightness/contrast in ±0.2."""
    kb, kc = jax.random.split(key)
    brightness = jax.random.uniform(kb, (), minval=-0.2, maxval=0.2)
    contrast = 1.0 + jax.random.uniform(kc, (), minval=-0.2, maxval=0.2)
    mean = jnp.mean(img)
    return (img - mean) * contrast + mean + brightness


def _blur(key, img):
    """One of: 3x3 box blur or horizontal/vertical 3-tap motion blur."""
    choice = jax.random.randint(key, (), 0, 3)
    box = jnp.ones((3, 3), jnp.float32) / 9.0
    mh = jnp.zeros((3, 3), jnp.float32).at[1, :].set(1.0 / 3.0)
    mv = jnp.zeros((3, 3), jnp.float32).at[:, 1].set(1.0 / 3.0)
    kernel = jnp.stack([box, mh, mv])[choice]

    def conv1(channel):
        return jax.lax.conv_general_dilated(
            channel[None, ..., None],
            kernel[..., None, None],
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, ..., 0]

    return jnp.stack([conv1(img[..., c]) for c in range(img.shape[-1])], -1)


def _noise(key, img):
    """One of: multiplicative (0.9-1.1) or additive gaussian noise."""
    kc, km, ka = jax.random.split(key, 3)
    mult = img * jax.random.uniform(
        km, img.shape[:2] + (1,), minval=0.9, maxval=1.1
    )
    add = img + 0.05 * jax.random.normal(ka, img.shape)
    return jnp.where(_rand_bool(kc, 0.5), mult, add)


def photometric_augment(
    key: jax.Array, image: jnp.ndarray, p: float = 1.0 / 3.0
) -> jnp.ndarray:
    """Augment one ``(H, W, C)`` image in [0, 1]; each stage fires with
    probability ``p``."""
    k1, k2, k3, g1, g2, g3 = jax.random.split(key, 6)
    image = jnp.where(_rand_bool(g1, p), _brightness_contrast(k1, image), image)
    image = jnp.where(_rand_bool(g2, p), _blur(k2, image), image)
    image = jnp.where(_rand_bool(g3, p), _noise(k3, image), image)
    return jnp.clip(image, 0.0, 1.0)


def photometric_augment_batch(key, images, p: float = 1.0 / 3.0):
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(photometric_augment, in_axes=(0, 0, None))(keys, images, p)
