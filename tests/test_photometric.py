"""Photometric augmentation + aux subsystem tests."""

import numpy as np
import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.data.photometric import (
    photometric_augment,
    photometric_augment_batch,
)


def test_photometric_bounds_and_determinism(rng):
    img = jnp.asarray(rng.random((32, 40, 3)), jnp.float32)
    a = photometric_augment(jax.random.PRNGKey(3), img, p=1.0)
    b = photometric_augment(jax.random.PRNGKey(3), img, p=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(a).min() >= 0.0 and np.asarray(a).max() <= 1.0
    # p=1 means all stages fire -> image actually changes
    assert not np.allclose(np.asarray(a), np.asarray(img))


def test_photometric_p_zero_identity(rng):
    img = jnp.asarray(rng.random((16, 24, 3)), jnp.float32)
    out = photometric_augment(jax.random.PRNGKey(0), img, p=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-7)


def test_photometric_batch_varies_per_item(rng):
    imgs = jnp.asarray(np.tile(rng.random((1, 16, 24, 3)), (4, 1, 1, 1)), jnp.float32)
    out = np.asarray(photometric_augment_batch(jax.random.PRNGKey(1), imgs, 1.0))
    assert not np.allclose(out[0], out[1])


def test_train_step_with_photometric(rng):
    from feature_point_cnn_tpu.config import SuperPointConfig
    from feature_point_cnn_tpu.models.superpoint import init_superpoint
    from feature_point_cnn_tpu.train import steps as S
    from feature_point_cnn_tpu.train.optimizer import make_optimizer

    cfg = SuperPointConfig(
        train_image_size=(48, 64), max_points=16, compute_dtype="float32",
        photometric_augment=True,
    )
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = S.create_train_state(variables, tx)
    batch = {
        "image": jnp.asarray(rng.random((2, 48, 64, 3)), jnp.float32),
        "points": jnp.asarray(rng.random((2, 16, 2)) * [47, 63], jnp.float32),
        "points_valid": jnp.ones((2, 16), bool),
    }
    _, metrics = S.magicpoint_train_step(
        state, batch, jax.random.PRNGKey(1), model=model, tx=tx, config=cfg
    )
    assert np.isfinite(float(metrics["loss"]))


def test_process_shard_covers_everything():
    from feature_point_cnn_tpu.parallel.distributed import process_shard

    s = process_shard(103)
    # single process: full range
    assert s == slice(0, 103)


def test_throughput_meter():
    from feature_point_cnn_tpu.utils.profiling import Throughput

    t = Throughput()
    t.step(4)   # first call only starts the clock
    t.step(4)
    assert t.per_sec > 0
