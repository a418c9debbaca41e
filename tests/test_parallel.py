"""Parallel layer tests on the virtual 8-device CPU mesh: data-parallel
equivalence, spatial (width) sharding with GSPMD halo exchanges, mesh
sizing."""

import numpy as np
import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.models.superpoint import init_superpoint
from feature_point_cnn_tpu.parallel import mesh as M


def test_make_mesh_batch_divisor():
    m = M.make_mesh(batch_size=6)
    assert m.devices.size in (1, 2, 3, 6)
    m2 = M.make_mesh(batch_size=8)
    assert m2.devices.size == 8


def test_data_parallel_forward_matches_single_device(rng):
    cfg = SuperPointConfig(train_image_size=(48, 64), compute_dtype="float32")
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(rng.random((8, 48, 64, 3)), jnp.float32)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    want = np.asarray(fwd(variables, imgs))

    m = M.make_mesh(8)
    sharded = jax.device_put(imgs, M.batch_sharding(m))
    v_rep = M.replicate_state(variables, m)
    got = np.asarray(fwd(v_rep, sharded))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sharded_serving_matches_single_device(rng):
    """`SuperPointFrontend.extract_sharded` over an 8-device mesh returns the
    same keypoints + descriptors as the unsharded fused extract (serving is
    embarrassingly parallel; shard_map adds no cross-device ops)."""
    from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend

    cfg = SuperPointConfig(
        train_image_size=(48, 64), compute_dtype="float32", max_keypoints=64
    )
    fe = SuperPointFrontend(config=cfg)
    imgs = jnp.asarray(rng.random((8, 48, 64, 3)), jnp.float32)

    kp_want, desc_want = fe.extract(imgs)
    m = M.make_mesh(8)
    kp_got, desc_got = fe.extract_sharded(imgs, m)

    np.testing.assert_allclose(np.asarray(kp_got.y), np.asarray(kp_want.y))
    np.testing.assert_allclose(np.asarray(kp_got.x), np.asarray(kp_want.x))
    np.testing.assert_array_equal(
        np.asarray(kp_got.valid), np.asarray(kp_want.valid)
    )
    np.testing.assert_allclose(
        np.asarray(desc_got), np.asarray(desc_want), atol=1e-6
    )


def test_spatial_width_sharding_matches_unsharded(rng):
    """One image sharded over W across 8 devices: GSPMD inserts conv halo
    exchanges; result must equal the unsharded forward."""
    cfg = SuperPointConfig(train_image_size=(48, 128), compute_dtype="float32")
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (48, 128))
    img = jnp.asarray(rng.random((1, 48, 128, 3)), jnp.float32)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    want = np.asarray(fwd(variables, img))

    m = M.make_spatial_mesh(8)
    sharded = M.shard_images_spatial(img, m)
    v_rep = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, M.replicated(m)), variables
    )
    got = np.asarray(fwd(v_rep, sharded))
    np.testing.assert_allclose(got, want, atol=2e-4)
