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


def test_microbatched_step_matches_on_8_device_mesh(rng):
    """`microbatch_steps>1` under the data-parallel mesh: the strided
    microbatch split keeps every microbatch evenly sharded over devices
    (steps.py::_microbatched_value_and_grad), so the 8-device result must
    equal the single-device result — and must not silently reshard."""
    import functools

    from feature_point_cnn_tpu.train import steps as S
    from feature_point_cnn_tpu.train.optimizer import make_optimizer

    cfg = SuperPointConfig(
        train_image_size=(48, 64), compute_dtype="float32",
        microbatch_steps=2, grad_clip_norm=0.0,
    )
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = S.create_train_state(variables, tx)
    batch = {
        "image": jnp.asarray(rng.random((8, 48, 64, 3)), jnp.float32),
        "points": jnp.asarray(rng.random((8, 16, 2)) * [47, 63], jnp.float32),
        "points_valid": jnp.ones((8, 16), bool),
    }
    # compare LOSS + GRADIENTS (post-Adam params amplify near-zero-grad sign
    # flips to +-lr on the very first step, so they are the wrong parity
    # surface for cross-device float reordering)
    from feature_point_cnn_tpu.ops.labels import make_points_labels_batch

    key = jax.random.PRNGKey(1)
    labels = make_points_labels_batch(
        batch["points"], batch["points_valid"], key, 48, 64, cfg.cell
    )
    from feature_point_cnn_tpu.train.loss import detector_loss

    def micro_loss(params, stats, micro):
        out, mutated = model.apply(
            {"params": params, "batch_stats": stats}, micro["images"],
            train=True, enable_descriptor=False, mutable=["batch_stats"],
        )
        loss = detector_loss(
            out[2], micro["labels"], None, cfg.cell, cfg.detector_loss
        )
        return loss, (mutated["batch_stats"], out[2])

    data = {"images": batch["image"], "labels": labels}

    @jax.jit
    def grads_fn(params, stats, data):
        loss, _, _, grads = S._microbatched_value_and_grad(
            micro_loss, params, stats, data, 2
        )
        return loss, grads

    want_loss, want_grads = grads_fn(
        state.params, state.batch_stats, data
    )

    m = M.make_mesh(8)
    sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, M.batch_sharding(m)), data
    )
    p_rep = M.replicate_state(state.params, m)
    s_rep = M.replicate_state(state.batch_stats, m)

    # the strided microbatch split must not force GSPMD to reshard the
    # batch between scan iterations: gradient all-reduces are expected,
    # all-to-alls are the regression being guarded against
    hlo = grads_fn.lower(p_rep, s_rep, sharded).compile().as_text()
    assert "all-to-all" not in hlo, "microbatch split forced a reshard"

    got_loss, got_grads = grads_fn(p_rep, s_rep, sharded)

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    # tolerance: per-device batch-1 convs accumulate in a different order
    # than the batch-8 unsharded conv (~1e-3 rel on CPU), and BN statistics
    # amplify it; a wrong-data bug would mismatch at O(1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-2
        ),
        want_grads, got_grads,
    )


def test_microbatch_indivisible_batch_raises(rng):
    import functools

    from feature_point_cnn_tpu.train import steps as S
    from feature_point_cnn_tpu.train.optimizer import make_optimizer

    cfg = SuperPointConfig(
        train_image_size=(48, 64), compute_dtype="float32", microbatch_steps=3
    )
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg, variables["params"])
    state = S.create_train_state(variables, tx)
    batch = {
        "image": jnp.zeros((4, 48, 64, 3), jnp.float32),
        "points": jnp.zeros((4, 8, 2), jnp.float32),
        "points_valid": jnp.ones((4, 8), bool),
    }
    import pytest

    with pytest.raises(ValueError, match="microbatch"):
        S.magicpoint_train_step(
            state, batch, jax.random.PRNGKey(1),
            model=model, tx=tx, config=cfg,
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
