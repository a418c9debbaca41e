"""Pallas kernel tests (interpret mode on CPU): exact equality with the XLA
reference decode across shapes and thresholds."""

import numpy as np
import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.ops.detection import decode_prob_map
from feature_point_cnn_tpu.ops.pallas.decode import decode_threshold_pallas


def test_pallas_decode_matches_xla(rng):
    for (b, hc, wc) in [(1, 6, 8), (3, 30, 40), (2, 15, 20)]:
        logits = jnp.asarray(rng.standard_normal((b, hc, wc, 65)) * 4, jnp.float32)
        got = decode_threshold_pallas(logits, 8, 0.015, interpret=True)
        prob = decode_prob_map(logits, 8)
        want = jnp.where(prob >= 0.015, prob, 0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pallas_decode_extreme_logits():
    logits = jnp.full((1, 2, 2, 65), 300.0).at[0, 0, 0, 3].set(400.0)
    out = np.asarray(decode_threshold_pallas(logits, 8, 0.015, interpret=True))
    assert np.isfinite(out).all()
    assert out[0, 0, 3] > 0.99


def test_extract_fn_pallas_path_matches_xla_path(rng):
    """Full serving program equality between decode paths."""
    from feature_point_cnn_tpu.inference.wrapper import extract_fn
    from feature_point_cnn_tpu.models.superpoint import init_superpoint

    cfg_on = SuperPointConfig(
        train_image_size=(48, 64), max_keypoints=64,
        compute_dtype="float32", use_pallas_decode="on",
    )
    cfg_off = cfg_on.replace(use_pallas_decode="off")
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg_on)
    img = jnp.asarray(rng.random((1, 48, 64, 3)), jnp.float32)
    kp_on, d_on = extract_fn(variables, img, model=model, config=cfg_on)
    kp_off, d_off = extract_fn(variables, img, model=model, config=cfg_off)
    np.testing.assert_array_equal(np.asarray(kp_on.valid), np.asarray(kp_off.valid))
    np.testing.assert_allclose(np.asarray(kp_on.score), np.asarray(kp_off.score), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(kp_on.y), np.asarray(kp_off.y))
    np.testing.assert_allclose(np.asarray(d_on), np.asarray(d_off), atol=1e-5)
