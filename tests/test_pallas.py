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


def _desc_loss_case(rng, b, hc, wc, dd, cfg):
    from feature_point_cnn_tpu.train.loss import descriptor_loss

    desc = jnp.asarray(rng.standard_normal((b, hc, wc, dd)), jnp.float32)
    wdesc = jnp.asarray(rng.standard_normal((b, hc, wc, dd)), jnp.float32)
    homog = jnp.tile(
        jnp.asarray([1.02, 0.01, 3.0, -0.02, 0.98, -2.0, 1e-4, -1e-4]), (b, 1)
    ).astype(jnp.float32)
    mask = jnp.asarray((rng.random((b, hc, wc)) > 0.15), jnp.float32)

    def f(cfgv):
        return lambda d, wd: descriptor_loss(d, wd, homog, mask, cfgv)

    on = cfg.replace(use_pallas_desc_loss="on")
    off = cfg.replace(use_pallas_desc_loss="off")
    v_on, (gd_on, gw_on) = jax.value_and_grad(f(on), argnums=(0, 1))(desc, wdesc)
    v_off, (gd_off, gw_off) = jax.value_and_grad(f(off), argnums=(0, 1))(desc, wdesc)
    return (v_on, gd_on, gw_on), (v_off, gd_off, gw_off)


def test_pallas_descriptor_loss_matches_xla(rng):
    """Blockwise custom-VJP kernel == XLA (B,N,N) path, value AND grads,
    at N both below and at the 128 tile size (padding paths exercised)."""
    cfg = SuperPointConfig()
    for (b, hc, wc, dd) in [(2, 6, 8, 32), (1, 8, 16, 16), (2, 10, 14, 8)]:
        on, off = _desc_loss_case(rng, b, hc, wc, dd, cfg)
        np.testing.assert_allclose(
            float(on[0]), float(off[0]), rtol=2e-5, err_msg=f"{(b,hc,wc,dd)}"
        )
        for g_on, g_off in zip(on[1:], off[1:]):
            np.testing.assert_allclose(
                np.asarray(g_on), np.asarray(g_off), atol=2e-6, rtol=2e-4,
                err_msg=f"{(b,hc,wc,dd)}",
            )


def test_pallas_descriptor_loss_zero_descriptor_finite(rng):
    """All-zero descriptors (the relu'd-row=0 NaN hazard the smooth
    normalization exists for) stay finite in value and grad."""
    from feature_point_cnn_tpu.train.loss import descriptor_loss

    cfg = SuperPointConfig(use_pallas_desc_loss="on")
    b, hc, wc, dd = 1, 4, 4, 8
    desc = jnp.zeros((b, hc, wc, dd), jnp.float32)
    homog = jnp.asarray([[1.0, 0, 0, 0, 1, 0, 0, 0]], jnp.float32)
    v, g = jax.value_and_grad(
        lambda d: descriptor_loss(d, d, homog, None, cfg)
    )(desc)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()


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


def test_pallas_nms_matches_greedy_and_xla(rng):
    """Whole-map-in-VMEM NMS kernel == numpy greedy oracle == XLA
    convergence-loop path, on random maps of increasing density and the
    adversarial monotone ramp (deep suppression chain)."""
    from tests.test_detection import _greedy_nms_oracle, _random_scores

    from feature_point_cnn_tpu.ops.detection import grid_nms
    from feature_point_cnn_tpu.ops.pallas.nms import grid_nms_pallas

    maps = [_random_scores(rng, density=0.03 + 0.05 * t) for t in range(4)]
    ramp = np.zeros((48, 64), np.float32)
    ramp[24, :] = np.linspace(0.1, 0.9, 64)  # monotone chain along a row
    maps.append(ramp)
    for scores in maps:
        want = _greedy_nms_oracle(scores, 4)
        got = np.asarray(
            grid_nms_pallas(jnp.asarray(scores[None]), 4, interpret=True)
        )[0]
        np.testing.assert_array_equal(got, want)
        xla = np.asarray(grid_nms(jnp.asarray(scores[None]), 4, num_iters=0))[0]
        np.testing.assert_array_equal(got, xla)


def test_pallas_nms_plateau_ties_match_xla_and_oracle():
    """Round-4 regression: the kernel previously suppressed on RAW scores,
    so bit-identical plateaus kept every tied neighbor — violating the
    spacing invariant the block-max top-K reduction assumes (tied
    co-survivors in one 4x4 block were silently dropped).  Both paths must
    now resolve ties identically via the shared priority key."""
    from tests.test_detection import (
        _assert_spacing,
        _greedy_key_oracle,
        _plateau_maps,
    )

    from feature_point_cnn_tpu.ops.detection import (
        extract_keypoints_from_scores,
        grid_nms,
    )
    from feature_point_cnn_tpu.ops.pallas.nms import grid_nms_pallas

    for scores in _plateau_maps():
        want = _greedy_key_oracle(scores, 4)
        got = np.asarray(
            grid_nms_pallas(jnp.asarray(scores[None]), 4, interpret=True)
        )[0]
        np.testing.assert_array_equal(got, want)
        _assert_spacing(got, 4)
        xla = np.asarray(grid_nms(jnp.asarray(scores[None]), 4))[0]
        np.testing.assert_array_equal(got, xla)

    # full extraction (incl. the block-max top-K fast path) must agree
    # between implementations on tied inputs
    stack = np.stack(_plateau_maps())
    cfg = SuperPointConfig(max_keypoints=256)
    kp_on = extract_keypoints_from_scores(
        jnp.asarray(stack), cfg.replace(use_pallas_nms="on")
    )
    kp_off = extract_keypoints_from_scores(
        jnp.asarray(stack), cfg.replace(use_pallas_nms="off")
    )
    np.testing.assert_array_equal(np.asarray(kp_on.y), np.asarray(kp_off.y))
    np.testing.assert_array_equal(np.asarray(kp_on.x), np.asarray(kp_off.x))
    np.testing.assert_array_equal(
        np.asarray(kp_on.valid), np.asarray(kp_off.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(kp_on.score), np.asarray(kp_off.score)
    )


def test_pallas_nms_batched_and_config_gate(rng):
    """Batch grid dimension works, and the extract_keypoints config gate
    produces identical keypoints through either NMS implementation."""
    from tests.test_detection import _random_scores

    from feature_point_cnn_tpu.ops.detection import extract_keypoints_from_scores
    from feature_point_cnn_tpu.ops.pallas.nms import grid_nms_pallas
    from feature_point_cnn_tpu.ops.detection import grid_nms

    scores = np.stack([_random_scores(rng, 0.05) for _ in range(3)])
    got = np.asarray(grid_nms_pallas(jnp.asarray(scores), 4, interpret=True))
    want = np.asarray(grid_nms(jnp.asarray(scores), 4))
    np.testing.assert_array_equal(got, want)

    cfg = SuperPointConfig(max_keypoints=64)
    kp_on = extract_keypoints_from_scores(
        jnp.asarray(scores), cfg.replace(use_pallas_nms="on")
    )
    kp_off = extract_keypoints_from_scores(
        jnp.asarray(scores), cfg.replace(use_pallas_nms="off")
    )
    np.testing.assert_array_equal(np.asarray(kp_on.y), np.asarray(kp_off.y))
    np.testing.assert_array_equal(np.asarray(kp_on.x), np.asarray(kp_off.x))
    np.testing.assert_array_equal(
        np.asarray(kp_on.valid), np.asarray(kp_off.valid)
    )
