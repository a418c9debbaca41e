"""Loss tests: CE/distance detector losses, descriptor hinge loss vs a
direct numpy transcription of the reference math (`losses.py:194-276`),
and gradient-flow checks (the reason for the soft-argmax deviation)."""

import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.geometry.homography import warp_points
from feature_point_cnn_tpu.train import loss as LS

CFG = SuperPointConfig()
B, HC, WC, DD = 2, 3, 4, 8


def test_detector_ce_matches_numpy(rng):
    logits = jnp.asarray(rng.standard_normal((B, HC, WC, 65)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 65, (B, HC, WC)), jnp.int32)
    got = float(LS.detector_loss(logits, targets, None, 8, kind="ce"))
    l = np.asarray(logits, np.float64)
    lse = np.log(np.exp(l - l.max(-1, keepdims=True)).sum(-1)) + l.max(-1)
    t = np.asarray(targets)
    want = np.mean(lse - np.take_along_axis(l, t[..., None], -1)[..., 0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_detector_distance_perfect_prediction_is_zero():
    targets = jnp.asarray(np.random.default_rng(0).integers(0, 64, (B, HC, WC)))
    logits = (
        jax.nn.one_hot(targets, 65) * 1e4
    )  # prob mass exactly on the target bin
    got = float(LS.detector_loss(logits, targets, None, 8, kind="distance"))
    assert got < 1e-6


def test_detector_distance_has_gradient_for_in_cell_targets(rng):
    """The reference hard-argmax variant has zero grad for in-cell targets
    (`losses.py:43-51`); the soft variant must not."""
    logits = jnp.asarray(rng.standard_normal((B, HC, WC, 65)), jnp.float32)
    targets = jnp.full((B, HC, WC), 10, jnp.int32)  # all in-cell
    g_soft = jax.grad(
        lambda l: LS.detector_loss(l, targets, None, 8, kind="distance")
    )(logits)
    assert float(jnp.abs(g_soft).sum()) > 1e-3
    g_hard = jax.grad(
        lambda l: LS.detector_loss(
            l, targets, None, 8, kind="distance", hard_assignment=True
        )
    )(logits)
    assert float(jnp.abs(g_hard).sum()) == 0.0


def test_detector_loss_mask(rng):
    logits = jnp.asarray(rng.standard_normal((B, HC, WC, 65)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 65, (B, HC, WC)), jnp.int32)
    ones = jnp.ones((B, HC, WC))
    a = float(LS.detector_loss(logits, targets, None, 8, "ce"))
    b = float(LS.detector_loss(logits, targets, ones, 8, "ce"))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    # zero mask -> finite (guarded denominator)
    z = float(LS.detector_loss(logits, targets, jnp.zeros((B, HC, WC)), 8, "ce"))
    assert np.isfinite(z)


def _numpy_descriptor_loss(desc, wdesc, homog, mask, cfg):
    """Direct numpy transcription of losses.py:194-276 (with GEMM replaced
    by explicit loops over cells) as an independent oracle."""
    b, hc, wc, dd = desc.shape
    n = hc * wc

    def norm(x, axis):
        nn = np.linalg.norm(x, axis=axis, keepdims=True)
        return x / np.maximum(nn, 1e-12)

    d = norm(desc.reshape(b, n, dd), -1)
    wd = norm(wdesc.reshape(b, n, dd), -1)
    dot = np.einsum("bid,bjd->bij", d, wd)
    dot = np.maximum(dot, 0.0)
    dot = norm(dot, 2)
    dot = norm(dot, 1)
    pos = np.maximum(0.0, cfg.positive_margin - dot)
    neg = np.maximum(0.0, dot - cfg.negative_margin)

    centers = np.stack(
        np.meshgrid(np.arange(hc), np.arange(wc), indexing="ij"), -1
    ).reshape(n, 2).astype(np.float32) * cfg.cell + cfg.cell // 2
    wcenters = np.asarray(warp_points(jnp.asarray(centers), jnp.asarray(homog)))
    dist = np.linalg.norm(
        wcenters[:, :, None, :] - centers[None, None, :, :], axis=-1
    )
    s = (dist < cfg.cell - 0.5).astype(np.float32)
    loss = cfg.lambda_d * s * pos + (1 - s) * neg
    m = np.ones((b, n)) if mask is None else mask.reshape(b, n)
    return (loss * m[:, None, :]).sum() / (m.sum() * n)


def test_descriptor_loss_matches_oracle(rng):
    desc = rng.standard_normal((B, HC, WC, DD)).astype(np.float32)
    wdesc = rng.standard_normal((B, HC, WC, DD)).astype(np.float32)
    homog = np.tile(
        np.asarray([1.0, 0, 2.0, 0, 1.0, 1.0, 0, 0], np.float32), (B, 1)
    )
    mask = (rng.random((B, HC, WC)) > 0.2).astype(np.float32)
    got = float(
        LS.descriptor_loss(
            jnp.asarray(desc), jnp.asarray(wdesc), jnp.asarray(homog),
            jnp.asarray(mask), CFG,
        )
    )
    want = _numpy_descriptor_loss(desc, wdesc, homog, mask, CFG)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_descriptor_loss_identity_identical_descs_low(rng):
    """Identity homography + identical descriptor maps: the matched-pair
    hinge should be far lower than with random descriptors."""
    desc = rng.standard_normal((1, HC, WC, DD)).astype(np.float32)
    ident = np.asarray([1.0, 0, 0, 0, 1, 0, 0, 0], np.float32)[None]
    same = float(
        LS.descriptor_loss(
            jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(ident), None, CFG
        )
    )
    other = rng.standard_normal((1, HC, WC, DD)).astype(np.float32)
    diff = float(
        LS.descriptor_loss(
            jnp.asarray(desc), jnp.asarray(other), jnp.asarray(ident), None, CFG
        )
    )
    assert same < diff


def test_global_loss_components(rng):
    logits = jnp.asarray(rng.standard_normal((B, HC, WC, 65)), jnp.float32)
    wlogits = jnp.asarray(rng.standard_normal((B, HC, WC, 65)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 65, (B, HC, WC)), jnp.int32)
    desc = jnp.asarray(rng.standard_normal((B, HC, WC, DD)), jnp.float32)
    homog = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 1, 0, 0, 0]), (B, 1))
    mask = jnp.ones((B, HC, WC))
    out = LS.global_loss(
        logits, targets, wlogits, targets, desc, desc, homog, mask, CFG
    )
    total = float(out["detector"] + out["warped_detector"] + out["descriptor"])
    np.testing.assert_allclose(float(out["total"]), total, rtol=1e-6)
    assert all(np.isfinite(float(v)) for v in out.values())


def _identity_homog():
    return jnp.tile(
        jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], jnp.float32)[None], (B, 1)
    )


def test_hinge_hn_perfect_descriptors_near_zero(rng):
    """Identity warp + identical, mutually-distant unit descriptors: the
    positive hinge is 0 (dot=1 >= m_pos) and mined negatives only
    contribute where cos > m_neg."""
    cfg = CFG.replace(descriptor_loss="hinge_hn", desc_hn_topk=4)
    # near-orthogonal descriptors: distinct one-hot-ish rows
    d = np.zeros((B, HC * WC, DD), np.float32)
    for i in range(HC * WC):
        d[:, i, i % DD] = 1.0
        d[:, i, (i // DD) % DD] += 0.3
    d = d.reshape(B, HC, WC, DD)
    got = float(
        LS.descriptor_hinge_hn_loss(
            jnp.asarray(d), jnp.asarray(d), _identity_homog(), None, cfg
        )
    )
    # positives are exactly zero; negatives are bounded by the max
    # off-correspondence cosine minus the margin
    assert 0.0 <= got < 0.5, got


def test_hinge_hn_separates_good_from_bad(rng):
    """Matched descriptors under the identity warp must score LOWER than
    shuffled (mismatched) descriptors — the basic metric-learning order."""
    cfg = CFG.replace(descriptor_loss="hinge_hn", desc_hn_topk=4)
    d = rng.standard_normal((B, HC, WC, DD)).astype(np.float32)
    perm = rng.permutation(HC * WC)
    d_bad = d.reshape(B, -1, DD)[:, perm].reshape(B, HC, WC, DD)
    h = _identity_homog()
    good = float(
        LS.descriptor_hinge_hn_loss(jnp.asarray(d), jnp.asarray(d), h, None, cfg)
    )
    bad = float(
        LS.descriptor_hinge_hn_loss(
            jnp.asarray(d), jnp.asarray(d_bad), h, None, cfg
        )
    )
    assert good < bad, (good, bad)


def test_hinge_hn_gradients_finite_incl_zero_rows(rng):
    """Gradient flows and stays finite even with exactly-zero descriptor
    rows (the relu'd early-training state that NaN'd the naive L2 norm)."""
    cfg = CFG.replace(descriptor_loss="hinge_hn")
    d = rng.standard_normal((B, HC, WC, DD)).astype(np.float32)
    wd = rng.standard_normal((B, HC, WC, DD)).astype(np.float32)
    wd[:, 0, 0] = 0.0  # exactly-zero row
    mask = np.ones((B, HC, WC), np.float32)
    mask[:, -1] = 0.0

    def f(a, b):
        return LS.descriptor_hinge_hn_loss(
            a, b, _identity_homog(), jnp.asarray(mask), cfg
        )

    val, grads = jax.value_and_grad(f, argnums=(0, 1))(
        jnp.asarray(d), jnp.asarray(wd)
    )
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0.0


def test_global_loss_hinge_hn_wiring(rng):
    cfg = CFG.replace(descriptor_loss="hinge_hn")
    logits = jnp.asarray(rng.standard_normal((B, HC, WC, 65)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 65, (B, HC, WC)), jnp.int32)
    desc = jnp.asarray(rng.standard_normal((B, HC, WC, DD)), jnp.float32)
    wdesc = jnp.asarray(rng.standard_normal((B, HC, WC, DD)), jnp.float32)
    out = LS.global_loss(
        logits, targets, logits, targets, desc, wdesc, _identity_homog(),
        None, cfg,
    )
    want = float(
        LS.descriptor_hinge_hn_loss(desc, wdesc, _identity_homog(), None, cfg)
    )
    np.testing.assert_allclose(float(out["descriptor"]), want, rtol=1e-6)
    np.testing.assert_allclose(
        float(out["total"]),
        float(out["detector"] + out["warped_detector"] + out["descriptor"]),
        rtol=1e-6,
    )


def test_hinge_hn_mask_does_not_dilute_negative_term(rng):
    """The mined-negative term is normalized by the count of REAL mined
    slots: masking out warped cells must not shrink the per-slot negative
    penalty (regression: -inf pool-exhausted slots were zeroed but still
    counted in a plain mean)."""
    cfg = CFG.replace(descriptor_loss="hinge_hn", desc_hn_topk=2)
    # all-identical descriptors: every pair has cos=1, so every mined
    # negative contributes exactly (1 - m_neg) and the positive hinge is 0
    d = np.zeros((B, HC, WC, DD), np.float32)
    d[..., 0] = 1.0
    h = _identity_homog()
    full = float(
        LS.descriptor_hinge_hn_loss(jnp.asarray(d), jnp.asarray(d), h, None, cfg)
    )
    mask = np.ones((B, HC, WC), np.float32)
    mask[:, :, WC // 2:] = 0.0  # half the warped cells invalid
    half = float(
        LS.descriptor_hinge_hn_loss(
            jnp.asarray(d), jnp.asarray(d), h, jnp.asarray(mask), cfg
        )
    )
    expected = cfg.lambda_hn * (1.0 - cfg.negative_margin)
    np.testing.assert_allclose(full, expected, rtol=1e-5)
    np.testing.assert_allclose(half, expected, rtol=1e-5)
