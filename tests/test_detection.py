"""Keypoint decode tests: iterative max-pool NMS vs a greedy oracle, and the
full threshold/NMS/border/top-K extraction vs reference `get_points`
semantics (`/root/reference/python/src/netutils.py:78-100`, `nms.py:4-53`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.ops import detection as D

H, W = 48, 64


def _greedy_nms_oracle(scores, dist):
    """Reference greedy grid NMS semantics, independently in numpy."""
    ys, xs = np.nonzero(scores > 0)
    conf = scores[ys, xs]
    order = np.argsort(-conf, kind="stable")
    alive = np.ones(scores.shape, bool)
    kept = np.zeros(scores.shape, bool)
    for i in order:
        y, x = ys[i], xs[i]
        if not alive[y, x]:
            continue
        y0, y1 = max(y - dist, 0), min(y + dist + 1, scores.shape[0])
        x0, x1 = max(x - dist, 0), min(x + dist + 1, scores.shape[1])
        alive[y0:y1, x0:x1] = False
        kept[y, x] = True
    return np.where(kept, scores, 0.0)


def _random_scores(rng, density=0.02):
    scores = np.zeros((H, W), np.float32)
    n = int(H * W * density)
    ys = rng.integers(0, H, n)
    xs = rng.integers(0, W, n)
    # permutation-spaced values: pairwise gaps >= 0.9/n, far above the
    # 2^-15-relative ranking quantization grid_nms applies for its
    # deterministic tie-break, so oracle order == kernel order
    vals = (rng.permutation(n).astype(np.float32) + 1.0) / n * 0.9 + 0.05
    scores[ys, xs] = vals
    return scores


def test_grid_nms_matches_greedy(rng):
    for trial in range(8):
        scores = _random_scores(rng, density=0.03 + 0.03 * trial)
        want = _greedy_nms_oracle(scores, 4)
        got = np.asarray(D.grid_nms(jnp.asarray(scores[None]), 4, num_iters=6))[0]
        np.testing.assert_array_equal(got, want)


def test_grid_nms_isolated_points_survive(rng):
    scores = np.zeros((H, W), np.float32)
    scores[10, 10] = 0.5
    scores[30, 40] = 0.2
    got = np.asarray(D.grid_nms(jnp.asarray(scores[None]), 4))[0]
    np.testing.assert_array_equal(got, scores)


def test_grid_nms_adjacent_suppression():
    scores = np.zeros((H, W), np.float32)
    scores[10, 10] = 0.5
    scores[10, 13] = 0.4   # within dist 4 of the first -> suppressed
    scores[10, 18] = 0.3   # outside window of kept (10,10) -> kept
    got = np.asarray(D.grid_nms(jnp.asarray(scores[None]), 4))[0]
    assert got[10, 10] == 0.5
    assert got[10, 13] == 0.0
    assert got[10, 18] == 0.3


def test_grid_nms_chain():
    """A > B > C in a line: greedy keeps A and C (B suppressed by A, C only
    blocked by B which is gone) — needs >1 suppression round."""
    scores = np.zeros((H, W), np.float32)
    scores[20, 10] = 0.9   # A
    scores[20, 13] = 0.8   # B (within 4 of A)
    scores[20, 16] = 0.7   # C (within 4 of B, not of A)
    got = np.asarray(D.grid_nms(jnp.asarray(scores[None]), 4, num_iters=4))[0]
    assert got[20, 10] == np.float32(0.9)
    assert got[20, 13] == 0.0
    assert got[20, 16] == np.float32(0.7)


def test_softmax65_matches_reference_formula(rng):
    logits = jnp.asarray(rng.standard_normal((2, 3, 4, 65)) * 3, jnp.float32)
    got = np.asarray(D.softmax65(logits))
    l = np.asarray(logits, np.float64)
    want = np.exp(l) / (np.exp(l).sum(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # large logits must not overflow (the reference formula would)
    big = jnp.full((1, 1, 1, 65), 300.0)
    assert np.isfinite(np.asarray(D.softmax65(big))).all()


def test_extract_keypoints_matches_reference_pipeline(rng):
    cfg = SuperPointConfig(max_keypoints=H * W)
    prob = _random_scores(rng, 0.05)
    # reference pipeline: thresh -> greedy NMS -> sort -> border strip
    thresholded = np.where(prob >= cfg.confidence_thresh, prob, 0.0)
    nmsed = _greedy_nms_oracle(thresholded, cfg.nms_dist)
    br = cfg.border_remove
    nmsed[:br, :] = 0
    nmsed[-br:, :] = 0
    nmsed[:, :br] = 0
    nmsed[:, -br:] = 0
    want = sorted(
        [(-s, y, x) for (y, x), s in np.ndenumerate(nmsed) if s > 0]
    )

    kp = D.extract_keypoints(jnp.asarray(prob[None]), cfg)
    n = int(kp.num[0])
    assert n == len(want)
    got = list(
        zip(
            -np.asarray(kp.score[0])[:n],
            np.asarray(kp.y[0])[:n].astype(int),
            np.asarray(kp.x[0])[:n].astype(int),
        )
    )
    for (ws, wy, wx), (gs, gy, gx) in zip(want, got):
        assert (wy, wx) == (gy, gx)
        np.testing.assert_allclose(ws, gs, rtol=1e-6)
    # invalid slots zeroed
    assert np.all(np.asarray(kp.score[0])[n:] == 0)


def test_extract_keypoints_fixed_k(rng):
    cfg = SuperPointConfig(max_keypoints=16)
    prob = jnp.asarray(_random_scores(rng, 0.1)[None])
    kp = D.extract_keypoints(prob, cfg)
    assert kp.y.shape == (1, 16)
    # scores descending
    s = np.asarray(kp.score[0])
    assert np.all(np.diff(s) <= 1e-9)


def test_decode_prob_map_places_cell_probability():
    logits = jnp.full((1, 2, 2, 65), -10.0).at[0, 0, 0, 9].set(10.0)
    prob = D.decode_prob_map(logits, 8)
    assert prob.shape == (1, 16, 16)
    assert np.asarray(prob)[0, 1, 1] > 0.99  # class 9 = (dy=1, dx=1)


def test_grid_nms_convergence_mode_dense(rng):
    """Default nms_iters=0 (run to convergence) equals greedy on
    adversarially dense maps — every pixel a candidate."""
    for trial in range(3):
        scores = (
            rng.random((H, W)).astype(np.float32) * 0.9 + 0.05
        )  # 100% density
        want = _greedy_nms_oracle(scores, 4)
        got = np.asarray(D.grid_nms(jnp.asarray(scores[None]), 4))[0]
        np.testing.assert_array_equal(got, want)


def test_grid_nms_convergence_mode_monotone_ramp():
    """A monotone ramp needs ~W/(2d+1) suppression rounds — far deeper than
    any fixed small round count; convergence mode must still match greedy."""
    # strictly monotone, all-unique values (tie behavior differs from greedy
    # by design: greedy keeps the first in scan order, max-pool keeps both)
    ramp = (
        np.arange(H * W, dtype=np.float32).reshape(H, W) / (H * W) * 0.9 + 0.05
    )
    want = _greedy_nms_oracle(ramp, 4)
    got = np.asarray(D.grid_nms(jnp.asarray(ramp[None]), 4))[0]
    np.testing.assert_array_equal(got, want)
    # sanity: the old shipped depth (4 rounds) is NOT enough here
    shallow = np.asarray(D.grid_nms(jnp.asarray(ramp[None]), 4, num_iters=4))[0]
    assert (shallow > 0).sum() < (want > 0).sum()


def _plateau_maps():
    """Adversarial tie inputs: bit-identical score plateaus — the saturated
    detector failure mode measured on trained checkpoints (RESULTS.md: "16
    equal-score survivors in one 4x4 block" on a checkerboard response)."""
    a = np.zeros((H, W), np.float32)
    a[8:28, 8:28] = 0.25  # one constant block
    b = np.zeros((H, W), np.float32)
    b[::2, ::2] = 0.9  # saturated checkerboard: every other pixel tied
    c = np.full((H, W), 0.015, np.float32)  # whole-map plateau
    d = np.zeros((H, W), np.float32)
    d[10:14, 10:14] = 0.5  # tied blocks closer than the window + an
    d[10:14, 20:24] = 0.5  # isolated tied point
    d[30, 40] = 0.5
    return [a, b, c, d]


def _greedy_key_oracle(scores, dist):
    """Greedy NMS on the strict-total-order key both implementations use:
    the unique deterministic kept set on tied inputs."""
    key = np.asarray(D.nms_priority_key(jnp.asarray(scores[None]), dist))[0]
    kept_key = _greedy_nms_oracle(key, dist)
    return np.where(kept_key > 0, scores, 0.0)


def _assert_spacing(kept, dist):
    """Survivors must be pairwise > dist apart in inf-norm — the invariant
    the block-max top-K reduction in extract_keypoints assumes."""
    ys, xs = np.nonzero(kept)
    for i in range(len(ys)):
        d_inf = np.maximum(np.abs(ys - ys[i]), np.abs(xs - xs[i]))
        d_inf[i] = 10**6
        assert len(ys) == 1 or d_inf.min() > dist


def test_grid_nms_plateau_ties_match_key_oracle():
    """Bit-identical plateaus resolve to the deterministic key-order greedy
    result — NOT to 'keep every tied neighbor' (round-3/4 fix)."""
    for scores in _plateau_maps():
        want = _greedy_key_oracle(scores, 4)
        got = np.asarray(D.grid_nms(jnp.asarray(scores[None]), 4))[0]
        np.testing.assert_array_equal(got, want)
        _assert_spacing(got, 4)
        # plateau candidates must still be covered: every positive input
        # pixel lies within dist of some survivor
        ys, xs = np.nonzero(scores > 0)
        ky, kx = np.nonzero(got)
        for y, x in zip(ys, xs):
            assert (np.maximum(np.abs(ky - y), np.abs(kx - x)) <= 4).any()


def test_grid_nms_convergence_under_jit(rng):
    scores = _random_scores(rng, 0.2)
    f = jax.jit(lambda s: D.grid_nms(s, 4))
    got = np.asarray(f(jnp.asarray(scores[None])))[0]
    np.testing.assert_array_equal(got, _greedy_nms_oracle(scores, 4))


def test_refine_keypoints_recovers_subpixel_peak():
    """A Gaussian blob centered between pixels: center-of-mass refinement
    must move the integer argmax toward the true subpixel center."""
    import jax.numpy as jnp

    from feature_point_cnn_tpu.ops.detection import Keypoints, refine_keypoints

    h, w = 32, 32
    cy, cx = 15.6, 16.3
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    prob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.2 ** 2))
    iy, ix = np.unravel_index(np.argmax(prob), prob.shape)

    kp = Keypoints(
        y=jnp.asarray([[float(iy), 0.0]]),
        x=jnp.asarray([[float(ix), 0.0]]),
        score=jnp.asarray([[1.0, 0.0]]),
        valid=jnp.asarray([[True, False]]),
    )
    out = refine_keypoints(jnp.asarray(prob)[None], kp)
    err_int = np.hypot(iy - cy, ix - cx)
    err_ref = np.hypot(float(out.y[0, 0]) - cy, float(out.x[0, 0]) - cx)
    assert err_ref < err_int
    assert err_ref < 0.05  # log-parabola is exact for a Gaussian peak
    # invalid slot untouched
    assert float(out.y[0, 1]) == 0.0 and float(out.x[0, 1]) == 0.0


def test_refine_keypoints_border_safe():
    import jax.numpy as jnp

    from feature_point_cnn_tpu.ops.detection import Keypoints, refine_keypoints

    prob = np.random.default_rng(0).random((1, 16, 16)).astype(np.float32)
    kp = Keypoints(
        y=jnp.asarray([[0.0, 15.0]]),
        x=jnp.asarray([[0.0, 15.0]]),
        score=jnp.asarray([[1.0, 1.0]]),
        valid=jnp.asarray([[True, True]]),
    )
    out = refine_keypoints(jnp.asarray(prob), kp)
    assert np.all(np.asarray(out.y) >= 0) and np.all(np.asarray(out.y) <= 15)
    assert np.all(np.asarray(out.x) >= 0) and np.all(np.asarray(out.x) <= 15)


def test_block_reduced_topk_matches_flat_topk(rng):
    """The 4x4 block-max reduction before `lax.top_k` is EXACT whenever NMS
    guarantees >= nms_dist+1 inf-norm spacing: the extraction must return
    exactly the numpy oracle's top-K of the NMS'd, border-stripped map."""
    import jax.numpy as jnp

    from feature_point_cnn_tpu.config import SuperPointConfig
    from feature_point_cnn_tpu.ops.detection import (
        extract_keypoints_from_scores,
        grid_nms,
    )

    cfg = SuperPointConfig(max_keypoints=128)
    # distinct positive scores (ties would permute equal-score tails)
    scores = jnp.asarray(
        rng.permutation(48 * 64).reshape(1, 48, 64).astype(np.float32)
        / (48 * 64)
    )
    fast = extract_keypoints_from_scores(scores, cfg)

    # numpy oracle: NMS'd map -> border strip -> global sort
    s = np.asarray(grid_nms(scores, cfg.nms_dist, 0))[0].copy()
    br = cfg.border_remove
    s[:br, :] = 0; s[-br:, :] = 0; s[:, :br] = 0; s[:, -br:] = 0
    ys, xs = np.nonzero(s)
    vals = s[ys, xs]
    order = np.argsort(-vals)[: cfg.max_keypoints]
    expected = {
        (float(ys[i]), float(xs[i]), round(float(vals[i]), 6)) for i in order
    }

    v = np.asarray(fast.valid[0])
    got = {
        (float(y), float(x), round(float(sc), 6))
        for y, x, sc in zip(
            np.asarray(fast.y[0])[v],
            np.asarray(fast.x[0])[v],
            np.asarray(fast.score[0])[v],
        )
    }
    assert got == expected
    assert len(got) > 10
