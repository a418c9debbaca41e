"""Keypoint decode: cell softmax -> prob map -> NMS -> fixed-K keypoints.

TPU-native re-design of the reference decode path
(`/root/reference/python/src/netutils.py:56-100`, `nms.py:4-53`):

* the sequential greedy grid NMS (an O(N) host loop over a padded numpy
  grid) is reformulated as **iterative max-pool suppression** — each round
  keeps every point that is the maximum of its ``(2d+1)²`` window among
  not-yet-suppressed points, then suppresses its neighborhood.  A point kept
  this way is exactly a point greedy NMS would keep, so the result equals
  greedy NMS for score-descending suppression chains up to ``num_iters``
  deep (ties may differ: greedy keeps the first in scan order, this keeps
  both);
* ragged point lists become fixed ``(B, K)`` arrays with a validity mask
  (`Keypoints`), so the whole decode jits into one XLA program with static
  shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.ops.labels import restore_prob_map


class Keypoints(NamedTuple):
    """Fixed-size keypoint set: arrays ``(B, K)``; invalid slots zeroed."""

    y: jnp.ndarray       # (B, K) float32 row coordinate
    x: jnp.ndarray       # (B, K) float32 col coordinate
    score: jnp.ndarray   # (B, K) float32 confidence, descending
    valid: jnp.ndarray   # (B, K) bool

    @property
    def num(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)

    def xys(self) -> jnp.ndarray:
        """``(B, K, 3)`` of ``(x, y, score)`` — the reference's public point
        layout (`netutils.py:85-88`)."""
        return jnp.stack([self.x, self.y, self.score], axis=-1)


def softmax65(logits: jnp.ndarray) -> jnp.ndarray:
    """Reference softmax ``exp(l) / (sum(exp(l)) + 1e-5)``
    (`superpoint.py:111-112`), computed stably in float32."""
    logits = logits.astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    # exp(-m) rescales the reference's absolute epsilon into the shifted frame;
    # it underflows to exact softmax when m is large, which is the right limit.
    return e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-5 * jnp.exp(-m))


def decode_prob_map(logits: jnp.ndarray, cell: int) -> jnp.ndarray:
    """``(B, Hc, Wc, 65)`` logits -> ``(B, H, W)`` probability map
    (softmax + dustbin drop + depth-to-space, `superpoint.py:111-115`)."""
    return restore_prob_map(softmax65(logits), cell)


def _maxpool(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1), "SAME"
    )


def nms_priority_key(scores: jnp.ndarray, dist_thresh: int) -> jnp.ndarray:
    """Pack a STRICT total order for NMS into the score mantissa.

    Saturated detectors emit plateaus of bit-identical probabilities
    (measured: 16 equal-score survivors in one 4x4 block on a trained
    checkerboard response); "max of window" suppression keeps every tied
    neighbor where sequential greedy keeps one.  The score's low mantissa
    byte is replaced by a local position priority (unique within any
    ``(2d+1)²`` window for ``dist_thresh <= 7``), built in the integer
    domain: scores >= 0, so their f32 bit patterns order monotonically.
    Ranking is quantized at 2^-15 relative — far below any meaningful
    confidence difference.  Both the XLA and the Pallas NMS consume this
    SAME key, so their kept sets are identical even on plateaus (round-4
    fix: the Pallas kernel previously suppressed on raw scores and kept
    whole tied plateaus).  Ties between points further than the window
    apart remain (same local priority), but such points never interact, so
    the greedy kept set is still unique.
    """
    pos = scores > 0.0
    h, w = scores.shape[-2], scores.shape[-1]
    assert dist_thresh <= 7, "position priority needs (2d+1)^2 <= 256"
    win = 2 * dist_thresh + 1
    yy = jnp.arange(h)[:, None] % win
    xx = jnp.arange(w)[None, :] % win
    prio = (255 - (yy * win + xx)).astype(jnp.int32)
    bits = jax.lax.bitcast_convert_type(scores.astype(jnp.float32), jnp.int32)
    key = jax.lax.bitcast_convert_type(
        (bits & ~jnp.int32(0xFF)) | prio[None], jnp.float32
    )
    return jnp.where(pos, key, 0.0)


def grid_nms(
    scores: jnp.ndarray, dist_thresh: int, num_iters: int = 0
) -> jnp.ndarray:
    """Greedy grid NMS as iterated max-pool suppression.

    ``scores``: ``(B, H, W)`` with non-candidates already zeroed.  Returns the
    same shape with suppressed entries zeroed.  Matches `corners_nms`
    (`nms.py:4-53`) — suppression window is the inf-norm ball of radius
    ``dist_thresh``.

    Each round keeps every point that is the maximum of its window among
    not-yet-suppressed candidates (such a point has no larger candidate
    within ``dist_thresh``, so greedy NMS would keep it too), then
    suppresses its neighborhood.  With ``num_iters=0`` (default) the rounds
    run under `lax.while_loop` until every candidate is either kept or
    suppressed — **exact** greedy equivalence at any suppression-chain
    depth (adversarial monotone ramps need ~W/(2d+1) rounds; typical maps
    converge in <6).  A positive ``num_iters`` unrolls that many fixed
    rounds instead (exact only for chains that deep).

    Tie handling: suppression runs on the strict total order of
    `nms_priority_key` (score with a local position priority packed into
    the low mantissa byte), which guarantees survivors are pairwise >
    ``dist_thresh`` apart in inf-norm — downstream extraction exploits
    this for its block-max top-K reduction.
    """
    key = nms_priority_key(scores, dist_thresh)

    # One round = two max-pools: find window-maxima of the REMAINING
    # candidates (no larger candidate within `dist_thresh`, so sequential
    # greedy keeps them too), then zero their suppression windows.  The
    # carry holds `remaining` directly, so convergence is a plain `any`
    # rather than a third "covered" max-pool (round-5 restructure, shared
    # with the Pallas kernel).
    def one_round(remaining, keep):
        winners = (remaining > 0.0) & (
            remaining == _maxpool(remaining, dist_thresh)
        )
        keep = keep | winners
        dead = _maxpool(winners.astype(jnp.float32), dist_thresh) > 0.0
        return jnp.where(dead, 0.0, remaining), keep

    keep0 = jnp.zeros(scores.shape, bool)
    if num_iters > 0:
        remaining, keep = key, keep0
        for _ in range(num_iters):
            remaining, keep = one_round(remaining, keep)
    else:
        # every round resolves >= one candidate per open region; H*W bounds it
        cap = scores.shape[-2] * scores.shape[-1]

        def cond(carry):
            remaining, keep, i = carry
            return jnp.any(remaining > 0.0) & (i < cap)

        def body(carry):
            remaining, keep, i = carry
            remaining, keep = one_round(remaining, keep)
            return remaining, keep, i + 1

        _, keep, _ = jax.lax.while_loop(
            cond, body, (key, keep0, jnp.zeros((), jnp.int32))
        )
    return jnp.where(keep, scores, 0.0)


def extract_keypoints(
    prob_map: jnp.ndarray, config: SuperPointConfig
) -> Keypoints:
    """Threshold + NMS + border strip + top-K.

    Equivalent of `get_points` (`netutils.py:78-100`): candidates are pixels
    with probability >= ``confidence_thresh``; NMS suppresses the inf-norm
    neighborhood; border points are removed AFTER NMS (so they still suppress
    neighbors, as in the reference); survivors sort by descending confidence.
    """
    scores = jnp.where(prob_map >= config.confidence_thresh, prob_map, 0.0)
    return extract_keypoints_from_scores(scores, config)


def extract_keypoints_from_scores(
    scores: jnp.ndarray, config: SuperPointConfig
) -> Keypoints:
    """NMS + border strip + top-K on an already-thresholded score map (e.g.
    from the fused Pallas decode kernel, `ops/pallas/decode.py`)."""
    b, h, w = scores.shape
    use_pallas = config.use_pallas_nms
    if use_pallas == "on" or (
        use_pallas == "auto" and jax.default_backend() == "tpu"
    ):
        from feature_point_cnn_tpu.ops.pallas.nms import grid_nms_pallas

        scores = grid_nms_pallas(scores, config.nms_dist)
        # whole-map greedy on the same strict-order key as the XLA path
        # (grid_nms_pallas packs it internally): spacing >= nms_dist+1 holds
        exact_nms = True
    else:
        scores = grid_nms(scores, config.nms_dist, config.nms_iters)
        # nms_iters > 0 truncates suppression: deep chains may leave
        # closer-than-radius survivors, voiding the block-max reduction
        exact_nms = config.nms_iters == 0

    br = config.border_remove
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    border_ok = ((ys >= br) & (ys < h - br))[:, None] & (
        (xs >= br) & (xs < w - br)
    )[None, :]
    scores = jnp.where(border_ok[None], scores, 0.0)

    k = min(config.max_keypoints, h * w)
    blk = 4
    if (
        exact_nms
        and config.nms_dist >= blk - 1
        and h % blk == 0
        and w % blk == 0
    ):
        # EXACT top-k over a 16x smaller domain: NMS survivors are >=
        # nms_dist+1 apart in inf-norm, so a (blk x blk) block with
        # blk <= nms_dist+1 holds at most ONE survivor — the per-block max
        # (+ its in-block argmax) is a lossless reduction of the candidate
        # set before the expensive global `lax.top_k` (sorting 307k scores
        # per 480x640 frame dominated the extract cost otherwise).
        hb, wb = h // blk, w // blk
        blocks = scores.reshape(b, hb, blk, wb, blk).transpose(
            0, 1, 3, 2, 4
        ).reshape(b, hb * wb, blk * blk)
        bvals = blocks.max(-1)
        barg = blocks.argmax(-1).astype(jnp.int32)
        top_scores, top_cell = jax.lax.top_k(bvals, min(k, hb * wb))
        sub = jnp.take_along_axis(barg, top_cell, axis=1)
        cy = (top_cell // wb) * blk + sub // blk
        cx = (top_cell % wb) * blk + sub % blk
        if top_scores.shape[1] < k:  # tiny images: pad to the K contract
            pad = k - top_scores.shape[1]
            top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)))
            cy = jnp.pad(cy, ((0, 0), (0, pad)))
            cx = jnp.pad(cx, ((0, 0), (0, pad)))
        valid = top_scores > 0.0
        y = jnp.where(valid, cy, 0).astype(jnp.float32)
        x = jnp.where(valid, cx, 0).astype(jnp.float32)
        return Keypoints(
            y=y, x=x, score=jnp.where(valid, top_scores, 0.0), valid=valid
        )

    flat = scores.reshape(b, h * w)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    valid = top_scores > 0.0
    y = jnp.where(valid, top_idx // w, 0).astype(jnp.float32)
    x = jnp.where(valid, top_idx % w, 0).astype(jnp.float32)
    return Keypoints(y=y, x=x, score=jnp.where(valid, top_scores, 0.0), valid=valid)


def refine_keypoints(prob_map: jnp.ndarray, kp: Keypoints) -> Keypoints:
    """Subpixel refinement: per-axis log-parabola fit through the keypoint's
    3-pixel probability profile (exact for a Gaussian peak).

    Beyond-reference capability (the reference emits integer pixel
    coordinates, `netutils.py:84-88`): the detector's probability mass around
    a corner carries subpixel information that integer argmax discards.
    ``offset = 0.5 (ln v₋ − ln v₊) / (ln v₋ − 2 ln v₀ + ln v₊)``, clipped to
    ±0.5 (NMS guarantees v₀ is the local max, so the true peak lies within
    half a pixel).  ``border_remove >= 1`` keeps the window in-bounds for
    valid points; invalid slots pass through unchanged.
    """
    b, h, w = prob_map.shape
    offs = jnp.arange(-1, 2)
    yy = jnp.clip(
        kp.y[..., None, None].astype(jnp.int32) + offs[None, None, :, None],
        0, h - 1,
    )
    xx = jnp.clip(
        kp.x[..., None, None].astype(jnp.int32) + offs[None, None, None, :],
        0, w - 1,
    )
    vals = jax.vmap(lambda pm, y, x: pm[y, x])(prob_map, yy, xx)  # (B,K,3,3)
    lv = jnp.log(jnp.maximum(vals, 1e-20))

    def parabola(lm, l0, lp):
        denom = lm - 2.0 * l0 + lp
        off = 0.5 * (lm - lp) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        # a non-concave profile (denom >= 0) means no interior peak: keep 0
        return jnp.where(denom < 0.0, jnp.clip(off, -0.5, 0.5), 0.0)

    dy = parabola(lv[..., 0, 1], lv[..., 1, 1], lv[..., 2, 1])
    dx = parabola(lv[..., 1, 0], lv[..., 1, 1], lv[..., 1, 2])
    y = jnp.where(kp.valid, jnp.clip(kp.y + dy, 0.0, h - 1.0), kp.y)
    x = jnp.where(kp.valid, jnp.clip(kp.x + dx, 0.0, w - 1.0), kp.x)
    return kp._replace(y=y, x=x)


def keypoints_to_numpy(kp: Keypoints, batch_index: int = 0):
    """One batch element as the reference's ragged ``3 x N`` ``[x, y, conf]``
    numpy layout (`netutils.py:84-88`) — host-side convenience only."""
    import numpy as np

    v = np.asarray(kp.valid[batch_index])
    pts = np.stack(
        [
            np.asarray(kp.x[batch_index])[v],
            np.asarray(kp.y[batch_index])[v],
            np.asarray(kp.score[batch_index])[v],
        ]
    )
    return pts
