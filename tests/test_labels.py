"""Label codec tests: encode/decode round-trips the reference exposes only
visually (SURVEY.md §4) made deterministic, plus a numpy oracle for the
reference encoding semantics (`/root/reference/python/src/netutils.py:31-75`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.ops import labels as L


CELL = 8
H, W = 48, 64


def _numpy_labels_oracle(points_yx, img_h, img_w, cell, noise):
    """Reference encoding semantics, independently in numpy (test oracle)."""
    pmap = np.zeros((img_h, img_w), np.float32)
    for y, x in points_yx:
        pmap[int(y), int(x)] = 2.0
    hc, wc = img_h // cell, img_w // cell
    cells = (
        pmap.reshape(hc, cell, wc, cell)
        .transpose(0, 2, 1, 3)
        .reshape(hc, wc, cell * cell)
    )
    cells = np.concatenate([cells, np.ones((hc, wc, 1), np.float32)], axis=-1)
    return np.argmax(cells + noise, axis=-1)


def test_space_depth_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    rt = L.depth_to_space(L.space_to_depth(x, CELL), CELL)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))


def test_space_to_depth_channel_order():
    # channel index = dy*cell + dx (row-major within cell)
    x = jnp.zeros((H, W), jnp.float32).at[3, 5].set(1.0)
    cells = L.space_to_depth(x, CELL)
    assert cells[0, 0, 3 * CELL + 5] == 1.0
    assert cells.sum() == 1.0


def test_make_points_labels_matches_oracle(rng):
    pts = np.stack(
        [rng.integers(0, H, 40), rng.integers(0, W, 40)], axis=-1
    ).astype(np.float32)
    valid = np.ones(40, bool)
    key = jax.random.PRNGKey(0)
    got = L.make_points_labels(
        jnp.asarray(pts), jnp.asarray(valid), key, H, W, CELL
    )
    # reproduce the tie-break noise the jax version drew
    noise = np.asarray(
        jax.random.uniform(key, (H // CELL, W // CELL, CELL * CELL + 1), jnp.float32, 0.0, 0.1)
    )
    want = _numpy_labels_oracle(pts, H, W, CELL, noise)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_make_points_labels_ignores_invalid_and_oob():
    pts = jnp.asarray([[1.0, 1.0], [5.0, 5.0], [-3.0, 2.0], [H + 4.0, 1.0]])
    valid = jnp.asarray([True, False, True, True])
    lab = L.make_points_labels(pts, valid, jax.random.PRNGKey(1), H, W, CELL)
    # only point (1,1) encoded: cell (0,0) class dy*8+dx = 9
    assert lab[0, 0] == 9
    assert np.sum(np.asarray(lab) != CELL * CELL) == 1


def test_label_prob_map_roundtrip(rng):
    """points -> labels -> prob map -> argwhere == cell-unique points."""
    # one point per cell to avoid tie-breaking
    ys = rng.integers(0, CELL, (H // CELL, W // CELL)) + np.arange(0, H, CELL)[:, None]
    xs = rng.integers(0, CELL, (H // CELL, W // CELL)) + np.arange(0, W, CELL)[None, :]
    pts = np.stack([ys.ravel(), xs.ravel()], -1).astype(np.float32)
    # drop half the cells
    keep = rng.random(len(pts)) < 0.5
    valid = jnp.asarray(keep)
    lab = L.make_points_labels(jnp.asarray(pts), valid, jax.random.PRNGKey(2), H, W, CELL)
    prob = L.make_prob_map_from_labels(lab[None], CELL)[0]
    got = set(map(tuple, np.argwhere(np.asarray(prob) > 0.5)))
    want = set(map(tuple, pts[keep].astype(int)))
    assert got == want


def test_scale_valid_map():
    mask = jnp.zeros((1, H, W)).at[0, 10, 20].set(1.0)
    cellmask = L.scale_valid_map(mask, CELL)
    assert cellmask.shape == (1, H // CELL, W // CELL)
    assert cellmask[0, 10 // CELL, 20 // CELL] == 1.0
    assert np.asarray(cellmask).sum() == 1.0


def test_batch_labels_shape(rng):
    pts = jnp.asarray(rng.random((4, 16, 2)) * [H - 1, W - 1], jnp.float32)
    valid = jnp.ones((4, 16), bool)
    lab = L.make_points_labels_batch(pts, valid, jax.random.PRNGKey(3), H, W, CELL)
    assert lab.shape == (4, H // CELL, W // CELL)
    assert lab.dtype == jnp.int32
