"""HPatches-format eval: homography conventions, loader, protocol plumbing.

The real benchmark data is absent from this environment, so these tests
build a tiny on-disk fixture in the exact published layout
(``<seq>/k.ppm`` + ``H_1_k`` row-major 3x3 text) and verify the geometry
end-to-end: coordinate-convention conversion, per-image resize scaling,
and the full protocol on an identity sequence (repeatability must be 1.0
when view k IS view 1, whatever the weights)."""

import numpy as np
import pytest

from feature_point_cnn_tpu.eval.hpatches import (
    evaluate_hpatches,
    hpatches_flat_homography,
    iter_sequences,
)


def _project(h_mat, xy):
    """Apply a 3x3 homography to (N, 2) (x, y) points."""
    p = np.concatenate([xy, np.ones((len(xy), 1))], axis=1) @ np.asarray(h_mat).T
    return p[:, :2] / p[:, 2:]


def test_flat_homography_matches_direct_projection():
    """mat2flat(inv(H')) convention: warp_points(p1_yx, h_flat) must land
    exactly where the scaled HPatches matrix sends the (x, y) points."""
    import jax.numpy as jnp

    from feature_point_cnn_tpu.geometry.homography import warp_points

    rng = np.random.default_rng(0)
    h_mat = np.eye(3) + rng.normal(0, 0.05, (3, 3))
    h_mat[2, 2] = 1.0
    src1_hw, srck_hw, dst_hw = (480, 640), (360, 480), (240, 320)
    h_flat = hpatches_flat_homography(h_mat, src1_hw, srck_hw, dst_hw)

    # points in RESIZED view-1 pixels (y, x)
    pts_yx = rng.uniform(20, 200, (17, 2)).astype(np.float32)
    got = np.asarray(warp_points(jnp.asarray(pts_yx), jnp.asarray(h_flat)))

    # direct route: unscale to original view 1, apply H, scale to resized k
    xy1 = pts_yx[:, ::-1] * [src1_hw[1] / dst_hw[1], src1_hw[0] / dst_hw[0]]
    xyk = _project(h_mat, xy1)
    want_yx = (xyk * [dst_hw[1] / srck_hw[1], dst_hw[0] / srck_hw[0]])[:, ::-1]
    np.testing.assert_allclose(got, want_yx, atol=1e-2)


@pytest.fixture()
def hpatches_fixture(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    base = (rng.uniform(0, 1, (120, 160)) * 255).astype(np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 1.5)

    # identity sequence: every view IS view 1
    d = tmp_path / "i_fake"
    d.mkdir()
    for k in range(1, 4):
        cv2.imwrite(str(d / f"{k}.ppm"), cv2.cvtColor(base, cv2.COLOR_GRAY2BGR))
        if k > 1:
            np.savetxt(d / f"H_1_{k}", np.eye(3))

    # viewpoint sequence with a real warp and a different image size
    v = tmp_path / "v_fake"
    v.mkdir()
    h_mat = np.array([[1.0, 0.02, 8.0], [-0.015, 1.0, -5.0], [1e-5, -2e-5, 1.0]])
    cv2.imwrite(str(v / "1.ppm"), cv2.cvtColor(base, cv2.COLOR_GRAY2BGR))
    warped = cv2.warpPerspective(base, h_mat, (160, 120))
    cv2.imwrite(str(v / "2.ppm"), cv2.cvtColor(warped, cv2.COLOR_GRAY2BGR))
    np.savetxt(v / "H_1_2", h_mat)

    # a non-sequence dir that must be skipped
    (tmp_path / "not_a_seq").mkdir()
    return tmp_path


def test_iter_sequences_finds_layout(hpatches_fixture):
    names = [n for n, _ in iter_sequences(str(hpatches_fixture))]
    assert names == ["i_fake", "v_fake"]


def test_protocol_identity_sequence_is_perfect(hpatches_fixture):
    """On the identity sequence the two views are bit-identical, so any
    deterministic frontend must report repeatability 1.0 and perfect
    matching — this pins the whole pipeline's coordinate plumbing."""
    from feature_point_cnn_tpu.config import SuperPointConfig
    from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend

    cfg = SuperPointConfig(max_keypoints=128)
    fe = SuperPointFrontend(cfg)  # random init: determinism is what matters

    out = evaluate_hpatches(fe, str(hpatches_fixture), shape=(120, 160))
    ill = out["illumination"]
    assert ill["pairs"] == 2.0
    assert ill["repeatability"] == pytest.approx(1.0)
    assert ill["match_precision"] == pytest.approx(1.0)
    assert ill["localization_error"] == pytest.approx(0.0, abs=1e-5)
    # the viewpoint pair ran too and produced finite metrics
    assert out["viewpoint"]["pairs"] == 1.0
    assert np.isfinite(out["viewpoint"]["repeatability"])
    assert out["overall"]["pairs"] == 3.0
