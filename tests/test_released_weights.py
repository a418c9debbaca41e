"""Smoke tests for COMMITTED weight snapshots (`weights/*.npz`).

Round-2 lesson (VERDICT r2): the one committed artifact emitted a uniform
1/65 softmax — every cell cleared the reference operating threshold
(`confidence_thresh=0.015 < 1/65`, settings.py:4-8), so all K keypoint
slots fired as noise and nothing in the suite noticed.  These tests load
each committed file through the standard ``--weights-path`` semantics
(`inference/wrapper.py::load_variables`) and assert actual detection
capability, so a broken export can never be committed silently again.

Skipped only when `weights/` holds no snapshots.
"""

from pathlib import Path

import numpy as np
import pytest

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig

WEIGHTS_DIR = Path(__file__).resolve().parent.parent / "weights"
SNAPSHOTS = sorted(WEIGHTS_DIR.glob("*.npz")) if WEIGHTS_DIR.is_dir() else []

pytestmark = pytest.mark.skipif(
    not SNAPSHOTS, reason="no committed weight snapshots under weights/"
)

# evaluation pairs are cheap but each is a full 240x320 forward on CPU;
# keep the count small — uniform-softmax failure needs only one image.
# 8 pairs keeps the repeatability estimate's sampling noise within ~0.1
# (measured: 4-pair samples ranged 0.28-0.67 for the same converged model)
N_PAIRS = 8
SHAPE = (240, 320)


def _frontend(path: Path, **cfg_kw):
    from feature_point_cnn_tpu.inference.wrapper import (
        SuperPointFrontend,
        load_variables,
    )

    cfg = SuperPointConfig(max_keypoints=512, **cfg_kw)
    # the exact CLI path: --weights-path weights/<file>.npz
    _, variables = load_variables(cfg, str(path))
    return SuperPointFrontend(cfg, variables=variables)


def _eval_images(path: Path):
    """Synthetic corner-rich scenes for MagicPoint-phase snapshots (their
    training domain); real textured crops for joint/SuperPoint snapshots.
    All returned as ``(H, W, 3) float32 in [0, 1]`` (the frontend input
    contract, `inferencewrapper.py:29-46`)."""
    from feature_point_cnn_tpu.eval.benchmark import synthetic_images

    if "magicpoint" in path.name.lower():
        return list(synthetic_images(N_PAIRS, SHAPE, seed=7))
    from feature_point_cnn_tpu.data.real_corpus import (
        collect_source_images,
        _textured_crop,
    )

    srcs = collect_source_images()
    rng = np.random.default_rng(7)
    return [
        _textured_crop(rng, srcs, SHAPE)[0].astype(np.float32) / 255.0
        for _ in range(N_PAIRS)
    ]


@pytest.mark.parametrize("snapshot", SNAPSHOTS, ids=lambda p: p.name)
def test_snapshot_detects(snapshot):
    """(a) prob max >> 1/65 (not a uniform softmax), (b) detections well
    under the K cap, and at least a handful fire on a corner-rich scene."""
    fe = _frontend(snapshot)
    k = fe.config.max_keypoints
    counts = []
    for img in _eval_images(snapshot):
        kp, _ = fe.extract(np.asarray(img, np.float32)[None])
        score = np.asarray(kp.score[0])
        valid = np.asarray(kp.valid[0])
        n = int(valid.sum())
        counts.append(n)
        assert score.max() > 0.1, (
            f"{snapshot.name}: prob max {score.max():.4f} is near the "
            f"uniform 1/65 floor — untrained or collapsed detector"
        )
        assert n >= 1, f"{snapshot.name}: nothing fires on scene {len(counts)}"
        if n > int(0.75 * k):
            # a heavily textured real crop can legitimately put > K cells
            # above the low reference threshold (0.015, settings.py:4-8);
            # the round-2 failure mode is different: EVERY score pinned at
            # ~1/65 = 0.0154. Distinguish by score spread among survivors.
            sv = score[valid.astype(bool)]
            assert float(np.median(sv)) > 0.03 and float(sv.max()) > 0.2, (
                f"{snapshot.name}: cap saturated with flat scores "
                f"(median {np.median(sv):.4f}, max {sv.max():.4f}) — "
                f"uniform-softmax noise, not a dense textured scene"
            )
    # sparse scenes (a lone polygon) legitimately carry few corners; the
    # MEAN across scenes separates a working detector from a dead one
    # (converged r3 model measures 9.4 on these 8 scenes with exact greedy
    # NMS; a dead detector ~0, a uniform softmax saturates the K cap)
    assert float(np.mean(counts)) >= 6, (
        f"{snapshot.name}: mean detections {np.mean(counts):.1f} < 6 "
        f"across {len(counts)} scenes ({counts})"
    )
    # the round-2 broken snapshot saturated the cap on ALL images; a
    # working detector modulates its count with scene content
    assert min(counts) < int(0.75 * k), (
        f"{snapshot.name}: all {len(counts)} scenes saturate K={k} ({counts})"
    )


@pytest.mark.parametrize("snapshot", SNAPSHOTS, ids=lambda p: p.name)
def test_snapshot_repeatability(snapshot):
    """Detections must be repeatable under viewpoint change: >= 0.5 mean
    repeatability @3px over fixed warped pairs (VERDICT r2 bar; round-2
    trained models measured 0.57 synthetic / 0.69 real)."""
    from feature_point_cnn_tpu.eval.benchmark import evaluate_pairs

    fe = _frontend(snapshot)
    out = evaluate_pairs(
        fe, _eval_images(snapshot), HomographyConfig(), eps=3.0, seed=3
    )
    assert out["repeatability"] >= 0.5, (
        f"{snapshot.name}: repeatability {out['repeatability']:.3f} < 0.5 "
        f"over {int(out['pairs'])} warped pairs"
    )


def test_released_path_fallback_globs(tmp_path):
    """Pointer-less fallback: newest-by-mtime superpoint*.npz, then ANY
    *.npz (regression: `glob() or glob()` ORed two always-truthy
    generators, so the second pattern was never consulted)."""
    import os
    import time

    import numpy as np
    import pytest

    from feature_point_cnn_tpu.utils.weights import released_path

    with pytest.raises(FileNotFoundError):
        released_path(tmp_path)

    np.savez(tmp_path / "magicpoint_only.npz", a=np.zeros(1))
    assert released_path(tmp_path).endswith("magicpoint_only.npz")

    np.savez(tmp_path / "superpoint_r3.npz", a=np.zeros(1))
    np.savez(tmp_path / "superpoint_r10.npz", a=np.zeros(1))
    now = time.time()
    os.utime(tmp_path / "superpoint_r10.npz", (now - 100, now - 100))
    # mtime order, not lexical: r3 is newer than r10 here
    assert released_path(tmp_path).endswith("superpoint_r3.npz")

    (tmp_path / "RELEASED").write_text("superpoint_r10.npz\n")
    assert released_path(tmp_path).endswith("superpoint_r10.npz")
