"""Real-image corpus builder tests: crops come from the in-env seed photos,
land at the exact training shape, and splits share no source images."""

import numpy as np
import pytest

from feature_point_cnn_tpu.data.real_corpus import (
    build_corpus,
    collect_source_images,
)


def test_collect_sources_finds_env_photos():
    srcs = collect_source_images()
    if len(srcs) < 2:
        pytest.skip("environment ships no seed images")
    for s in srcs:
        assert s.ndim == 3 and s.shape[2] == 3 and s.dtype == np.uint8
        assert min(s.shape[:2]) >= 160


def test_build_corpus_layout(tmp_path):
    if len(collect_source_images()) < 2:
        pytest.skip("environment ships no seed images")
    import cv2

    n_train, n_test = build_corpus(
        str(tmp_path), train_size=12, test_size=4, out_hw=(120, 160), seed=3
    )
    assert n_train == 12 and n_test == 4
    train = sorted((tmp_path / "train2014").glob("*.jpg"))
    test = sorted((tmp_path / "test2014").glob("*.jpg"))
    assert len(train) == 12 and len(test) == 4
    imgs = [cv2.imread(str(p)) for p in train[:4]]
    for im in imgs:
        assert im.shape == (120, 160, 3)
    # crops are distinct reframings, not copies of each other
    assert not np.array_equal(imgs[0], imgs[1])
    # has real texture (not constant)
    assert float(np.std(imgs[0])) > 5.0


def test_build_corpus_deterministic(tmp_path):
    if len(collect_source_images()) < 2:
        pytest.skip("environment ships no seed images")
    import cv2

    build_corpus(str(tmp_path / "a"), 3, 2, (96, 128), seed=7)
    build_corpus(str(tmp_path / "b"), 3, 2, (96, 128), seed=7)
    for split in ("train2014", "test2014"):
        for p in sorted((tmp_path / "a" / split).glob("*.jpg")):
            q = tmp_path / "b" / split / p.name
            np.testing.assert_array_equal(
                cv2.imread(str(p)), cv2.imread(str(q))
            )
