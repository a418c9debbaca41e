"""Real-image corpus builder for the self-labeling stage.

The reference's stage-2/3 pipeline consumes COCO train2014/test2014
(`/root/reference/python/src/preprocess_coco.py:41-74`).  This environment
has no COCO download, but it does ship a couple dozen real photographs and
high-texture screenshots inside its Python packages (sklearn's sample
photos, matplotlib's grace_hopper, pygame's webcam/doc images).  This module
expands those seeds into a corpus of thousands of DISTINCT crops — random
window, scale, flip, rotation by 90°, brightness/contrast jitter — laid out
as ``<out>/train2014`` and ``<out>/test2014`` JPEGs so the standard COCO
self-label flow (`main.py train --coco-path <out> --generate-points`)
runs on it unchanged.

Crops are geometric reframings, not synthetic renderings: every pixel comes
from a real source image, which is what the pseudo-labeling stage needs
(natural corners at many scales, unknown ground truth).

Usage:
  python -m feature_point_cnn_tpu.data.real_corpus /root/data/real \
      --train-size 6000 --test-size 600
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

# In-env seed photo locations.  Processed/binary duplicates of the pygame
# webcam scene (mask/thresh variants) are excluded — near-duplicate binary
# frames add no texture diversity.
DEFAULT_PATTERNS = (
    "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/images/*.jpg",
    "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated/_images/*.jpg",
    "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated/_images/*.png",
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/*.jpg",
)
_EXCLUDE_SUBSTRINGS = ("mask", "thresh", "_lofi", "_logo", "logo2")
MIN_SOURCE_HW = 160


def collect_source_images(
    patterns: Sequence[str] = DEFAULT_PATTERNS,
    min_hw: int = MIN_SOURCE_HW,
) -> List[np.ndarray]:
    """Load every usable seed image as ``(H, W, 3)`` uint8 RGB."""
    from PIL import Image

    out: List[np.ndarray] = []
    for pattern in patterns:
        for path in sorted(glob.glob(pattern)):
            name = Path(path).name.lower()
            if any(s in name for s in _EXCLUDE_SUBSTRINGS):
                continue
            try:
                img = Image.open(path).convert("RGB")
            except Exception:
                continue
            if img.width < min_hw or img.height < min_hw:
                continue
            out.append(np.asarray(img))
    return out


def _random_crop(
    rng: np.random.Generator, src: np.ndarray, out_hw: Tuple[int, int]
) -> np.ndarray:
    """One distinct reframing: random window at the target aspect ratio and
    a random scale, resized to ``out_hw``, with flip / 90°-rotation /
    photometric jitter."""
    import cv2

    h, w = src.shape[:2]
    out_h, out_w = out_hw
    if rng.random() < 0.25:
        src = np.ascontiguousarray(np.rot90(src, rng.integers(1, 4)))
        h, w = src.shape[:2]

    aspect = out_w / out_h
    # largest target-aspect window that fits, scaled down by s
    max_w = min(w, h * aspect)
    s = rng.uniform(0.35, 1.0)
    crop_w = max(int(max_w * s), 32)
    crop_h = max(int(crop_w / aspect), 24)
    x0 = rng.integers(0, w - crop_w + 1)
    y0 = rng.integers(0, h - crop_h + 1)
    crop = src[y0 : y0 + crop_h, x0 : x0 + crop_w]
    crop = cv2.resize(crop, (out_w, out_h), interpolation=cv2.INTER_AREA)

    if rng.random() < 0.5:
        crop = crop[:, ::-1]
    # mild photometric jitter (the heavy augmentation happens on-device at
    # train time; this only decorrelates crops of the same source)
    gain = rng.uniform(0.85, 1.15)
    bias = rng.uniform(-12, 12)
    crop = np.clip(crop.astype(np.float32) * gain + bias, 0, 255)
    return crop.astype(np.uint8)


def _texture_energy(crop: np.ndarray) -> float:
    """Mean Sobel gradient magnitude of the gray crop in [0, 1] units."""
    import cv2

    g = cv2.cvtColor(crop, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
    gx = cv2.Sobel(g, cv2.CV_32F, 1, 0)
    gy = cv2.Sobel(g, cv2.CV_32F, 0, 1)
    return float(np.sqrt(gx * gx + gy * gy).mean())


# Crops below this gradient floor are rejected (re-sampled): flat regions
# (sky, page margins, solid UI backgrounds) carry no interest points, so the
# self-label teacher correctly labels them empty — and a corpus full of
# empty labels starves the joint phase (measured round 2: 4 of 6 test crops
# were flat, teacher prob ceiling ~6e-5 on them).  Live crops measured
# 0.07-0.33 on this scale.
MIN_TEXTURE_ENERGY = 0.05
_CROP_ATTEMPTS = 12


def _textured_crop(
    rng: np.random.Generator,
    srcs: List[np.ndarray],
    out_hw: Tuple[int, int],
) -> np.ndarray:
    """Sample crops until one clears the texture floor (best-of-N fallback
    so all-flat sources cannot loop forever)."""
    best, best_e = None, -1.0
    for _ in range(_CROP_ATTEMPTS):
        src = srcs[int(rng.integers(0, len(srcs)))]
        crop = _random_crop(rng, src, out_hw)
        e = _texture_energy(crop)
        if e > best_e:
            best, best_e = crop, e
        if e >= MIN_TEXTURE_ENERGY:
            break
    return best


def build_corpus(
    out_dir: str,
    train_size: int = 6000,
    test_size: int = 600,
    out_hw: Tuple[int, int] = (240, 320),
    seed: int = 0,
    patterns: Sequence[str] = DEFAULT_PATTERNS,
) -> Tuple[int, int]:
    """Write ``train2014``/``test2014`` JPEG splits; returns written counts.

    Source images are partitioned between the splits (4:1) so test crops
    never share pixels with train crops."""
    import cv2

    sources = collect_source_images(patterns)
    if len(sources) < 2:
        raise RuntimeError(
            f"need at least 2 seed images, found {len(sources)}"
        )
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(sources))
    n_test_src = max(1, len(sources) // 5)
    test_src = [sources[i] for i in order[:n_test_src]]
    train_src = [sources[i] for i in order[n_test_src:]]

    counts = []
    for split, srcs, n_items in (
        ("train2014", train_src, train_size),
        ("test2014", test_src, test_size),
    ):
        split_dir = Path(out_dir, split)
        split_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n_items):
            crop = _textured_crop(rng, srcs, out_hw)
            cv2.imwrite(
                str(split_dir / f"real_{i:06d}.jpg"),
                cv2.cvtColor(crop, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 92],
            )
        counts.append(n_items)
        print(f"[real_corpus] {split}: {n_items} crops from {len(srcs)} sources")
    return counts[0], counts[1]


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("out_dir")
    p.add_argument("--train-size", type=int, default=6000)
    p.add_argument("--test-size", type=int, default=600)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    build_corpus(
        a.out_dir, a.train_size, a.test_size, (a.height, a.width), a.seed
    )


if __name__ == "__main__":
    main()
