"""Two-view evaluation harness: HPatches-protocol metrics over warped pairs.

Builds evaluation pairs from any image source — an image directory, a
labeled npz dataset, or the synthetic-shape generator (so the harness runs
fully offline) — by warping each image with sampled homographies, running
the frontend on both views, and aggregating `eval.metrics` over pairs.

Usage:
    python -m feature_point_cnn_tpu.eval.benchmark --weights-path CKPT \
        [--source synthetic|<dir>] [--pairs 50] [--eps 3.0]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
from feature_point_cnn_tpu.eval.metrics import matching_metrics, repeatability
from feature_point_cnn_tpu.geometry.homography import sample_homography
from feature_point_cnn_tpu.geometry.warp import warp_image
from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend


def synthetic_images(n: int, shape: Tuple[int, int], seed: int = 0) -> Iterable[np.ndarray]:
    from feature_point_cnn_tpu.data.synthetic_shapes import (
        PRIMITIVES,
        SyntheticShapeGenerator,
    )

    gen = SyntheticShapeGenerator(
        np.random.default_rng(seed),
        image_size=(shape[0] * 4, shape[1] * 4),
        out_size=shape,
    )
    corner_rich = [p for p in PRIMITIVES if p not in ("ellipses", "gaussian_noise")]
    for i in range(n):
        image, _ = gen.sample(corner_rich[i % len(corner_rich)])
        yield np.repeat(image[0][..., None], 3, axis=-1)


def directory_images(path: str, shape: Tuple[int, int]) -> Iterable[np.ndarray]:
    from feature_point_cnn_tpu.selflabel.coco import load_and_crop

    for p in sorted(Path(path).iterdir()):
        if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp"):
            img = load_and_crop(str(p), shape)
            if img is not None:
                yield img
        elif p.suffix == ".npz":
            from feature_point_cnn_tpu.data.datasets import read_npz_item

            yield read_npz_item(str(p))[0]


def evaluate_pairs(
    frontend: SuperPointFrontend,
    images: Iterable[np.ndarray],
    homo_config: HomographyConfig,
    eps: float = 3.0,
    seed: int = 0,
    nn_thresh: float | None = None,
) -> Dict[str, float]:
    """Aggregate metrics over (image, warped image) pairs."""
    key = jax.random.PRNGKey(seed)
    rows: List[Dict[str, float]] = []
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        hf = sample_homography(jax.random.fold_in(key, i), (h, w), homo_config)
        warped = np.asarray(warp_image(jnp.asarray(img), hf))
        kp1, d1 = frontend.extract(img[None])
        kp2, d2 = frontend.extract(warped[None])
        row = repeatability(kp1, kp2, np.asarray(hf), (h, w), eps)
        row.update(
            matching_metrics(
                kp1, d1, kp2, d2, np.asarray(hf), (h, w), eps,
                nn_thresh=nn_thresh,
            )
        )
        rows.append(row)
    agg: Dict[str, float] = {"pairs": float(len(rows))}
    if rows:
        for k in rows[0]:
            vals = [r[k] for r in rows if np.isfinite(r[k])]
            agg[k] = float(np.mean(vals)) if vals else float("nan")
    return agg


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights-path", default=None,
                    help="orbax checkpoint dir (random init if omitted)")
    ap.add_argument("--source", default="synthetic")
    ap.add_argument("--pairs", type=int, default=20)
    ap.add_argument("--H", type=int, default=240)
    ap.add_argument("--W", type=int, default=320)
    ap.add_argument("--eps", type=float, default=3.0)
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--subpixel", action="store_true",
                    help="center-of-mass subpixel keypoint refinement")
    opt = ap.parse_args(argv)

    cfg = SuperPointConfig(
        max_keypoints=opt.max_keypoints, subpixel_refine=opt.subpixel
    )
    frontend = SuperPointFrontend(cfg, checkpoint_dir=opt.weights_path)
    shape = (opt.H, opt.W)
    if opt.source == "synthetic":
        images = synthetic_images(opt.pairs, shape)
    else:
        images = list(directory_images(opt.source, shape))[: opt.pairs]
    homo = HomographyConfig()
    out = evaluate_pairs(frontend, images, homo, eps=opt.eps)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
