"""Held-out per-source generalization eval (VERDICT r2 item 3).

Groups the real-corpus test split by SOURCE image (filenames carry a
global source id: ``real_s<ID>_<i>.jpg``; sources are partitioned between
train and test splits, so every test source is unseen in training) and
runs the HPatches-protocol pair eval per source.  Reports the aggregate
and the per-source table, so descriptor generalization claims rest on
scenes the joint model never saw.

Usage:  python tools/eval_per_source.py --weights weights/X.npz \
            --corpus _data/real_corpus_r3 [--per-source 6] [--subpixel]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from feature_point_cnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help="default: the pinned weights/RELEASED snapshot")
    ap.add_argument("--corpus", default="_data/real_corpus_r3")
    ap.add_argument("--split", default="test2014")
    ap.add_argument("--per-source", type=int, default=6)
    ap.add_argument("--eps", type=float, default=3.0)
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--subpixel", action="store_true")
    ap.add_argument("--mild", action="store_true",
                    help="HPatches-like warp family (rotation <= 30 deg, "
                         "scale 0.85-1.15, patch ratio 0.8) instead of the "
                         "reference's full augmentation distribution "
                         "(+-90 deg, ratio 0.5) — isolates how much of the "
                         "accuracy gap is the eval's warp harshness")
    opt = ap.parse_args()

    from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
    from feature_point_cnn_tpu.eval.benchmark import evaluate_pairs
    from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend
    from feature_point_cnn_tpu.selflabel.coco import load_and_crop

    if opt.weights is None:
        from feature_point_cnn_tpu.utils.weights import released_path

        opt.weights = released_path()
    print(f"# weights: {opt.weights}", flush=True)

    cfg = SuperPointConfig(
        max_keypoints=opt.max_keypoints, subpixel_refine=opt.subpixel
    )
    fe = SuperPointFrontend(cfg, checkpoint_dir=opt.weights)

    by_source: dict = defaultdict(list)
    split_dir = Path(opt.corpus, opt.split)
    for p in sorted(split_dir.glob("*.jpg")):
        m = re.match(r"real_s(\d+)_", p.name)
        sid = int(m.group(1)) if m else -1
        if len(by_source[sid]) < opt.per_source:
            by_source[sid].append(str(p))

    import math

    homo = HomographyConfig()
    if opt.mild:
        homo = HomographyConfig(
            max_angle=math.pi / 6, scaling_amplitude=0.15, patch_ratio=0.8,
            perspective_amplitude_x=0.05, perspective_amplitude_y=0.05,
        )
    rows = {}
    keys = (
        "repeatability", "localization_error", "match_precision",
        "homography_acc_3px", "num_matches", "num_correct_matches",
    )
    for sid in sorted(by_source):
        images = [
            load_and_crop(p, (240, 320)) for p in by_source[sid]
        ]
        images = [im for im in images if im is not None]
        out = evaluate_pairs(fe, images, homo, eps=opt.eps, seed=11 + sid)
        rows[sid] = {k: round(float(out[k]), 3) for k in keys if k in out}
        print(f"source {sid:3d} ({len(images)} pairs): "
              f"{json.dumps(rows[sid])}", flush=True)

    agg = {
        k: round(float(np.mean([r[k] for r in rows.values()
                                if np.isfinite(r.get(k, np.nan))])), 4)
        for k in keys
    }
    print(json.dumps({"aggregate_over_sources": agg,
                      "n_sources": len(rows)}))


if __name__ == "__main__":
    main()
