"""Visual-tracking evaluation: track a rendered Sim(2) sequence, report ATE.

The reference's tracking capability is qualitative — a live demo drawing
match lines (`/root/reference/python/src/inference.py:88-96`,
`cpp/src/main.cc:104-136`).  Here it is measured: render a video by warping
a base image along a smooth ground-truth Sim(2) trajectory, run the
`slam.tracking.Tracker` with a REAL feature provider (`SuperPointFrontend`),
and score the estimated trajectory with `slam.trajectory`'s ATE plus
match/inlier statistics.  This closes the loop the unit tests leave open:
`tests/test_slam.py` validates the tracker with an ideal provider; this
harness validates detector+descriptor+tracker together.

Usage:
    python -m feature_point_cnn_tpu.eval.tracking --weights-path CKPT \
        [--source synthetic|<image-or-dir>] [--frames 40]
"""

from __future__ import annotations

import argparse
import json
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.geometry.warp import warp_image
from feature_point_cnn_tpu.slam.twoview import sim2_from_homography


def sim2_h_flat(theta: float, scale: float, tx: float, ty: float) -> np.ndarray:
    """Flat (8,) homography (warp_image's output->input, (x, y) coords) of a
    similarity about the origin: ``in = scale*R(theta)*out + t``."""
    c, s = np.cos(theta), np.sin(theta)
    return np.asarray(
        [scale * c, -scale * s, tx, scale * s, scale * c, ty, 0.0, 0.0],
        np.float32,
    )


def smooth_trajectory(
    n_frames: int,
    max_shift: float = 24.0,
    max_theta: float = 0.06,
    max_log_scale: float = 0.03,
    loops: int = 1,
) -> np.ndarray:
    """(N, 4) ground-truth warp parameters (theta, scale, tx, ty), frame 0 =
    identity, smoothly varying (sinusoidal camera sweep).  ``loops > 1``
    repeats the sweep, so the camera REVISITS earlier viewpoints — the
    precondition for loop-closure detection."""
    t = np.linspace(0.0, loops * 2.0 * np.pi, n_frames)
    theta = max_theta * np.sin(t)
    scale = np.exp(max_log_scale * np.sin(2.0 * t))
    tx = max_shift * np.sin(t)
    ty = max_shift * 0.6 * (1.0 - np.cos(t))
    return np.stack([theta, scale, tx, ty], -1).astype(np.float32)


def render_sequence(base: np.ndarray, params: np.ndarray) -> np.ndarray:
    """Warp ``base (H, W, C)`` by each (theta, scale, tx, ty); frame i pixel
    coords map into base coords through that similarity."""
    hs = jnp.asarray(np.stack([sim2_h_flat(*p) for p in params]))
    frames = jax.jit(jax.vmap(lambda h: warp_image(jnp.asarray(base), h)))(hs)
    return np.asarray(frames)


def evaluate_tracking(
    extract: Callable,
    base: np.ndarray,
    n_frames: int = 40,
    min_inliers: int = 30,
    max_shift: float = 24.0,
    loops: int = 1,
    posegraph: bool = False,
    loop_min_inliers: int = 25,
) -> Dict[str, object]:
    """Track the rendered sequence; returns ATE + tracking statistics.

    ``extract``: ``image -> FrameFeatures`` (e.g.
    `slam.tracking.frontend_extractor(frontend)`).

    With ``posegraph=True`` the raw odometry is additionally refined by
    loop-closure detection over the keyframe set + Sim(2) pose-graph
    Gauss-Newton (`slam.tracking.detect_loop_closures` /
    `refine_with_pose_graph`), and the result carries both ATE columns —
    use ``loops >= 2`` so the trajectory actually revisits old viewpoints.
    """
    from feature_point_cnn_tpu.slam.tracking import (
        Tracker,
        detect_loop_closures,
        refine_with_pose_graph,
    )
    from feature_point_cnn_tpu.slam.trajectory import absolute_trajectory_error

    params = smooth_trajectory(n_frames, max_shift=max_shift, loops=loops)
    frames = render_sequence(base, params)
    # frame 0 is the identity warp == the tracker's first keyframe, so the
    # ground-truth absolute pose of frame i is the Sim(2) projection of its
    # own render transform.  No coordinate swap: `ransac_homography` takes
    # (y, x) point arrays but flips them to (x, y) internally
    # (`slam/twoview.py`), so tracker poses live in the plain (x, y) warp
    # convention (pinned by the ideal-provider test).
    gt = np.stack(
        [
            np.asarray(sim2_from_homography(jnp.asarray(sim2_h_flat(*p))))
            for p in params
        ]
    )
    tracker = Tracker(extract=extract, min_inliers=min_inliers)
    results = tracker.track(list(frames))
    est = np.stack([r["pose"] for r in results])
    ate = absolute_trajectory_error(est[1:, 2:4], gt[1:, 2:4], align=False)
    tracked = [bool(r.get("tracked", False)) for r in results[1:]]
    out = {
        "frames": int(n_frames),
        "ate_rmse_px": ate["ate_rmse"],
        "ate_max_px": ate["ate_max"],
        "frac_tracked": float(np.mean(tracked)),
        "mean_matches": float(np.mean([r["num_matches"] for r in results[1:]])),
        "mean_inliers": float(np.mean([r["num_inliers"] for r in results[1:]])),
        "num_keyframes": int(sum(r["is_keyframe"] for r in results)),
    }
    if posegraph:
        closures = detect_loop_closures(
            tracker, min_inliers=loop_min_inliers
        )
        refined = refine_with_pose_graph(results, tracker, closures)
        ate_pg = absolute_trajectory_error(
            refined[1:, 2:4], gt[1:, 2:4], align=False
        )
        out.update({
            "num_loop_closures": len(closures),
            "posegraph_ate_rmse_px": ate_pg["ate_rmse"],
            "posegraph_ate_max_px": ate_pg["ate_max"],
        })
    return out


def _base_image(source: str, shape) -> np.ndarray:
    if source == "synthetic":
        from feature_point_cnn_tpu.eval.benchmark import synthetic_images

        return next(iter(synthetic_images(1, shape, seed=3)))
    from pathlib import Path

    from feature_point_cnn_tpu.selflabel.coco import load_and_crop

    p = Path(source)
    if p.is_dir():
        p = sorted(
            q for q in p.iterdir()
            if q.suffix.lower() in {".jpg", ".jpeg", ".png", ".bmp"}
        )[0]
    img = load_and_crop(str(p), shape)
    if img is None:
        raise SystemExit(f"could not read image: {p}")
    return img


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights-path", required=True,
                    help="orbax checkpoint directory (needs a trained "
                         "descriptor head, i.e. a SuperPoint-phase ckpt)")
    ap.add_argument("--source", default="synthetic",
                    help="'synthetic', an image file, or an image directory")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--H", type=int, default=240)
    ap.add_argument("--W", type=int, default=320)
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--subpixel", action="store_true",
                    help="center-of-mass subpixel keypoint refinement")
    ap.add_argument("--loops", type=int, default=1,
                    help="trajectory sweeps (>= 2 revisits old viewpoints)")
    ap.add_argument("--max-shift", type=float, default=24.0)
    ap.add_argument("--posegraph", action="store_true",
                    help="loop-closure detection + Sim(2) pose-graph "
                         "refinement; adds posegraph_ate_* columns")
    opt = ap.parse_args(argv)

    from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend
    from feature_point_cnn_tpu.slam.tracking import frontend_extractor

    cfg = SuperPointConfig(
        max_keypoints=opt.max_keypoints, subpixel_refine=opt.subpixel
    )
    frontend = SuperPointFrontend(cfg, checkpoint_dir=opt.weights_path)
    base = _base_image(opt.source, (opt.H, opt.W))
    out = evaluate_tracking(
        frontend_extractor(frontend), base, n_frames=opt.frames,
        loops=opt.loops, max_shift=opt.max_shift, posegraph=opt.posegraph,
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
