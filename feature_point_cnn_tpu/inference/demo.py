"""Live feature-matching demo.

Equivalent of `/root/reference/python/src/inference.py`: capture frames,
extract keypoints+descriptors, match the current frame against a captured
keyframe, draw matches + FPS.  Differences:

* extraction AND matching are one jitted device program per frame (the
  reference matches with OpenCV BFMatcher on host, `inference.py:88-96`);
* works headless (``--source synthetic``, ``--max-frames N``, no window) so
  the loop is testable/benchable without a webcam or display.

Keys (with a window): q quit, s set keyframe, b toggle blur, t export the
serving program (the reference's 't' is a commented-out TorchScript trace,
`inference.py:63-65`; here it actually exports a PJRT bundle).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import numpy as np

from feature_point_cnn_tpu.config import SuperPointConfig
from feature_point_cnn_tpu.inference.camera import Camera, SyntheticCamera
from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend
from feature_point_cnn_tpu.ops.matching import mnn_match


def make_query_image(frame: np.ndarray, out_wh) -> np.ndarray:
    """Ratio-preserving resize + center crop (`inference.py:72-85`);
    ``frame`` is (H, W, 3) float RGB in [0,1]."""
    from feature_point_cnn_tpu.utils.image import ratio_preserving_crop

    ow, oh = out_wh
    return ratio_preserving_crop(frame, (oh, ow))


def run_demo(
    weights_dir: Optional[str],
    config: SuperPointConfig = SuperPointConfig(),
    source="synthetic",
    width: int = 640,
    height: int = 480,
    max_frames: int = 0,
    show: bool = True,
) -> dict:
    """Returns summary stats (frames, mean fps, mean matches) so headless
    runs are assertable."""
    if source == "synthetic":
        camera = SyntheticCamera((height, width))
    else:
        camera = Camera(int(source) if str(source).isdigit() else source)

    frontend = SuperPointFrontend(config=config, checkpoint_dir=weights_dir)
    match_jit = jax.jit(
        functools.partial(
            mnn_match, cross_check=True, max_l2_dist=config.nn_thresh
        )
    )

    win = None
    if show:
        try:
            import cv2

            cv2.namedWindow("feature_point_cnn_tpu")
            win = "feature_point_cnn_tpu"
        except Exception:
            win = None

    key_desc = None
    key_kp = None
    frames = 0
    do_blur = False
    fps_hist, match_hist = [], []
    t_prev = time.perf_counter()
    while True:
        frame, ok = camera.get_frame()
        if not ok:
            break
        if do_blur:
            import cv2

            frame = cv2.blur(frame, (3, 3))
        query = make_query_image(frame, (width, height))
        kp, desc = frontend.extract(query[None])
        first_frame = key_desc is None
        if first_frame:
            key_kp, key_desc = kp, desc
        m = match_jit(desc[0], kp.valid[0], key_desc[0], key_kp.valid[0])
        n_matches = int(m.num)
        if not first_frame:  # keyframe-init frame self-matches trivially
            match_hist.append(n_matches)

        t_now = time.perf_counter()
        fps = 1.0 / max(t_now - t_prev, 1e-6)
        t_prev = t_now
        fps_hist.append(fps)
        frames += 1

        if win is not None:
            import cv2

            vis = (np.asarray(query) * 255).astype(np.uint8).copy()
            xs = np.asarray(kp.x[0]).astype(int)
            ys = np.asarray(kp.y[0]).astype(int)
            for x, y, v in zip(xs, ys, np.asarray(kp.valid[0])):
                if v:
                    cv2.circle(vis, (x, y), 2, (0, 255, 0), -1, lineType=16)
            cv2.putText(
                vis, f"FPS {fps:.0f} matches {n_matches}", (10, 30),
                cv2.FONT_HERSHEY_SIMPLEX, 0.75, (200, 200, 200), 2,
            )
            cv2.imshow(win, vis)
            k = cv2.waitKey(1)
            if k == ord("q"):
                break
            if k == ord("s"):
                key_kp, key_desc = kp, desc
            if k == ord("b"):
                do_blur = not do_blur
            if k == ord("t"):
                out = "export_live"
                frontend.export_pjrt(out, (height, width))
                print(f"Model saved to {out}/, 't' pressed.")
        if max_frames and frames >= max_frames:
            break

    camera.close()
    if win is not None:
        import cv2

        cv2.destroyAllWindows()
    return {
        "frames": frames,
        "mean_fps": float(np.mean(fps_hist[1:])) if len(fps_hist) > 1 else 0.0,
        "mean_matches": float(np.mean(match_hist)) if match_hist else 0.0,
    }
