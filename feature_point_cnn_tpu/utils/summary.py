"""Metric/observability writer.

Covers the reference's TensorBoard usage (`/root/reference/python/src/
basetrainer.py:22-23,248-261,265-283`): scalars per epoch/step, param/grad
histograms, rendered keypoint images.  Backend is torch's SummaryWriter when
available, with a dependency-free JSONL fallback so headless training never
loses metrics.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import numpy as np


class MetricWriter:
    def __init__(self, log_dir: Optional[str], backend: str = "auto"):
        self._tb = None
        self._jsonl = None
        self._dir = log_dir
        if log_dir is None:
            return
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        if backend in ("auto", "tensorboard"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                pass
        self._jsonl = open(Path(log_dir) / "metrics.jsonl", "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"t": time.time(), "step": step, tag: value}) + "\n"
            )
            self._jsonl.flush()

    def image(self, tag: str, image_hwc: np.ndarray, step: int) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, image_hwc.transpose(2, 0, 1), step)

    def histogram(self, tag: str, values: np.ndarray, step: int) -> None:
        if self._tb is not None:
            self._tb.add_histogram(tag, values, step)

    def text(self, tag: str, text: str, step: int = 0) -> None:
        """Large text artifact (model graph / program IR).  Written as a
        plain file next to metrics.jsonl (dependency-free, full content)
        and, truncated, as a TensorBoard text summary — the analog of the
        reference's `add_graph` (`basetrainer.py:53-59`): on TPU the
        authoritative 'graph' is the lowered StableHLO program."""
        if self._dir is not None:
            safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in tag)
            (Path(self._dir) / f"{safe}.txt").write_text(text)
        if self._tb is not None:
            limit = 65536
            body = text if len(text) <= limit else (
                text[:limit] + f"\n... [{len(text) - limit} bytes truncated; "
                f"full text next to metrics.jsonl]"
            )
            self._tb.add_text(tag, f"```\n{body}\n```", step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


def keypoint_overlay(
    image_hwc: np.ndarray,
    pred_points_yx: np.ndarray,
    true_points_yx: np.ndarray,
) -> np.ndarray:
    """Render predictions (red, r=3) and labels (green, r=1) over the image —
    the reference's training image summary
    (`/root/reference/python/src/basetrainer.py:76-94`)."""
    import cv2

    vis = (np.clip(image_hwc, 0, 1) * 255).astype(np.uint8).copy()
    if vis.shape[-1] == 1:
        vis = np.repeat(vis, 3, axis=-1)
    for y, x in pred_points_yx:
        cv2.circle(vis, (int(round(x)), int(round(y))), 3, (255, 0, 0), -1, lineType=16)
    for y, x in true_points_yx:
        cv2.circle(vis, (int(round(x)), int(round(y))), 1, (0, 255, 0), -1, lineType=16)
    return vis
