"""Frame sources for the live demo: webcam (threaded), video file, or a
synthetic moving-checkerboard generator for headless testing.

Webcam capture mirrors `/root/reference/python/src/camera.py`: a daemon
thread continuously grabs frames so the consumer always sees the newest one.
"""

from __future__ import annotations

import threading
import time
from typing import Optional, Tuple

import numpy as np


class Camera:
    """Threaded webcam/video capture; frames are float32 RGB in [0, 1]
    (converted from OpenCV's BGR — the network trains on RGB,
    `selflabel/coco.py`; the reference converts in its demo loop,
    `inference.py:79`)."""

    def __init__(self, source=0):
        import cv2

        self.cap = cv2.VideoCapture(source)
        if not self.cap.isOpened():
            raise RuntimeError(f"failed to open capture source {source!r}")
        self.status = False
        self.frame: Optional[np.ndarray] = None
        self._stop = False
        # Finite sources (video files) are read synchronously per get_frame —
        # a free-running grab thread would race to EOF before the consumer
        # sees a single frame.  Live sources keep the always-newest thread.
        self._is_stream = self.cap.get(cv2.CAP_PROP_FRAME_COUNT) <= 0
        self.thread = None
        if self._is_stream:
            self.thread = threading.Thread(target=self._update, daemon=True)
            self.thread.start()

    def _update(self):
        while not self._stop and self.cap.isOpened():
            self.status, self.frame = self.cap.read()

    def get_frame(self) -> Tuple[Optional[np.ndarray], bool]:
        import cv2

        if not self._is_stream:
            self.status, self.frame = self.cap.read()
        if not self.status or self.frame is None:
            return None, False
        rgb = cv2.cvtColor(self.frame, cv2.COLOR_BGR2RGB)
        return rgb.astype(np.float32) / 255.0, True

    def close(self):
        self._stop = True
        self.cap.release()


class SyntheticCamera:
    """Headless stand-in: a checkerboard drifting under a slow homography —
    lets the demo/bench loop run with zero hardware."""

    def __init__(self, size: Tuple[int, int] = (480, 640), speed: float = 0.5):
        self.size = size
        self.speed = speed
        self.t0 = time.time()
        h, w = size
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        self._yy, self._xx = yy, xx

    def get_frame(self) -> Tuple[np.ndarray, bool]:
        t = (time.time() - self.t0) * self.speed
        dx, dy = 40 * np.sin(t), 25 * np.cos(0.7 * t)
        board = (
            (((self._xx + dx) // 40).astype(int) + ((self._yy + dy) // 40).astype(int))
            % 2
        )
        frame = (0.25 + 0.55 * board).astype(np.float32)
        return np.repeat(frame[..., None], 3, axis=-1), True

    def close(self):
        pass
