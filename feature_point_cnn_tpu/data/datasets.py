"""Host-side npz datasets + prefetching batch loader.

Reads the on-disk contract shared with the reference
(`/root/reference/python/gen_synthetic_dataset.py:95-101`:
``{image: (C, H, W) float32 | uint8, points: (3, N) [x, y, conf]}``) and
yields **fixed-shape** numpy batches ready for device transfer:

* images converted to NHWC, grayscale repeated to 3 channels
  (`dataset_utils.py:19-23`);
* ragged point lists padded to ``max_points`` with a validity mask and
  converted to the internal ``(y, x)`` convention (`dataset_utils.py:36-40`);
* label encoding and homographic augmentation do NOT happen here — they run
  on device inside the jitted train step (the reference does both per item
  in DataLoader workers, `coco_dataset.py:27-40`).

The loader is a thread-prefetched epoch iterator with seeded shuffling —
the host's only jobs are IO and batch assembly.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Tuple

import numpy as np


def read_npz_item(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """One item -> ``(image (H, W, 3) float32 in [0,1], points (N, 2) (y, x))``."""
    data = np.load(path)
    image = data["image"]
    assert image.ndim >= 2
    if image.ndim == 2:
        image = image[None]
    if image.shape[0] == 1:
        image = np.repeat(image, 3, axis=0)
    if image.dtype == np.uint8:
        image = image.astype(np.float32) / 255.0
    image = np.transpose(image, (1, 2, 0)).astype(np.float32)  # CHW -> HWC

    points = data["points"][:2].T.astype(np.float32)           # (N, 2) (x, y)
    points = points[:, ::-1].copy()                            # -> (y, x)
    return image, points


class NpzPointDataset:
    """Map-style dataset over ``<path>/<split>/*.npz`` with seeded shuffling
    (`synthetic_dataset.py:10-27`, `coco_dataset.py:13-26`)."""

    def __init__(
        self,
        path: str,
        split: str,
        seed: int = 0,
        size: int = 0,
    ):
        self.data_path = Path(path) / split
        items = sorted(str(p) for p in self.data_path.glob("*.npz"))
        if not items:
            raise FileNotFoundError(f"no .npz items under {self.data_path}")
        np.random.default_rng(seed).shuffle(items)
        if size:
            items = items[:size]
        self.items: List[str] = items

    def __len__(self) -> int:
        return len(self.items)

    def read(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        return read_npz_item(self.items[index])


def _assemble_batch(
    samples: List[Tuple[np.ndarray, np.ndarray]], max_points: int
) -> Dict[str, np.ndarray]:
    images = np.stack([s[0] for s in samples])
    b = len(samples)
    points = np.zeros((b, max_points, 2), np.float32)
    valid = np.zeros((b, max_points), bool)
    for i, (_, pts) in enumerate(samples):
        n = min(len(pts), max_points)
        points[i, :n] = pts[:n]
        valid[i, :n] = True
    return {"image": images, "points": points, "points_valid": valid}


class BatchLoader:
    """Epoch iterator over fixed-shape batches with background prefetch.

    ``drop_last`` is always true: jitted steps want one static batch shape.
    Reshuffles every epoch from ``seed + epoch``.
    """

    def __init__(
        self,
        dataset: NpzPointDataset,
        batch_size: int,
        max_points: int,
        seed: int = 0,
        shuffle: bool = True,
        prefetch: int = 2,
        num_threads: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_points = max_points
        self.seed = seed
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.num_threads = num_threads

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def epoch(self, epoch_index: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor

        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch_index).shuffle(order)
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(
            maxsize=self.prefetch
        )
        batch_indices = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        fast = getattr(self.dataset, "read_batch", None)

        def worker():
            # packed datasets assemble a batch in one fancy-index copy;
            # npz datasets decode items in parallel (IO + zlib drop the GIL)
            try:
                if fast is not None:
                    for idxs in batch_indices:
                        out_q.put(fast(idxs, self.max_points))
                else:
                    with ThreadPoolExecutor(self.num_threads) as pool:
                        for idxs in batch_indices:
                            samples = list(
                                pool.map(self.dataset.read, (int(i) for i in idxs))
                            )
                            out_q.put(_assemble_batch(samples, self.max_points))
                out_q.put(None)
            except BaseException as e:  # surface reader crashes to the consumer
                out_q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = out_q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
