"""Synthetic dataset generation CLI.

Equivalent of `/root/reference/python/gen_synthetic_dataset.py`: writes
``<out>/{train,test}/<primitive>_<i>.npz`` with
``{image: (1, 240, 320) float32, points: (3, N) [x, y, conf]}``, one process
per (split, primitive) task — but fully deterministic: every task derives its
own `numpy.random.Generator` from (seed, split, primitive).

Usage:  python -m feature_point_cnn_tpu.data.generate OUT_DIR \
            [--train-size 3000] [--test-size 500] [--seed 0] [--workers N]
"""

from __future__ import annotations

import argparse
import zlib
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

from feature_point_cnn_tpu.data.synthetic_shapes import (
    PRIMITIVES,
    SyntheticShapeGenerator,
)


def generate_task(out_dir: str, primitive: str, size: int, seed: int) -> int:
    rng = np.random.default_rng(seed)
    gen = SyntheticShapeGenerator(rng)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(size):
        image, points = gen.sample(primitive)
        np.savez_compressed(out / f"{primitive}_{i}.npz", image=image, points=points)
    return size


def generate_dataset(
    path: str,
    train_size: int = 3000,
    test_size: int = 500,
    seed: int = 0,
    workers: int | None = None,
) -> None:
    if train_size < 0 or test_size < 0:
        raise ValueError(
            f"split sizes must be >= 0, got train={train_size} test={test_size}"
        )
    tasks = []
    for split, size in (("train", train_size), ("test", test_size)):
        for k, primitive in enumerate(PRIMITIVES):
            # stable across interpreters (builtin hash() is randomized)
            tag = zlib.crc32(f"{split}/{primitive}".encode())
            task_seed = seed * 1_000_003 + tag % 1_000_003
            tasks.append((str(Path(path, split)), primitive, size, task_seed))
    with ProcessPoolExecutor(max_workers=workers) as pool:
        futures = [pool.submit(generate_task, *t) for t in tasks]
        total = sum(f.result() for f in futures)
    print(f"wrote {total} items under {path}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", type=str)
    ap.add_argument("--train-size", type=int, default=3000)
    ap.add_argument("--test-size", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=None)
    opt = ap.parse_args()
    generate_dataset(opt.path, opt.train_size, opt.test_size, opt.seed, opt.workers)


if __name__ == "__main__":
    main()
