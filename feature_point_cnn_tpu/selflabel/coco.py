"""COCO self-labeling: pseudo-label real images with an adapted MagicPoint.

Equivalent of `/root/reference/python/src/preprocess_coco.py`: read raw
images, ratio-preserving resize + center crop to the training size, run
batched homography adaptation, write ``{image, points}`` npz items into
``train``/``test`` — except adaptation runs as ONE jitted program per batch
(see `selflabel/adaptation.py`) instead of a 15-iteration host loop, and the
image batch pipeline is a simple threaded reader.

This stage is embarrassingly parallel: shard the file list across hosts
(``shard_index / num_shards``) and each host labels its slice.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterable, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from feature_point_cnn_tpu.config import HomographyConfig, SuperPointConfig
from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend

_IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp"}


def load_and_crop(path: str, out_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """Ratio-preserving resize + center crop (`preprocess_coco.py:27-33`):
    returns ``(H, W, 3)`` float32 RGB in [0, 1]."""
    from feature_point_cnn_tpu.utils.image import ratio_preserving_crop

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        return None
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return ratio_preserving_crop(img, out_hw).astype(np.float32) / 255.0


def _batched_reader(
    paths: List[Tuple[int, str]],
    out_hw: Tuple[int, int],
    batch_size: int,
    prefetch: int = 2,
) -> Iterable[Tuple[np.ndarray, List[str], List[int]]]:
    """Yields ``(images, names, global_indices)`` batches; ``paths`` carries
    each file's index in the FULL un-sharded sorted list so the per-item RNG
    key is stable under sharding/resume."""
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def worker():
        images, names, idxs = [], [], []
        for gi, p in paths:
            img = load_and_crop(p, out_hw)
            if img is None:
                continue
            images.append(img)
            names.append(p)
            idxs.append(gi)
            if len(images) == batch_size:
                q.put((np.stack(images), names, idxs))
                images, names, idxs = [], [], []
        if images:
            q.put((np.stack(images), names, idxs))
        q.put(None)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            return
        yield item


def preprocess_folder(
    frontend: SuperPointFrontend,
    image_dir: str,
    output_dir: str,
    homo_config: HomographyConfig,
    batch_size: int = 16,
    seed: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
    limit: int = 0,
    use_mesh: bool = True,
    skip_existing: bool = True,
) -> int:
    """Label every image under ``image_dir`` into ``output_dir`` npz items
    (`preprocess_coco.py:64-74`).  Returns the item count written.

    Two levels of parallelism (SURVEY.md §7 stage 5): the file list shards
    across HOSTS (``shard_index``/``num_shards``), and each host's batch
    shards across its CHIPS via the data mesh (``use_mesh``) — the jitted
    adaptation program partitions automatically over sharded inputs.

    Determinism: each item's warp set is drawn from a key folded with its
    index in the FULL sorted file list, so the output of a sharded run is
    **bit-identical** to a single-process run regardless of which items
    share a batch (asserted by `tests/test_distributed.py`; the one caveat
    is that every run must use the same ``batch_size`` — a different static
    batch shape is a different XLA program and shifts scores by ~1 ULP),
    and an interrupted run resumes by skipping already-written items
    (``skip_existing``) without changing the remaining items' labels."""
    from feature_point_cnn_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicate_state,
    )

    mesh = make_mesh(batch_size=batch_size) if use_mesh else None
    if mesh is not None and mesh.devices.size > 1:
        # checkpoint restores commit variables to device 0; the jitted call
        # would reject mixed (committed single-device vars, mesh-sharded
        # images) placements
        frontend.variables = replicate_state(frontend.variables, mesh)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    all_paths = sorted(
        str(p) for p in Path(image_dir).iterdir() if p.suffix.lower() in _IMG_EXTS
    )
    # index BEFORE sharding/filtering: the per-item key is a function of the
    # position in the full sorted list, never of batch/shard layout
    paths = list(enumerate(all_paths))[shard_index::num_shards]
    if limit:
        paths = paths[:limit]
    n_assigned = len(paths)
    if skip_existing:
        paths = [
            (gi, p) for gi, p in paths
            if not (out / f"{Path(p).stem}.npz").exists()
        ]
        if len(paths) < n_assigned:
            print(
                f"[selflabel] resume: {n_assigned - len(paths)}/{n_assigned}"
                f" items already in {output_dir}, labeling the rest"
                " (existing labels are KEPT — pass --relabel to regenerate"
                " with the current model)"
            )
    out_hw = frontend.config.train_image_size
    key = jax.random.PRNGKey(seed)
    written = 0
    for i, (images, names, idxs) in enumerate(
        _batched_reader(paths, out_hw, batch_size)
    ):
        # pad the tail batch to the static shape, drop the padding afterwards
        n_real = len(names)
        if n_real < batch_size:
            pad = np.zeros((batch_size - n_real,) + images.shape[1:], images.dtype)
            images = np.concatenate([images, pad])
            idxs = idxs + [0] * (batch_size - n_real)
        item_keys = jax.vmap(lambda gi: jax.random.fold_in(key, gi))(
            jnp.asarray(idxs, jnp.int32)
        )
        device_images = images
        if mesh is not None and mesh.devices.size > 1:
            # shard straight from host memory (no staging via device 0)
            device_images = jax.device_put(images, batch_sharding(mesh))
            item_keys = jax.device_put(item_keys, batch_sharding(mesh))
        points = frontend.run_with_homography_adaptation(
            device_images, homo_config, item_keys
        )
        for j in range(n_real):
            name = Path(names[j]).stem
            chw = np.transpose(images[j], (2, 0, 1))
            np.savez_compressed(out / f"{name}.npz", image=chw, points=points[j])
            written += 1
        if (i + 1) % 10 == 0:
            print(f"[selflabel] {written}/{len(paths)} items -> {output_dir}")
    return written


def preprocess_coco(
    coco_path: str,
    magicpoint_checkpoint_dir: str,
    config: SuperPointConfig,
    batch_size: int = 16,
    limit: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
    skip_existing: bool = True,
) -> None:
    """Full reference flow (`preprocess_coco.py:41-61`): label
    ``train2014``/``test2014`` into ``train``/``test`` with the looser
    preprocess homography family."""
    frontend = SuperPointFrontend(
        config=config, checkpoint_dir=magicpoint_checkpoint_dir
    )
    homo = HomographyConfig.for_preprocess()
    for src, dst in (("train2014", "train"), ("test2014", "test")):
        n = preprocess_folder(
            frontend,
            str(Path(coco_path, src)),
            str(Path(coco_path, dst)),
            homo,
            batch_size=batch_size,
            limit=limit,
            shard_index=shard_index,
            num_shards=num_shards,
            skip_existing=skip_existing,
        )
        print(f"[selflabel] {src}: wrote {n} labeled items")
