"""Portable single-file weight snapshots (git-committable).

Orbax checkpoints (`utils/checkpoint.py`) are the training-time format, but
they are multi-file directory trees that are gitignored and lost whenever
the build environment is recreated.  This module flattens an inference
variables pytree (``{"params": ..., "batch_stats": ...}``) into one
compressed ``.npz`` keyed by ``/``-joined tree paths — small enough
(~5 MB f32 for the flagship model) to commit next to the code, the analog
of the reference's stripped ``state_dict`` export for C++
(`/root/reference/python/src/inferencewrapper.py:83-91`).

CLI: ``python -m feature_point_cnn_tpu.main export --weights-path CKPT
--raw-weights weights/model.npz`` writes one; ``--weights-path`` arguments
ending in ``.npz`` load one everywhere a checkpoint dir is accepted.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax


def _flatten(variables) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        parts = [str(getattr(k, "key", k)) for k in path]
        for p in parts:
            if "/" in p:
                # '/' is the flat-key separator; a module name containing it
                # would silently corrupt the round-trip
                raise ValueError(f"tree path component contains '/': {p!r}")
        flat["/".join(parts)] = np.asarray(leaf)
    return flat


def save_weights(path: str, variables: dict) -> None:
    """Write ``variables`` (params + batch_stats pytree) to one ``.npz``.

    The write is atomic (tmp + ``os.replace``): per-epoch snapshots
    overwrite one file in place, and that file exists precisely as
    insurance against a mid-write crash or environment reset.
    """
    for top in ("params", "batch_stats"):
        if top not in variables:
            raise ValueError(
                f"variables missing {top!r} collection; got {sorted(variables)}"
            )
    import os
    from pathlib import Path

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    tmp = f"{path}.tmp.npz"  # .npz suffix so savez doesn't append its own
    np.savez_compressed(tmp, **_flatten(variables))
    os.replace(tmp, path)


def released_path(weights_dir=None) -> str:
    """Resolve the RELEASED weight snapshot for bench/eval/serve.

    Every published number must come from ONE pinned artifact, so the
    ``weights/RELEASED`` pointer file (one line: the snapshot filename)
    is the single source of truth.  Fallback when the pointer is absent:
    the newest-by-mtime ``superpoint*.npz`` (mtime, NOT lexical sort —
    ``r10`` would lexically sort before ``r3``).  Raises FileNotFoundError
    when no snapshot exists at all.
    """
    from pathlib import Path

    wdir = Path(weights_dir) if weights_dir else (
        Path(__file__).resolve().parents[2] / "weights"
    )
    pointer = wdir / "RELEASED"
    if pointer.exists():
        name = pointer.read_text().strip()
        path = wdir / name
        if not path.exists():
            raise FileNotFoundError(
                f"{pointer} points at {name!r} but {path} does not exist"
            )
        return str(path)
    snaps = sorted(
        list(wdir.glob("superpoint*.npz")) or list(wdir.glob("*.npz")),
        key=lambda p: p.stat().st_mtime,
    )
    if not snaps:
        raise FileNotFoundError(f"no weight snapshots under {wdir}")
    return str(snaps[-1])


def load_variables(path: str, *, device: bool = True) -> dict:
    """Load a snapshot as an inference ``variables`` dict, device-resident.

    ``load_weights`` returns host numpy arrays; feeding those straight into
    a jitted function re-uploads every parameter on EVERY call — through
    this environment's ~12 MB/s relay that is ~700 ms/call of pure weight
    transfer, the round-3 benchmark artifact (BENCH_r03: 222 fps reported
    while the chip itself ran 0.675 ms/frame).  ``device=True`` commits the
    tree to the default device once, up front.
    """
    raw = load_weights(path)
    variables = {"params": raw["params"], "batch_stats": raw["batch_stats"]}
    if device:
        variables = jax.device_put(variables)
    return variables


def load_weights(path: str) -> dict:
    """Read a ``save_weights`` file back into the nested variables dict."""
    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    for top in ("params", "batch_stats"):
        if top not in out:
            raise ValueError(
                f"{path} is not a weights snapshot: missing {top!r} "
                f"(top-level keys: {sorted(out)})"
            )
    return out
