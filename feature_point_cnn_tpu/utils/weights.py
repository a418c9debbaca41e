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
    """Write ``variables`` (params + batch_stats pytree) to one ``.npz``."""
    for top in ("params", "batch_stats"):
        if top not in variables:
            raise ValueError(
                f"variables missing {top!r} collection; got {sorted(variables)}"
            )
    from pathlib import Path

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **_flatten(variables))


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
