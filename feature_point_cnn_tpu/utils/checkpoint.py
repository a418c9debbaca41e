"""Orbax checkpointing helpers.

Replaces `/root/reference/python/src/saveutils.py`: instead of
``<name>_<epoch>.pt`` torch dicts with max-suffix resume
(`saveutils.py:21-36,54-63`), an orbax `CheckpointManager` with
step-indexed directories, atomic async-safe writes, and pytree-structured
restore.  The MagicPoint -> SuperPoint phase hand-off
(`superpointtrainer.py:15-20`) becomes a partial pytree graft.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def checkpoint_manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    path = Path(directory).absolute()
    path.mkdir(parents=True, exist_ok=True)
    return ocp.CheckpointManager(
        path,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_state(manager: ocp.CheckpointManager, step: int, state: Any) -> None:
    manager.save(step, args=ocp.args.StandardSave(state))
    manager.wait_until_finished()


def restore_latest(
    manager: ocp.CheckpointManager, template: Any
) -> Tuple[Optional[int], Any]:
    """Restore the newest checkpoint shaped like ``template``; returns
    ``(step, state)`` or ``(None, template)`` when nothing exists."""
    step = manager.latest_step()
    if step is None:
        return None, template
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    state = manager.restore(step, args=ocp.args.StandardRestore(abstract))
    return step, state


def restore_latest_raw(manager: ocp.CheckpointManager):
    """Restore the newest checkpoint as plain nested containers, without a
    structural template — used for cross-phase grafts where optimizer state
    layouts differ (frozen vs full transform)."""
    step = manager.latest_step()
    if step is None:
        return None, None
    return step, manager.restore(step)


def graft_pretrained(
    params: Any, batch_stats: Any, pretrained_params: Any, pretrained_stats: Any,
    subtrees=("encoder", "detector"),
):
    """Copy ``subtrees`` from a pretrained (MagicPoint) checkpoint into fresh
    variables, leaving the rest (descriptor head) at its fresh init — the
    hand-off semantics of `superpointtrainer.py:15-20` +
    `superpoint.py:86-89`."""
    new_params = dict(params)
    new_stats = dict(batch_stats)
    for k in subtrees:
        new_params[k] = pretrained_params[k]
        new_stats[k] = pretrained_stats[k]
    return new_params, new_stats
