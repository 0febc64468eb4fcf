"""Orbax checkpointing with step-level resume.

The reference saves only a best-val state_dict, epoch-granular, with no
optimizer state, step counter, or RNG (/root/reference/train.py:283-290), so
resume restarts the schedule (SURVEY.md §5). Here the full train state
{"params","state","opt_state","step","rng"} round-trips (rng = the dropout
base key, so resume restores the exact key stream), plus a tagged best/ copy.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(directory: str, train_state: dict, step: int | None = None) -> None:
    step = int(train_state["step"]) if step is None else int(step)
    with _manager(directory) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(train_state))
        mgr.wait_until_finished()


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    with _manager(directory) as mgr:
        return mgr.latest_step()


def restore_raw(directory: str, step: int | None = None) -> dict:
    """Restore a checkpoint without a template, as host numpy arrays — for
    tooling (e.g. torch export) that only needs the saved values and must not
    depend on reconstructing the optimizer to build a full-state template."""
    step = latest_step(directory) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    path = os.path.join(os.path.abspath(directory), str(step), "default")
    # force-numpy restore_args so a TPU-written checkpoint opens on any
    # platform (no sharding re-resolve against jax.local_devices())
    ck = ocp.PyTreeCheckpointer()
    meta = ck.metadata(path)
    tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ck.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def restore_checkpoint(directory: str, template: dict, step: int | None = None) -> dict:
    """Restore into the shape/dtype/sharding structure of `template`."""
    with _manager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
