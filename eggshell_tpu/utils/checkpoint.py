"""Checkpoint / resume of simulation + MPC state.

The reference has no checkpointing (SURVEY.md §5.4); multi-host MPC runs
need it.  Orbax-backed save/restore of an arbitrary pytree — typically
{"state": State batch, "controls": (H, 6), "rng": key, "step": int} —
with an explicit restore target for dtype/shape fidelity.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is None:
        return ckptr.restore(path)
    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.ArrayRestoreArgs(dtype=x.dtype) if hasattr(x, "dtype")
        else ocp.RestoreArgs(),
        target,
    )
    return ckptr.restore(
        path, args=ocp.args.PyTreeRestore(
            item=target, restore_args=restore_args
        )
    )
