"""Checkpointing: Orbax-backed save/restore with auto-resume.

The reference saves weights-only h5 every 2,000 iterations and relies on a
human to restart runs (train_util.py:58-64; SURVEY.md §5.3 "no optimizer-state
or step-counter resume").  Here checkpoints carry params + optimizer state +
step + batch_stats, written asynchronously (Orbax) so the TPU never blocks on
serialization, and ``latest_step``/``restore`` give automatic resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _manager(directory: str, keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save(directory: str, step: int, tree: Any, keep: int = 3, wait: bool = False) -> None:
    """Save a pytree checkpoint at ``step`` (async unless ``wait``)."""
    mgr = _manager(directory, keep)
    mgr.save(step, args=ocp.args.StandardSave(tree))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(directory: str, step: Optional[int] = None, template: Any = None) -> Any:
    """Restore the checkpoint at ``step`` (default: latest).  ``template``
    provides the tree structure/shardings; without it Orbax restores raw."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            raise FileNotFoundError(f"no checkpoints in {directory}")
    if template is not None:
        out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        out = mgr.restore(step)
    mgr.close()
    return out
