"""Orbax-backed training-state checkpointing with resume.

The reference snapshots raw state dicts and parses the resume EPOCH out of
the checkpoint FILENAME (pretrain_DAMSM.py:182-185) -- fragile by design.
Here train states (params + optimizer + step) checkpoint atomically through
orbax with retention, and resume restores the full state.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_train_state(directory: str, step: int, state: Any,
                     max_to_keep: int = 3, wait: bool = True) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def restore_train_state(directory: str, template: Any,
                        step: Optional[int] = None) -> tuple:
    """Returns (state, step). `template` provides the tree structure/dtypes
    (an abstract or concrete state of the same shape)."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    state = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return state, step


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    s = mgr.latest_step()
    mgr.close()
    return s
