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


class TrainCheckpointer:
    """Persistent ASYNC checkpoint writer for training loops.

    `save_train_state` builds and tears down a manager per call and blocks
    until the bytes are on disk — fine for a final save, wasteful inside a
    step loop. This keeps ONE orbax CheckpointManager open with async
    checkpointing: `save()` returns as soon as the state is copied off the
    device (orbax performs the device->host snapshot synchronously, then
    serializes in a background thread), so the next train steps — including
    donated-buffer steps that reuse the saved state's device memory — run
    concurrently with the disk write. The reference's closest analogue is a
    blocking torch.save every SNAPSHOT_INTERVAL (pretrain_DAMSM.py:286-292).

    Use as a context manager; `close()` joins the background write.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any) -> None:
        """Async save; returns after the device->host copy. A save already
        in flight is joined first (orbax serializes commits)."""
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, template: Any, step: Optional[int] = None) -> tuple:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoints in this manager")
        import orbax.checkpoint as ocp

        self.wait()
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)), step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        """Block until every queued async write is committed."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()  # joins pending writes

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
