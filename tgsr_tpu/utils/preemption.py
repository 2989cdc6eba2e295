"""Preemption handling: route SIGTERM onto the CLIs' graceful Ctrl-C path.

TPU VMs and batch schedulers announce preemption/maintenance with
SIGTERM; the reference only ever handles KeyboardInterrupt
(pretrain_DAMSM.py:293-295). Both training CLIs already implement a
correct interrupt path for KeyboardInterrupt -- final snapshot, async
checkpoint-writer join -- so translating the signal is all that is
needed for a preempted run to leave a resumable checkpoint instead of
dying mid-step.
"""

from __future__ import annotations

import contextlib
import signal


@contextlib.contextmanager
def graceful_sigterm():
    """Raise KeyboardInterrupt in this process on SIGTERM.

    Yields True when the handler was installed, False when it could not
    be (signal handlers only install from the main thread -- e.g. a CLI
    main() driven inside a worker thread by a test); the previous
    handler is restored on exit either way, so nesting and in-process
    test invocations stay clean.
    """
    def _raise(signum, frame):
        raise KeyboardInterrupt(f"signal {signum}")

    try:
        prev = signal.signal(signal.SIGTERM, _raise)
    except ValueError:  # not the main thread
        yield False
        return
    try:
        yield True
    finally:
        signal.signal(signal.SIGTERM, prev)
