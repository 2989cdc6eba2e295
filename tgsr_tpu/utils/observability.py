"""Tracing, metrics, and numerical-safety utilities.

The reference has no profiling, no sanitizers, and print-only logging
(SURVEY.md 5): wall-clock prints at pretrain_DAMSM.py:109-116 and a Log dir
that is created but never written (trainer_objective.py:26-29). This module
supplies the TPU-native equivalents:

  * profile_trace -- jax.profiler trace context (view in XProf/Perfetto)
  * StepTimer     -- EMA step timing (the `ms/batch` print, structured)
  * MetricsLogger -- JSONL + optional CSV metric stream per step
  * nan_guard     -- checkify wrapper that turns silent NaN/Inf into errors
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: `with profile_trace('/tmp/trace'): step()`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA of step wall-time; call .tick() once per step."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.ema_ms: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = (now - self._last) * 1e3
            self.ema_ms = (dt if self.ema_ms is None
                           else self.decay * self.ema_ms + (1 - self.decay) * dt)
        self._last = now
        return self.ema_ms


class MetricsLogger:
    """Append-only JSONL metrics stream (+ latest-value cache)."""

    def __init__(self, log_dir: str, name: str = "metrics"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self.latest: Dict[str, Any] = {}

    def log(self, step: int, **metrics) -> None:
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self.latest.update(row)
        self._f.write(json.dumps(row) + "\n")

    def close(self) -> None:
        self._f.close()


def nan_guard(fn: Callable) -> Callable:
    """Wrap a jittable fn so NaN/Inf in any intermediate raises instead of
    propagating (the jax.checkify equivalent of a debug sanitizer).

    Usage:
        safe_step = nan_guard(train_step)   # returns (err-checked) outputs
    """
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
