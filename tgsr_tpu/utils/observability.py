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
    """Append-only JSONL metrics stream (+ latest-value cache).

    With ``tensorboard=True`` every scalar is mirrored to TensorBoard
    event files under ``log_dir/tb`` (SURVEY §5 "TensorBoard/CSV
    writer"; the reference only ever prints, pretrain_DAMSM.py:109-116).
    Uses torch's event writer — always present in this stack — and
    degrades to JSONL-only with a one-line note if it is not.
    """

    def __init__(self, log_dir: str, name: str = "metrics",
                 tensorboard: bool = False, csv: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self.latest: Dict[str, Any] = {}
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception as e:  # missing/broken optional dep
                print(f"tensorboard writer unavailable ({e}); JSONL only")
        # CSV mirror: one row per log() call. The schema may evolve —
        # interleaved streams (train metrics + --eval_every rows) and
        # resume-append must not silently drop columns: the header is the
        # UNION of all keys seen, widened in place when a new key appears
        # (the file is one row per log call — a rewrite is cheap), and an
        # existing file's header is adopted on append so one file never
        # carries two schemas. JSONL stays the lossless record.
        self._csv_path = os.path.join(log_dir, f"{name}.csv")
        self._csv = None
        self._csv_cols = None
        if csv:
            import csv as _csv

            if (os.path.exists(self._csv_path)
                    and os.path.getsize(self._csv_path)):
                with open(self._csv_path, newline="") as f:
                    header = next(_csv.reader(f), None)
                self._csv_cols = header or None
            self._csv = open(self._csv_path, "a", buffering=1, newline="")
            self._csv_writer = _csv.writer(self._csv)

    def log(self, step: int, **metrics) -> None:
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self.latest.update(row)
        self._f.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in row.items():
                if k not in ("step", "time") and isinstance(v, float):
                    self._tb.add_scalar(k, v, int(step))
        if self._csv is not None:
            import csv as _csv

            if self._csv_cols is None:
                self._csv_cols = list(row)
                self._csv_writer.writerow(self._csv_cols)
            elif any(k not in self._csv_cols for k in row):
                # widen the header in place: existing columns keep their
                # order (new keys append), so old rows only gain padding.
                # Parse with the csv module — a string value containing a
                # comma is quoted on write, so counting raw ',' chars
                # would mis-pad every prior row.
                self._csv_cols += [k for k in row
                                   if k not in self._csv_cols]
                self._csv.close()
                with open(self._csv_path, newline="") as f:
                    old = list(_csv.reader(f))[1:]
                with open(self._csv_path, "w", newline="") as f:
                    w = _csv.writer(f)
                    w.writerow(self._csv_cols)
                    for cells in old:
                        w.writerow(cells
                                   + [""] * (len(self._csv_cols)
                                             - len(cells)))
                self._csv = open(self._csv_path, "a", buffering=1,
                                 newline="")
                self._csv_writer = _csv.writer(self._csv)
            self._csv_writer.writerow(
                [str(row.get(c, "")) for c in self._csv_cols])

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._csv is not None:
            self._csv.close()
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
