"""Request-level micro-batching server for SR serving.

The reference's serving surface is a Python loop over single images
(gen_exampleSRHL, trainer_objective.py:55-165): one image per forward, no
concurrency. A production front-end must instead coalesce concurrent
requests into MXU-filling batches while bounding tail latency.
BatchingServer is that front-end around SRPipeline:

    server = BatchingServer(pipe, max_batch=64, max_delay_ms=5)
    fut = server.submit(lr, caption, cap_len)   # thread-safe, any thread
    sr = fut.result()                           # uint8 [H, W, 3]

Design notes (TPU-first):
  * planned shapes: a batch is padded up to the next planned size (powers
    of two by default) so XLA compiles a handful of programs, not one per
    request count — the same philosophy as sr_batched's (m, b) plan
    (engine/inference.py:307)
  * one collector thread owns the device: requests never race a dispatch,
    and device order == completion order (no reordering layer needed)
  * max_delay_ms bounds how long the FIRST request of a batch waits for
    co-riders; under load batches fill to max_batch and the timer never
    fires, so throughput converges to the batched-pipeline rate
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence

import numpy as np


class BatchingServer:
    def __init__(self, pipeline, max_batch: int = 64,
                 max_delay_ms: float = 5.0,
                 planned_sizes: Optional[Sequence[int]] = None,
                 lr_shape: Optional[Sequence[int]] = None):
        """`pipeline`: an SRPipeline (its jitted forward caches one
        compiled program per planned batch size). `planned_sizes` defaults
        to the powers of two up to max_batch. `lr_shape`: expected [h, w, 3]
        of every request; defaults to the first request's shape (one batch
        MUST be stackable — mismatched requests are rejected at submit)."""
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.pipeline = pipeline
        self.max_batch = int(max_batch)
        self.max_delay = float(max_delay_ms) / 1e3
        if planned_sizes is None:
            planned_sizes = []
            b = 1
            while b < self.max_batch:
                planned_sizes.append(b)
                b *= 2
            planned_sizes.append(self.max_batch)
        self.planned_sizes = sorted(set(int(b) for b in planned_sizes))
        if self.planned_sizes[-1] != self.max_batch:
            raise ValueError("planned_sizes must include max_batch")
        self._T = pipeline.cfg.TEXT.WORDS_NUM
        self._lr_shape = tuple(lr_shape) if lr_shape else None
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self._lock = threading.Lock()
        # guards stats against concurrent readers (healthz polls) while the
        # collector mutates
        self._stats_lock = threading.Lock()
        self.stats: Dict[str, object] = {
            "requests": 0, "batches": 0, "batch_hist": {},
            "latency_ms": [],  # bounded, most recent first 4096
        }
        self._thread = threading.Thread(target=self._collector, daemon=True,
                                        name="tgsr-batching-server")
        self._thread.start()

    # ---- client API -----------------------------------------------------

    def submit(self, lr: np.ndarray, caption: np.ndarray,
               cap_len: int) -> Future:
        """Enqueue one request. lr [h, w, 3] float32 in [-1, 1]; caption
        [T] int32 (0-padded); cap_len its true length. Returns a Future
        resolving to the SR image as uint8 [H, W, 3]."""
        fut: Future = Future()
        lr = np.asarray(lr, np.float32)
        caption = np.asarray(caption, np.int32)
        if lr.ndim != 3 or lr.shape[-1] != 3:
            fut.set_exception(ValueError(f"lr must be [h,w,3], {lr.shape}"))
            return fut
        if caption.shape != (self._T,):
            fut.set_exception(ValueError(
                f"caption must be [{self._T}], got {caption.shape}"))
            return fut
        # the enqueue must be atomic with the closed check AND the shape
        # pinning: a put after close() would strand the future (the
        # collector has already drained), and a mismatched lr shape would
        # kill the whole batch at np.stack time
        with self._lock:
            if self._closed:
                fut.set_exception(RuntimeError("server closed"))
                return fut
            if self._lr_shape is None:
                self._lr_shape = lr.shape  # pinned by the first request
            if lr.shape != self._lr_shape:
                fut.set_exception(ValueError(
                    f"lr shape {lr.shape} != server's {self._lr_shape}"))
                return fut
            self._queue.put((lr, caption, int(cap_len),
                             time.perf_counter(), fut))
        return fut

    def warmup(self, lr_shape=None) -> None:
        """Compile every planned batch size up front (first-request latency
        otherwise pays the compile). Uses (and pins) the server's lr
        shape; pass lr_shape=[h, w, 3] if neither the ctor nor a prior
        request established it."""
        with self._lock:
            if lr_shape is not None:
                self._lr_shape = tuple(lr_shape)
            if self._lr_shape is None:
                raise ValueError("no lr_shape known: pass warmup(lr_shape=)"
                                 " or construct with lr_shape=")
            shape = self._lr_shape
        for b in self.planned_sizes:
            lr = np.zeros((b,) + shape, np.float32)
            caps = np.ones((b, self._T), np.int32)
            lens = np.full((b,), 2, np.int32)
            self.pipeline.sr_uint8(lr, caps, lens)

    def close(self, timeout: float = 30.0) -> None:
        """Drain the queue and stop the collector."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._queue.put(None)  # wake the collector
        self._thread.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- collector ------------------------------------------------------

    def _plan(self, n: int) -> int:
        for b in self.planned_sizes:
            if b >= n:
                return b
        return self.max_batch

    def _collector(self) -> None:
        while True:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                with self._lock:
                    if self._closed and self._queue.empty():
                        return
                continue
            if first is None:
                # shutdown wake: keep draining whatever is still queued
                with self._lock:
                    if self._closed and self._queue.empty():
                        return
                continue
            batch: List[tuple] = [first]
            deadline = time.perf_counter() + self.max_delay
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    break
                batch.append(item)
            self._run_batch(batch)

    def _run_batch(self, batch: List[tuple]) -> None:
        # Claim every rider up front: set_running_or_notify_cancel moves a
        # pending future to RUNNING (after which fut.cancel() can no longer
        # succeed) and returns False for one already cancelled. Without
        # this, a caller-side cancel() landing between a done() check and
        # set_result() raises InvalidStateError and KILLS the collector
        # thread — every later submit would then hang forever.
        batch = [r for r in batch if r[4].set_running_or_notify_cancel()]
        if not batch:
            return
        n = len(batch)
        try:
            b = self._plan(n)
            lrs = np.stack([r[0] for r in batch] + [batch[-1][0]] * (b - n))
            caps = np.stack([r[1] for r in batch] + [batch[-1][1]] * (b - n))
            lens = np.asarray([r[2] for r in batch]
                              + [batch[-1][2]] * (b - n), np.int32)
            out = self.pipeline.sr_uint8(lrs, caps, lens)
        except Exception as e:  # propagate to every rider of this batch --
            # the collector thread must survive any single batch failing
            for r in batch:
                if not r[4].done():  # claimed above: cancel can't race
                    r[4].set_exception(e)
            return
        now = time.perf_counter()
        with self._stats_lock:
            st = self.stats
            st["requests"] += n
            st["batches"] += 1
            st["batch_hist"][b] = st["batch_hist"].get(b, 0) + 1
            lat = st["latency_ms"]
            lat.extend((now - r[3]) * 1e3 for r in batch)
            del lat[:-4096]
        # resolve futures OUTSIDE the stats lock: set_result runs done-
        # callbacks synchronously, and one of those could read stats
        for i, r in enumerate(batch):
            r[4].set_result(out[i])  # claimed RUNNING above: cannot race

    # ---- monitoring -----------------------------------------------------

    def stats_snapshot(self) -> Dict[str, object]:
        """Consistent copy of the counters for concurrent readers (the
        collector mutates stats under the same lock)."""
        with self._stats_lock:
            st = self.stats
            return {"requests": st["requests"], "batches": st["batches"],
                    "batch_hist": dict(st["batch_hist"])}

    def latency_percentiles(self) -> Dict[str, float]:
        with self._stats_lock:
            lat = list(self.stats["latency_ms"])
        if not lat:
            return {}
        a = np.asarray(lat)
        return {"p50_ms": float(np.percentile(a, 50)),
                "p99_ms": float(np.percentile(a, 99))}
