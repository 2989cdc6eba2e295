"""Device-side preprocessing + batch loading.

The reference does all preprocessing per-sample in DataLoader workers with
PIL (pyramid resizes, bicubic-upsampled LR, gaussian blur, normalize --
datasets.py:112-278). On TPU that work fuses into one jitted function that
runs on-device per batch: the host only decodes JPEG/PNG to uint8 HR.

device_preprocess(hr_uint8) -> {pyramid, lr, bic, blur_pyramid, bic_blur}
matches the tensor contract of prepare_datablur (datasets.py:71-109).
"""

from __future__ import annotations

import functools
import threading
import queue as queue_mod
from typing import Any, Dict, Iterator

import jax
import numpy as np

from tgsr_tpu.ops.image import (
    build_pyramid,
    gaussian_blur,
    normalize_uint8,
    resize,
)


@functools.partial(jax.jit, static_argnames=("n_branches", "base_size",
                                             "with_blur"))
def device_preprocess(hr_uint8: jax.Array, n_branches: int, base_size: int,
                      with_blur: bool = True) -> Dict[str, Any]:
    """hr_uint8 [B, H, W, 3] -> the full per-branch tensor set, normalized
    to [-1, 1]:
      pyramid[i]  = resize(HR, base*2^i)          (= get_imgs ret)
      lr          = pyramid[0]
      bic[i]      = bicubic(LR -> base*2^i)       (= get_imgs bic)
      blur*[...]  = GaussianBlur(radius=2) copies (= get_imgs_blur)
    """
    hr = normalize_uint8(hr_uint8)
    pyramid = build_pyramid(hr, n_branches, base_size)
    lr = pyramid[0]
    bic = [resize(lr, (p.shape[1], p.shape[2]), "cubic") if i > 0 else lr
           for i, p in enumerate(pyramid)]
    out = {"pyramid": pyramid, "lr": lr, "bic": bic}
    if with_blur:
        out["blur_pyramid"] = [gaussian_blur(p, 2.0) for p in pyramid]
        out["bic_blur"] = [gaussian_blur(b, 2.0) for b in bic]
    return out


class BatchLoader:
    """Simple threaded host loader: decodes images + encodes captions on a
    background thread, yields numpy batches (the reference's
    DataLoader(num_workers=cfg.WORKERS) role)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 deterministic_captions: bool = False, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.deterministic_captions = deterministic_captions
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, Any]]:
        from tgsr_tpu.data.datasets import prepare_batch

        rng = np.random.default_rng(self.seed + 1000 * epoch)
        idx = self._indices(epoch)
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        n_batches = len(self)

        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that notices consumer abandonment: without the
            # stop check, a consumer breaking out of epoch() early (e.g.
            # a max_batches eval loop) would leave this thread blocked on
            # q.put forever, leaking a thread + its buffered batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker():
            # sentinel delivery is unconditional: a decode error must
            # propagate to the consumer, not deadlock it on q.get()
            try:
                for b in range(n_batches):
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    if len(sel) < self.batch_size and self.drop_last:
                        break
                    examples = [
                        self.dataset.__getitem__(
                            int(i), rng=rng,
                            sent_ix=0 if self.deterministic_captions
                            else None)
                        for i in sel
                    ]
                    if not _put(prepare_batch(examples)):
                        return
            except BaseException as e:  # noqa: BLE001 -- forwarded
                _put(e)
                return
            _put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # generator closed/abandoned: release the worker
            stop.set()


def device_prefetch(batches: Iterator[Dict[str, Any]], depth: int = 2,
                    sharding=None, put=None) -> Iterator[Dict[str, Any]]:
    """Overlap host->device transfer with device compute: device_put each
    numpy batch `depth` steps ahead of consumption, so step N's compute
    hides step N+1..N+depth's H2D copies (the role torch's
    pin_memory+non_blocking prefetch plays; the reference has neither —
    its DataLoader hands CPU tensors to `.cuda()` inside prepare_data,
    datasets.py:33-68, serializing transfer behind the step).

    `sharding`: optional jax sharding (e.g. parallel.mesh.data_sharding)
    applied to every array — DP trainers pass their batch sharding so the
    prefetch lands shards directly on each device.

    `put`: optional batch-landing override (tree -> tree of device
    arrays); multi-process trainers pass parallel.multihost.land_batch so
    the cross-process assembly is ALSO dispatched `depth` steps ahead
    (device_put/make_array dispatch is async, so the overlap carries over).

    Python-level lists/scalars pass through untouched (e.g. the "keys"
    field of prepare_batch)."""
    from collections import deque

    if put is None:
        def put(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding)
                if isinstance(x, (np.ndarray, jax.Array)) else x, tree)

    buf: deque = deque()
    it = iter(batches)
    try:
        while True:
            while len(buf) < depth:
                try:
                    buf.append(put(next(it)))
                except StopIteration:
                    while buf:
                        yield buf.popleft()
                    return
            yield buf.popleft()
    finally:
        buf.clear()
