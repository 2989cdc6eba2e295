"""Multi-host (multi-process) distributed helpers.

The reference is strictly single-GPU (SURVEY.md 2.11); for the TPU build,
multi-host scaling is mesh-native: `jax.distributed.initialize` joins the
processes, the Mesh spans all hosts' devices, and XLA emits ICI/DCN
collectives. The only host-side work a framework owes its users is (a) a
safe initializer and (b) assembling a GLOBAL array from per-host input
shards -- the `jax.make_array_from_process_local_data` pattern.

Everything here degenerates correctly on one process (the tests run it on
the CPU x8 virtual backend).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-process JAX runtime; returns this process' index.

    Single-process (all args None and no cluster env): no-op returning 0 --
    so CLIs can call it unconditionally. On TPU pods the TPU runtime
    autodetects the topology and plain `jax.distributed.initialize()` works;
    explicit args cover CPU/GPU clusters.

    ORDERING: `jax.distributed.initialize` must run BEFORE any call that
    initializes the XLA backend, so the no-op decision is made purely from
    env vars -- never from `jax.process_count()` (which would initialize
    the backend and make a subsequent initialize() raise).
    """
    import os

    def _cluster_env() -> bool:
        if os.environ.get("JAX_COORDINATOR_ADDRESS") \
                or os.environ.get("COORDINATOR_ADDRESS") \
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            return True
        # TPU pods list every worker here; single-host TPU VMs set it too
        # (e.g. 'localhost'), so only >1 hostname indicates a pod
        hosts = [h for h in
                 os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
                 if h.strip()]
        return len(hosts) > 1

    if coordinator_address is None and num_processes is None \
            and not _cluster_env():
        if process_id is not None:
            # an explicit worker id with no way to find the coordinator
            # must not silently proceed as single-process 0 — the rest of
            # the pod would hang waiting for this worker
            raise ValueError(
                f"process_id={process_id} given but no coordinator is "
                "discoverable: pass coordinator_address+num_processes or "
                "set JAX_COORDINATOR_ADDRESS")
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def local_device_count() -> int:
    return jax.local_device_count()


def global_batch_from_local(mesh: Mesh, local_batch: Any) -> Any:
    """Assemble a GLOBAL data-sharded batch from each process' LOCAL shard.

    Every process passes its host-local numpy batch (its slice of the global
    batch along axis 0); the returned jax.Arrays are globally sharded over
    the 'data' mesh axis without any host ever holding the full batch --
    the per-host input pipeline pattern of SURVEY.md 2.11.
    """
    from tgsr_tpu.parallel.mesh import batch_spec

    def one(x):
        x = np.asarray(x)
        spec = batch_spec(mesh, x.ndim) if x.ndim else P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree.map(one, local_batch)


def land_batch(mesh: Mesh, host_batch: Any) -> Any:
    """Topology-agnostic DP batch landing for the training CLIs.

    Single-process: `shard_batch` (device_put each leaf pre-sharded on
    the mesh's batch axes). Multi-process: every process slices its
    `process_local_slice` out of the (identical) host batch and
    contributes it via `global_batch_from_local` — a device_put of the
    full batch would target non-addressable devices. Arrays must hold
    the FULL global batch on every process (the deterministic-loader
    convention: each host replays the same stream and lands only its
    slice); pipelines with genuinely per-host streams call
    `global_batch_from_local` directly. 0-d leaves replicate.
    """
    from tgsr_tpu.parallel.mesh import batch_spec, data_sharding

    def is_meta(x):  # host-side metadata lists (e.g. prepare_batch "keys")
        return isinstance(x, list) and bool(x) and isinstance(x[0], str)

    def is_arr(x):
        return isinstance(x, (np.ndarray, jax.Array)) and np.ndim(x)

    if jax.process_count() == 1:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(
            lambda x: jax.device_put(
                x, data_sharding(mesh, np.ndim(x)) if np.ndim(x) else repl)
            if isinstance(x, (np.ndarray, np.generic, jax.Array)) else x,
            host_batch, is_leaf=is_meta)

    dims = {np.shape(x)[0]
            for x in jax.tree.leaves(host_batch, is_leaf=is_meta)
            if is_arr(x)}
    assert len(dims) == 1, f"mixed leading dims {dims}"
    sl = process_local_slice(dims.pop())

    def one(x):
        if is_arr(x):
            arr = np.asarray(x)[sl]
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, batch_spec(mesh, arr.ndim)), arr)
        if is_meta(x):
            return x[sl]
        if isinstance(x, (np.ndarray, np.generic, jax.Array)):
            # 0-d leaf: replicate (same contract as the single-process
            # branch; a plain device_put would target non-addressable
            # devices, make_array_from_callback fills only local shards)
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, NamedSharding(mesh, P()), lambda idx: arr[idx])
        return x

    return jax.tree.map(one, host_batch, is_leaf=is_meta)


def is_main_process() -> bool:
    """True on the process that should perform host-side singleton writes
    (msgpack snapshots, metric logs, prints). Multi-process training runs
    every rank through the same loop — un-gated writes to a shared
    filesystem interleave and corrupt (orbax checkpoints are the
    exception: they are multi-process-coordinated by design)."""
    return jax.process_index() == 0


def fetch_to_host(tree: Any) -> Any:
    """Fetch a pytree to host numpy on EVERY process, including leaves
    sharded ACROSS processes (e.g. an FSDP g_ema): non-fully-addressable
    jax.Arrays are assembled with a cross-process allgather. COLLECTIVE
    when any leaf spans processes — all ranks must call it, then typically
    only is_main_process() writes the result."""
    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            # non-fully-addressable input -> fully replicated numpy value
            # at the ORIGINAL global shape (process_allgather's contract;
            # it requires tiled=True for global arrays)
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(one, tree)


def process_local_slice(n_global: int) -> slice:
    """This process' contiguous slice of a global batch of size n_global
    (equal split; n_global must divide by process_count)."""
    pc, pi = jax.process_count(), jax.process_index()
    assert n_global % pc == 0, (n_global, pc)
    per = n_global // pc
    return slice(pi * per, (pi + 1) * per)
