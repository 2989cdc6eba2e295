"""Device mesh + sharding helpers.

The reference has no parallelism at all (single GPU, SURVEY.md 2.11). Here
scaling is mesh-native: a `jax.sharding.Mesh` with ('data', 'model') axes;
batch dims shard over 'data' (DP), wide channel/word dims may shard over
'model' (TP demonstration -- the flagship model is ~1.2M params, so DP is
the production axis). XLA emits the ICI collectives; no transport code.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh. Defaults to all devices on the data axis.

    On a single chip this degenerates to a 1x1 mesh, keeping all sharded
    code paths valid (jit with fully-replicated shardings).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data >= 1 and n_model >= 1 and (
        n_data * n_model <= len(devices)), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def make_hybrid_mesh(
    n_slices: int,
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('dcn', 'data', 'model') mesh for multi-slice deployments.

    Multi-slice TPU pods connect chips WITHIN a slice over ICI and slices
    to each other over the much slower DCN, so the only collective that
    should cross slices is DP's per-step gradient all-reduce (the
    standard hybrid recipe; docs/SCALING.md "Multi-slice"). This helper
    encodes that: the leading 'dcn' axis enumerates slices (shard batch
    over it together with 'data' via `hybrid_data_spec`), while 'model'
    (TP) stays strictly intra-slice.

    On runtimes that expose slice topology (real multi-slice TPU), the
    device grid comes from `mesh_utils.create_hybrid_device_mesh`, which
    orders devices so the DCN axis truly maps to slice boundaries. On
    runtimes without slice granules (CPU tests, single-slice chips) it
    falls back to a row-major reshape — same mesh semantics, simulated
    topology — so the sharding/collective program is testable anywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_slices * n_model)
    need = n_slices * n_data * n_model
    if n_slices < 1 or n_data < 1 or n_model < 1 or need > len(devices):
        raise ValueError(
            f"hybrid mesh {n_slices}x{n_data}x{n_model} needs {need} "
            f"devices, have {len(devices)}")
    # Only take the topology-aware path when the runtime actually exposes
    # slice granules (real multi-slice TPU: every device carries a
    # slice_index and there is more than one slice). There a failure in
    # create_hybrid_device_mesh (e.g. n_slices not matching the real
    # granule count) must PROPAGATE — silently falling back to a row-major
    # reshape would put 'model'/'data' collectives on DCN links while
    # claiming success.
    slice_ids = {getattr(d, "slice_index", None) for d in devices[:need]}
    if None not in slice_ids and len(slice_ids) > 1:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, n_data, n_model), (n_slices, 1, 1), devices=devices[:need])
        grid = grid.reshape(n_slices, n_data, n_model)
    else:
        # no slice granules on this runtime (CPU tests, one real slice):
        # simulate the topology — same mesh semantics, deliberate fallback
        grid = np.asarray(devices[:need]).reshape(n_slices, n_data,
                                                  n_model)
    return Mesh(grid, ("dcn", "data", "model"))


def hybrid_data_spec(ndim: int = 1) -> P:
    """Batch partition spec on a HYBRID mesh specifically: DP over slices x
    intra-slice chips (axis 0 sharded over BOTH 'dcn' and 'data'). Only
    valid against a make_hybrid_mesh mesh — topology-agnostic code should
    use `batch_spec(mesh, ndim)`, which returns this on hybrid meshes and
    P('data', ...) on flat ones."""
    return P(("dcn", "data"), *([None] * (ndim - 1)))


def hybrid_shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard every leaf's leading axis over ('dcn', 'data'); scalars
    replicate. Alias of shard_batch, which is batch_axes-aware — kept as
    the documented entry point next to make_hybrid_mesh."""
    return shard_batch(tree, mesh)


def parse_mesh_arg(spec: str) -> tuple:
    """Parse a CLI mesh spec 'DATAxMODEL' (e.g. '8x1') -> (n_data, n_model).
    Raises ValueError on anything else — the CLIs turn that into a
    parser.error. Shared by cli.train_gan / cli.pretrain_damsm so the two
    entry points cannot drift apart."""
    parts = spec.lower().split("x")
    if len(parts) != 2:
        raise ValueError(spec)
    n_data, n_model = (int(t) for t in parts)
    if n_data < 1 or n_model < 1:
        raise ValueError(spec)
    return n_data, n_model


def fast_forward_key(key, n: int, index: int):
    """Replay `n` chained jax.random.split steps of a training rng stream
    in one jitted dispatch: key_{k+1} = split(key_k)[index]. The exact-
    resume machinery in both training CLIs uses this to continue the
    uninterrupted run's per-step rng chain (GANTrainer returns split[1],
    DAMSMTrainer.fit consumes split[0])."""
    import jax.numpy as jnp

    return jax.jit(lambda k, m: jax.lax.fori_loop(
        0, m, lambda _, kk: jax.random.split(kk)[index], k))(
            key, jnp.int32(n))


def batch_axes(mesh: Mesh) -> tuple:
    """The mesh axes a batch dim shards over: ('dcn', 'data') on hybrid
    multi-slice meshes (make_hybrid_mesh), ('data',) on flat meshes — so
    every DP consumer (trainers, inference, shard_batch) is topology-
    agnostic."""
    axes = tuple(a for a in ("dcn", "data") if a in mesh.axis_names)
    return axes or ("data",)


def batch_spec(mesh: Mesh, ndim: int = 1) -> P:
    """Batch partition spec for `mesh`: axis 0 over batch_axes(mesh)."""
    axes = batch_axes(mesh)
    first = axes[0] if len(axes) == 1 else axes  # plain name on flat meshes
    return P(first, *([None] * (ndim - 1)))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over the mesh's batch axes, replicate the rest."""
    return NamedSharding(mesh, batch_spec(mesh, ndim))


def batch_shards(mesh: Mesh) -> int:
    """How many ways the batch dim shards on `mesh` (the divisibility
    requirement for DP batches): data axis size, times the dcn axis on
    hybrid meshes."""
    n = 1
    for a in batch_axes(mesh):
        n *= mesh.shape[a]
    return n


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard every leaf's leading axis over the mesh's batch axes
    (batch_axes: ('dcn','data') on hybrid meshes, 'data' otherwise);
    scalar (0-d) leaves (e.g. pad_to_multiple's n_real count) replicate
    instead of crashing data_sharding with a rank-1 spec."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(
            x, data_sharding(mesh, np.ndim(x)) if np.ndim(x) else repl),
        tree,
    )


def fsdp_spec(shape: Sequence[int], n_shards: int, axis_name: str = "data",
              min_elements: int = 1024) -> P:
    """FSDP/ZeRO-3 partition spec for one parameter leaf: shard the LARGEST
    dimension divisible by `n_shards` over the mesh axis; replicate leaves
    that are small (< min_elements) or have no divisible dimension. The
    layout is storage-only — XLA all-gathers params before use and
    reduce-scatters their gradients, so which dim is sharded never changes
    the math, only the per-device resident bytes.
    """
    shape = tuple(shape)
    if n_shards <= 1 or int(np.prod(shape, dtype=np.int64)) < min_elements:
        return P()
    best = None
    for d, n in enumerate(shape):
        if n % n_shards == 0 and (best is None or n > shape[best]):
            best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def fsdp_shardings(tree: Any, mesh: Mesh, axis_name: str = "data",
                   min_elements: int = 1024) -> Any:
    """Per-leaf NamedShardings implementing an FSDP parameter/optimizer
    layout over `axis_name` (see fsdp_spec)."""
    n = mesh.shape[axis_name]
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh, fsdp_spec(np.shape(x), n, axis_name, min_elements)),
        tree,
    )


def fsdp_state(tree: Any, mesh: Mesh, axis_name: str = "data",
               min_elements: int = 1024) -> Any:
    """Place a state pytree in the FSDP layout (big leaves sharded over
    `axis_name`, small leaves replicated)."""
    return jax.tree.map(jax.device_put, tree,
                        fsdp_shardings(tree, mesh, axis_name, min_elements))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad a host batch so it divides the data axis; returns (padded, n_real)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad, mode="edge"), n
