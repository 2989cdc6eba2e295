"""Pipeline parallelism (PP): GPipe-style microbatch pipelining of a
homogeneous block chain over a mesh axis.

The reference is strictly single-GPU (SURVEY.md 2.11) — PP has no upstream
counterpart. The TPU-native construction: stack the chain's per-block
variables on a leading axis, shard that axis over a 'stage' mesh axis, and
run the classic rotating schedule inside `jax.shard_map` — each device
applies its stage (a `lax.scan` over its local block slice) and hands its
activation to the next device with `lax.ppermute` over ICI. Microbatches
enter at stage 0 one per step; after the S-1-step fill the pipeline is
full and every device works every step (bubble fraction (S-1)/(M+S-1)).

Honest scope: the flagship model is ~1.2M params, so PP never *pays* here —
DP is the production axis (docs/SCALING.md). This module is the harness a
deeper derivative would use, demonstrated on the real refiner chain
(NetGHighWeight's `residual_{i}` ResBlocks, model.py:212-298 analogue)
with exact-equality evidence: tests/test_pipeline.py and the PP leg of
`__graft_entry__.dryrun_multichip`.

Eval-mode only (BatchNorm running stats): microbatching is then exactly
equivalent to the unsplit forward. Train-mode BN would see per-microbatch
statistics — the standard GPipe caveat — so training PP is out of scope.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_block_variables(vars_list: Sequence[Any]) -> Any:
    """Stack N identical per-block variable pytrees on a new leading axis.

    Every block must have the same tree structure and leaf shapes (a
    homogeneous chain, e.g. N ResBlocks of one width).
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *vars_list)


def extract_chain(variables: Any, names: Sequence[str]) -> Any:
    """Pull a named submodule chain out of flax `variables` and stack it.

    `variables` is the usual {'params': {...}, 'batch_stats': {...}} dict
    of the OWNING module; `names` are the child module names in chain
    order (e.g. ['residual_0', ..., 'residual_5'] for NetGHighWeight).
    """
    per_block = [
        {col: variables[col][n] for col in variables if n in variables[col]}
        for n in names
    ]
    return stack_block_variables(per_block)


def make_stage_mesh(n_stages: int,
                    devices: Sequence[jax.Device] | None = None) -> Mesh:
    """A 1-axis ('stage',) mesh over the first `n_stages` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_stages > len(devices):
        raise ValueError(
            f"pipeline needs {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), ("stage",))


def pipeline_apply(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_vars: Any,
    x: jax.Array,
    mesh: Mesh,
    n_micro: int,
    axis: str = "stage",
) -> jax.Array:
    """Run `x` through the stacked block chain, pipelined over `mesh[axis]`.

    block_fn(one_block_vars, h) -> h applies ONE block (shape-preserving).
    `stacked_vars` leaves are [n_blocks, ...]; the leading axis shards over
    the mesh axis, so each of the S devices holds n_blocks/S consecutive
    blocks and applies them as its stage. `x` is [B, ...] and is split into
    `n_micro` microbatches that flow through the ring schedule.

    Returns block_n-1(...block_0(x)) exactly (eval-mode chains), computed
    with S-way pipeline parallelism.
    """
    n_blocks = jax.tree.leaves(stacked_vars)[0].shape[0]
    S = mesh.shape[axis]
    if n_blocks % S:
        raise ValueError(f"{n_blocks} blocks do not split over {S} stages")
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    micro = x.reshape(n_micro, B // n_micro, *x.shape[1:])
    # place explicitly on THIS mesh: callers may hand in arrays committed
    # to a different mesh (e.g. TP-sharded params from a training step)
    stacked_vars = jax.device_put(stacked_vars, NamedSharding(mesh, P(axis)))
    micro = jax.device_put(micro, NamedSharding(mesh, P()))
    perm = [(i, (i + 1) % S) for i in range(S)]
    M = n_micro

    def per_device(local_vars, micro):
        idx = jax.lax.axis_index(axis)

        def apply_stage(h):
            def body(h, one_block):
                return block_fn(one_block, h), None

            h, _ = jax.lax.scan(body, h, local_vars)
            return h

        def step(carry, t):
            state, out_buf = carry
            # stage 0 feeds microbatch t while any remain; everyone else
            # consumes what the previous stage ppermuted in last step
            feed = jax.lax.dynamic_index_in_dim(
                micro, jnp.minimum(t, M - 1), 0, keepdims=False)
            h = apply_stage(jnp.where(idx == 0, feed, state))
            # the last stage finishes microbatch m = t - (S-1)
            m = jnp.clip(t - (S - 1), 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(out_buf, m, 0, keepdims=False)
            done = jnp.logical_and(t >= S - 1, idx == S - 1)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(done, h, cur), m, 0)
            state = jax.lax.ppermute(h, axis, perm)
            return (state, out_buf), None

        init = (jnp.zeros_like(micro[0]), jnp.zeros_like(micro))
        (_, out_buf), _ = jax.lax.scan(step, init, jnp.arange(M + S - 1))
        # only the last stage holds real outputs; psum broadcasts them
        return jax.lax.psum(
            jnp.where(idx == S - 1, out_buf, jnp.zeros_like(out_buf)), axis)

    fn = jax.shard_map(per_device, mesh=mesh,
                       in_specs=(P(axis), P()), out_specs=P(),
                       check_vma=False)
    out = fn(stacked_vars, micro)
    return out.reshape(B, *x.shape[1:])
