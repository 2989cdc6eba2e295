"""Mixed-precision tree helpers shared by the trainers.

Contract (GANTrainer / DAMSMTrainer docstrings): compute in bf16, keep
f32 MASTER copies of params, losses and BN running statistics. The cast
helpers handle the first two; `merge_stats` handles the third.

flax BatchNorm computes batch statistics AND the running-average blend in
f32 even under bf16 inputs (verified empirically; the returned
batch_stats are f32) -- so the only precision loss in the
cast-variables-per-step pattern is that the blend starts from the bf16
CAST of the old state:

    new = momentum * cast(master) + (1 - momentum) * batch_stat

`merge_stats` removes exactly that term by adding back
``momentum * (master - cast(master))``, recovering the f32 recursion
``momentum * master + (1-momentum) * batch_stat`` EXACTLY: the master
accumulates at full precision while the forward keeps its bf16 dataflow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast float leaves to `dtype` (no-op for f32 target)."""
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def uncast_floats(tree, dtype):
    """Inverse of cast_floats: float leaves back to f32."""
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def merge_stats(master, new, compute_dtype, momentum: float = 0.9):
    """Master-precision update of BN running statistics (module docstring).

    `master`: the f32 state that was cast to `compute_dtype` for the apply;
    `new`: the f32 blend flax returned, seeded from that cast;
    `momentum`: the BN running momentum (0.9 everywhere in this repo --
    torch-default semantics, ops/blocks.py:116 and the Inception BNs).
    Returns the exact f32 recursion's result.
    """
    if compute_dtype == jnp.float32:
        return new

    def one(o, n):
        cast_err = o - o.astype(compute_dtype).astype(o.dtype)
        return n.astype(o.dtype) + momentum * cast_err

    return jax.tree.map(one, master, new)
