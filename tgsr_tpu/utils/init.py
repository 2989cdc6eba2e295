"""Weight re-initialization.

= weights_init (miscc/utils.py:454-464): orthogonal init for Conv/Linear
kernels, N(1, 0.02) for BatchNorm scales, zero biases. Applied to fresh
generator/discriminator trees before GAN training.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def orthogonal_reinit(params: Any, rng: jax.Array, scale: float = 1.0) -> Any:
    """Re-draw every kernel orthogonally, matching the reference convention.

    Conv kernels (HWIO) are reshaped to [fan_in, fan_out] for the orthogonal
    draw (= torch.nn.init.orthogonal_ on OIHW viewed as [O, I*H*W])."""
    leaves, treedef = jax.tree.flatten_with_path(params)
    keys = jax.random.split(rng, len(leaves))
    new = []
    for (path, leaf), key in zip(leaves, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        parent = path[-2].key if len(path) > 1 and hasattr(path[-2], "key") else ""
        if name == "kernel" and leaf.ndim >= 2:
            flat = leaf.reshape(-1, leaf.shape[-1])
            q = jax.nn.initializers.orthogonal(scale)(key, flat.shape,
                                                      leaf.dtype)
            new.append(q.reshape(leaf.shape))
        elif name == "scale":  # BatchNorm gamma ~ N(1, 0.02)
            new.append(1.0 + 0.02 * jax.random.normal(key, leaf.shape,
                                                      leaf.dtype))
        elif name == "bias":
            new.append(jnp.zeros_like(leaf))
        else:
            new.append(leaf)
    return jax.tree.unflatten(treedef, new)
