"""Pixel-fidelity and VAE losses.

= miscc/losses.py:779-810 (MSE, CycleMSE, weight_MSE, KL_loss).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from tgsr_tpu.ops.blocks import upsample_nearest


def mse_pyramid(fake: Sequence[jax.Array], label: Sequence[jax.Array]) -> jax.Array:
    """Sum of per-scale MSE over the image pyramid (= MSE, losses.py:779-784)."""
    return sum(jnp.mean((f - l) ** 2) for f, l in zip(fake, label))


def cycle_mse(fake_sr: Sequence[jax.Array], real_lr: jax.Array) -> jax.Array:
    """Bicubic-downsample each fake SR scale to LR size, MSE vs real LR
    (= CycleMSE, losses.py:785-790). antialias=False matches
    F.interpolate(mode='bicubic')'s plain kernel (torch does not antialias
    on downsample)."""
    from tgsr_tpu.ops.image import resize_bicubic_torch

    h, w = real_lr.shape[1:3]
    loss = 0.0
    for f in fake_sr:
        down = resize_bicubic_torch(f, (h, w))
        loss = loss + jnp.mean((down - real_lr) ** 2)
    return loss


def weight_mse(
    fake: Sequence[jax.Array],
    label: Sequence[jax.Array],
    attn_maps: Sequence[jax.Array],  # [B, T, h, w] per scale
) -> Tuple[jax.Array, jax.Array]:
    """Attention-weighted MSE (= weight_MSE, losses.py:792-804):
    w = max_t(attn); upsampled to image size; l2 = T*w * (f-l)^2, averaged
    over ALL dims (the reference divides by B*C*H*W via its .sum()/prod)."""
    loss = 0.0
    w_last = None
    for f, l, a in zip(fake, label, attn_maps):
        t = a.shape[1]
        w = jnp.max(a, axis=1, keepdims=True)  # [B, 1, h, w]
        w = w.transpose(0, 2, 3, 1)  # NHWC
        factor = f.shape[1] // w.shape[1]
        if factor > 1:
            w = upsample_nearest(w, factor)
        l2 = (t * w) * (f - l) ** 2
        loss = loss + jnp.mean(l2)
        w_last = w
    return loss, w_last


def kl_loss(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """-0.5 * mean(1 + logvar - mu^2 - exp(logvar)) (= KL_loss,
    losses.py:806-810; the reference takes the MEAN over all elements)."""
    return -0.5 * jnp.mean(1.0 + logvar - mu**2 - jnp.exp(logvar))
