"""Pallas TPU kernel: fused word->pixel cross-attention.

The generator cross-attention (GlobalAttention.py:87-130) is
  logits = pixels @ words^T -> mask -> softmax_T -> ctx = attn @ words
with HW up to 65,536 pixels and T <= 18 words. XLA materializes the
[B, HW, T] attention tensor in HBM between the two matmuls; this kernel
streams pixel tiles through VMEM and fuses mask+softmax+both matmuls, so
HBM traffic is just pixels-in + context-out (plus the attention map only
when the caller asks for it).

The pixel axis is the "sequence" here (SURVEY.md 5: the long-context
analogue); the grid tiles it, so sharding HW across a mesh axis composes
naturally (each shard runs its own tile range -- no cross-tile reduction
because softmax is over the tiny T axis, not over pixels).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(pixels_ref, words_ref, mask_ref, ctx_ref, attn_ref):
    """One (batch b, pixel-tile i) step.

    pixels: [BLOCK, C] tile; words: [T, C]; mask: [1, T] (1.0 = padded).
    Writes ctx [BLOCK, C] and attn [BLOCK, T].
    """
    px = pixels_ref[0]  # [BLOCK, C]
    wd = words_ref[0]  # [T, C]
    logits = jax.lax.dot_general(
        px, wd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [BLOCK, T]
    m = mask_ref[0]  # [1, T] float, 1.0 where padded
    logits = logits + m * NEG_INF
    attn = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.dot(attn.astype(wd.dtype), wd,
                  preferred_element_type=jnp.float32)
    ctx_ref[0] = ctx.astype(ctx_ref.dtype)
    attn_ref[0] = attn.astype(attn_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _attention_flat(pixels_flat: jax.Array,  # [B, HW, C]
                    words: jax.Array,  # [B, T, C]
                    mask_f: jax.Array,  # [B, T] float 1.0 = padded
                    block: int = 512,
                    interpret: bool = False):
    b, hw, c = pixels_flat.shape
    t = words.shape[1]
    n_tiles = hw // block
    grid = (b, n_tiles)
    ctx, attn = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, T] so the trailing block dims equal the array dims
            # (TPU lowering tiling constraint)
            pl.BlockSpec((1, 1, t), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block, c), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, t), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), pixels_flat.dtype),
            jax.ShapeDtypeStruct((b, hw, t), pixels_flat.dtype),
        ],
        interpret=interpret,
    )(pixels_flat, words, mask_f[:, None, :])
    return ctx, attn


def _should_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def word_pixel_attention_pallas(
    pixels: jax.Array,  # [B, H, W, C]
    words_proj: jax.Array,  # [B, T, C]
    mask: Optional[jax.Array],  # [B, T] bool, True = padded
    block: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.attention.word_pixel_attention.

    Returns (context [B, H, W, C], attn [B, T, H, W]). Pixel tiles must
    divide HW; H*W >= block is guaranteed for every generator stage
    (smallest is 32*32 = 1024)."""
    b, h, w, c = pixels.shape
    hw = h * w
    blk = min(block, hw)
    while hw % blk:
        blk //= 2
    t = words_proj.shape[1]
    if mask is None:
        mask_f = jnp.zeros((b, t), pixels.dtype)
    else:
        mask_f = mask.astype(pixels.dtype)
    ctx, attn = _attention_flat(
        pixels.reshape(b, hw, c), words_proj.astype(pixels.dtype), mask_f,
        block=blk, interpret=_should_interpret())
    ctx = ctx.reshape(b, h, w, c)
    attn = attn.reshape(b, h, w, t).transpose(0, 3, 1, 2)
    return ctx, attn
