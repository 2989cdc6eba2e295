"""Attention cores (fused-einsum formulation, TPU-native).

Two attention flavours exist in the reference:

1. `func_attention` (GlobalAttention.py:33-74): DAMSM word->region attention
   used inside the words loss. Double softmax: per-region over words (Eq. 8),
   then gamma1-sharpened per-word over regions (Eq. 9).

2. `GlobalAttentionGeneral` (GlobalAttention.py:77-130): generator word->pixel
   cross-attention. Pixel features attend to projected word embeddings with a
   padding mask; softmax over words.

Here both are expressed as batched einsums over channels-last layouts so XLA
fuses the reshape/matmul/softmax/matmul chain into MXU-friendly kernels.
A Pallas blockwise variant over the pixel axis lives in
tgsr_tpu/ops/pallas_attention.py.

Shape conventions (channels LAST everywhere):
  words:   [B, T, E]   (reference uses [B, E, T])
  regions: [B, R, E]   (reference uses [B, E, 17, 17], R = 289)
  pixels:  [B, H, W, C]
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9  # torch uses -inf; finite sentinel is safer under bf16/XLA


def masked_softmax(
    logits: jax.Array, mask: Optional[jax.Array], axis: int = -1
) -> jax.Array:
    """Softmax with `mask==True` positions forced to ~zero probability.

    Matches `attn.masked_fill_(mask, -inf); softmax(attn)`
    (GlobalAttention.py:110-118).
    """
    if mask is not None:
        logits = jnp.where(mask, NEG_INF, logits)
    return jax.nn.softmax(logits, axis=axis)


def func_attention(
    words: jax.Array,  # [B, T, E] word/query features
    regions: jax.Array,  # [B, R, E] image region features (R = ih*iw)
    gamma1: float,
    word_mask: Optional[jax.Array] = None,  # [B, T] True where padded
) -> Tuple[jax.Array, jax.Array]:
    """DAMSM attention (= GlobalAttention.py:33-74), fully batched.

    Returns (weighted_context [B, T, E], attn [B, T, R]).

    Step 1 (Eq. 8): for each region, softmax over words.
    Step 2 (Eq. 9): scale by gamma1, then for each word softmax over regions.
    weighted_context[t] = sum_r attn[t, r] * regions[r].

    `word_mask` generalizes the reference (which physically slices each
    caption to its true length in a Python loop, losses.py:81) to a single
    static-shape batched call: padded word slots are excluded from the Eq. 8
    softmax and produce garbage rows that the caller's cosine-similarity
    masking drops.
    """
    # Eq. (7): region-word affinity [B, R, T]
    attn = jnp.einsum("bre,bte->brt", regions, words)
    # Eq. (8): softmax over words (last axis), mask padded words
    m = word_mask[:, None, :] if word_mask is not None else None
    attn = masked_softmax(attn, m, axis=-1)
    # Eq. (9): transpose to [B, T, R], sharpen, softmax over regions
    attn = jnp.swapaxes(attn, 1, 2) * gamma1
    attn = jax.nn.softmax(attn, axis=-1)
    # weighted context [B, T, E]
    ctx = jnp.einsum("btr,bre->bte", attn, regions)
    return ctx, attn


def word_region_attention(*args, **kwargs):
    """Alias for func_attention (the DAMSM loss name for it)."""
    return func_attention(*args, **kwargs)


def word_pixel_attention(
    pixels: jax.Array,  # [B, H, W, C] image features (queries)
    words_proj: jax.Array,  # [B, T, C] projected word embeddings (keys=values)
    mask: Optional[jax.Array],  # [B, T] True where caption token == 0 (pad)
) -> Tuple[jax.Array, jax.Array]:
    """Generator cross-attention core (= GlobalAttention.py:87-130).

    attn[p, t] = softmax_t(<pixel_p, word_t>) with padded words masked to
    -inf; context_p = sum_t attn[p, t] * word_t.

    DELIBERATE FIX vs reference: GlobalAttention.py:112 applies
    `mask.repeat(queryL, 1)` to a batch-major [B*HW, T] logits view, which
    tiles mask rows [b0, b1, b0, ...] against rows ordered [b0q0, b0q1, ...]
    -- i.e. for batch > 1 each pixel row gets the WRONG sample's mask
    (inherited from upstream AttnGAN). The reference only ever evaluates at
    batch 1 where the two orderings coincide. This implementation applies
    each sample's own mask, which is the only semantics that makes batched
    inference correct.

    Returns (context [B, H, W, C], attn [B, T, H, W]) -- attention map layout
    matches the reference's `[B, sourceL, ih, iw]` return for visualization.
    """
    logits = jnp.einsum("bhwc,btc->bhwt", pixels, words_proj)
    m = mask[:, None, None, :] if mask is not None else None
    attn = masked_softmax(logits, m, axis=-1)
    ctx = jnp.einsum("bhwt,btc->bhwc", attn, words_proj)
    attn_maps = attn.transpose(0, 3, 1, 2)  # [B, T, H, W]
    return ctx, attn_maps


class WordPixelAttention(nn.Module):
    """= GlobalAttentionGeneral(idf, cdf) (GlobalAttention.py:77-130).

    Projects word embeddings cdf -> idf with a bias-free 1x1 "conv" (a plain
    matmul here) and cross-attends pixels to words.
    """

    idf: int  # pixel feature channels (e.g. 32)
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        pixels: jax.Array,  # [B, H, W, idf]
        words: jax.Array,  # [B, T, cdf]
        mask: Optional[jax.Array] = None,  # [B, T] True = padded
    ) -> Tuple[jax.Array, jax.Array]:
        # conv_context: 1x1 conv cdf->idf without bias == dense matmul
        words_proj = nn.Dense(self.idf, use_bias=False, name="conv_context")(words)
        if self.use_pallas:
            from tgsr_tpu.ops.pallas_attention import word_pixel_attention_pallas

            return word_pixel_attention_pallas(pixels, words_proj, mask)
        return word_pixel_attention(pixels, words_proj, mask)


class WordPixelAttentionWeighted(nn.Module):
    """= GlobalAttentionGeneral_weight (GlobalAttention.py:135-185).

    Pools the per-word attention mass into a scalar weight per word and
    rescales word features before the value matmul. (Reference author notes
    it underperforms; kept for capability parity.)
    """

    idf: int

    @nn.compact
    def __call__(self, pixels, words, mask=None):
        b, h, w, c = pixels.shape
        words_proj = nn.Dense(self.idf, use_bias=False, name="conv_context")(words)
        logits = jnp.einsum("bhwc,btc->bhwt", pixels, words_proj)
        m = mask[:, None, None, :] if mask is not None else None
        attn = masked_softmax(logits, m, axis=-1)  # [B, H, W, T]
        # AvgPool over all pixels -> per-word scalar weight [B, 1, T]
        w1 = jnp.mean(attn, axis=(1, 2), keepdims=False)[:, None, :]
        words_w = words_proj * jnp.swapaxes(w1, 1, 2)  # [B, T, idf]
        ctx = jnp.einsum("bhwt,btc->bhwc", attn, words_w)
        attn_maps = attn.transpose(0, 3, 1, 2)
        return ctx, attn_maps
