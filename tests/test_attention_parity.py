"""Parity of the attention cores vs. the reference GlobalAttention.py."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tgsr_tpu.ops.attention import func_attention, word_pixel_attention  # noqa: E402
from tests.reference_oracle import load_reference  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted"
)


def test_func_attention_parity():
    ref = load_reference()
    B, E, T, ih = 3, 16, 5, 7
    g = torch.Generator().manual_seed(0)
    query = torch.randn(B, E, T, generator=g)  # [B, E, T] words
    context = torch.randn(B, E, ih, ih, generator=g)  # [B, E, 17, 17]
    wctx_t, attn_t = ref["GlobalAttention"].func_attention(query, context, 4.0)

    words = jnp.asarray(query.numpy().transpose(0, 2, 1))  # [B, T, E]
    regions = jnp.asarray(
        context.numpy().reshape(B, E, ih * ih).transpose(0, 2, 1)
    )  # [B, R, E]
    ctx_j, attn_j = func_attention(words, regions, 4.0)

    np.testing.assert_allclose(
        wctx_t.numpy().transpose(0, 2, 1), np.asarray(ctx_j), rtol=1e-5, atol=1e-5
    )
    # reference returns attn as [B, T, ih, iw]
    np.testing.assert_allclose(
        attn_t.numpy().reshape(B, T, ih * ih),
        np.asarray(attn_j),
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.parametrize("B,masked", [(1, True), (2, False)])
def test_global_attention_general_parity(B, masked):
    """Masked case runs at batch=1: the reference's mask.repeat(queryL, 1)
    (GlobalAttention.py:112) mis-tiles masks across batch items for B>1 (a
    latent upstream-AttnGAN bug; its eval protocol is batch 1), and our
    implementation deliberately applies the correct per-sample mask."""
    ref = load_reference()
    idf, cdf, T, H = 8, 12, 6, 5
    att = ref["GlobalAttention"].GlobalAttentionGeneral(idf, cdf)
    att.eval()
    g = torch.Generator().manual_seed(1)
    pixels = torch.randn(B, idf, H, H, generator=g)
    words = torch.randn(B, cdf, T, generator=g)
    if masked:
        mask = torch.zeros(B, T, dtype=torch.bool)
        mask[0, T - 2 :] = True
        att.applyMask(mask)
    else:
        mask = None
    with torch.no_grad():
        ctx_t, attn_t = att(pixels, words)

    w = att.conv_context.weight.detach().numpy()[:, :, 0, 0]  # [idf, cdf]
    words_proj = jnp.asarray(words.numpy().transpose(0, 2, 1)) @ jnp.asarray(w.T)
    ctx_j, attn_j = word_pixel_attention(
        jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1)),
        words_proj,
        jnp.asarray(mask.numpy()) if mask is not None else None,
    )

    np.testing.assert_allclose(
        ctx_t.numpy(),
        np.asarray(ctx_j).transpose(0, 3, 1, 2),
        rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        attn_t.numpy(), np.asarray(attn_j), rtol=1e-5, atol=1e-5
    )
