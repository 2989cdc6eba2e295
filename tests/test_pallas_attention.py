"""Pallas fused attention vs. the einsum reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.ops.attention import word_pixel_attention
from tgsr_tpu.ops.pallas_attention import word_pixel_attention_pallas


@pytest.mark.parametrize("shape", [(2, 32, 32, 32), (1, 64, 64, 32)])
def test_pallas_matches_einsum(shape):
    b, h, w, c = shape
    t = 18
    k = jax.random.PRNGKey(0)
    pixels = jax.random.normal(k, shape, jnp.float32)
    words = jax.random.normal(jax.random.fold_in(k, 1), (b, t, c), jnp.float32)
    mask = jnp.zeros((b, t), bool).at[:, 12:].set(True)

    ctx_ref, attn_ref = word_pixel_attention(pixels, words, mask)
    ctx_p, attn_p = word_pixel_attention_pallas(pixels, words, mask)

    np.testing.assert_allclose(np.asarray(ctx_ref), np.asarray(ctx_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn_ref), np.asarray(attn_p),
                               rtol=1e-5, atol=1e-5)


def test_pallas_no_mask():
    b, h, w, c, t = 1, 32, 32, 32, 7
    k = jax.random.PRNGKey(2)
    pixels = jax.random.normal(k, (b, h, w, c), jnp.float32)
    words = jax.random.normal(jax.random.fold_in(k, 3), (b, t, c), jnp.float32)
    ctx_ref, attn_ref = word_pixel_attention(pixels, words, None)
    ctx_p, attn_p = word_pixel_attention_pallas(pixels, words, None)
    np.testing.assert_allclose(np.asarray(ctx_ref), np.asarray(ctx_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn_ref), np.asarray(attn_p),
                               rtol=1e-5, atol=1e-5)
