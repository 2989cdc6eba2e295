"""Parity of the fused up+conv+BN+GLU+head kernel vs the unfused chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.ops.pallas_up_head import (
    fold_bn,
    fused_up_head,
    fused_up_head_packed,
    reference_up_head,
)


def _inputs(b, h, w, cin, c2, head_k, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 8)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    w_up = 0.2 * jax.random.normal(ks[1], (3, 3, cin, c2), jnp.float32)
    scale = 1 + 0.1 * jax.random.normal(ks[2], (c2,))
    bias = 0.1 * jax.random.normal(ks[3], (c2,))
    mean = 0.1 * jax.random.normal(ks[4], (c2,))
    var = jnp.abs(1 + 0.2 * jax.random.normal(ks[5], (c2,)))
    bn_mul, bn_add = fold_bn(scale, bias, mean, var)
    w_head = 0.2 * jax.random.normal(ks[6], (head_k, head_k, c2 // 2, 3),
                                     jnp.float32)
    srb = jax.random.normal(ks[7], (b, 2 * h, 2 * w, 3), jnp.float32)
    return x, w_up, bn_mul, bn_add, w_head, srb


@pytest.mark.parametrize("cfg", [
    # (h, w, cin, c2, head_k, tanh, blend, tile)
    (16, 16, 64, 64, 3, False, False, 8),
    (16, 16, 64, 64, 5, True, True, 8),
    (8, 8, 32, 64, 3, False, False, 16),  # single tile (th == 2h)
    (12, 12, 16, 32, 5, True, False, 8),  # non-pow2 H
])
def test_fused_up_head_parity(cfg):
    h, w, cin, c2, head_k, use_tanh, blend, tile = cfg
    x, w_up, bn_mul, bn_add, w_head, srb = _inputs(2, h, w, cin, c2, head_k)
    a = jnp.asarray(0.5)
    ref = reference_up_head(x, w_up, bn_mul, bn_add, w_head, srb, a,
                            use_tanh=use_tanh, blend=blend)
    got = fused_up_head(x, w_up, bn_mul, bn_add, w_head, srb, a,
                        head_k=head_k, use_tanh=use_tanh, blend=blend,
                        tile_rows=tile)
    assert ref.shape == got.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cfg", [
    (16, 16, 64, 64, 3, False, False, 8),
    (16, 16, 64, 64, 5, True, True, 8),
    (8, 8, 32, 64, 3, False, False, 16),
    (12, 12, 16, 32, 5, True, False, 4),
])
def test_fused_up_head_packed_parity(cfg):
    h, w, cin, c2, head_k, use_tanh, blend, tile = cfg
    x, w_up, bn_mul, bn_add, w_head, srb = _inputs(2, h, w, cin, c2, head_k,
                                                   seed=1)
    a = jnp.asarray(0.5)
    ref = reference_up_head(x, w_up, bn_mul, bn_add, w_head, srb, a,
                            use_tanh=use_tanh, blend=blend)
    got = fused_up_head_packed(x, w_up, bn_mul, bn_add, w_head, srb, a,
                               head_k=head_k, use_tanh=use_tanh, blend=blend,
                               tile_rows=tile)
    assert ref.shape == got.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-4)
