"""Packed-domain tail parity vs the canonical unpacked chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.ops.blocks import space_to_depth, upsample_nearest2x
from tgsr_tpu.ops.packed_tail import (
    fold_bn_eval,
    packed_up_features,
    packed_up_head,
)


def _ref_chain(x, w_up, mul, add, w_head, use_tanh, srb=None, a=None):
    y = upsample_nearest2x(x)
    y = jax.lax.conv_general_dilated(
        y, w_up, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * mul + add
    c = y.shape[-1] // 2
    g = y[..., :c] * jax.nn.sigmoid(y[..., c:])
    kh = w_head.shape[0] // 2
    out = jax.lax.conv_general_dilated(
        g, w_head, (1, 1), [(kh, kh), (kh, kh)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if use_tanh:
        out = jnp.tanh(out)
    if srb is not None:
        out = out + a * srb
    return out, g


@pytest.mark.parametrize("k,use_tanh,blend", [(3, False, False),
                                              (5, True, True)])
def test_packed_up_head_parity(k, use_tanh, blend):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    B, H, W, CIN, C2 = 2, 12, 20, 16, 32
    x = jax.random.normal(ks[0], (B, H, W, CIN))
    w_up = 0.2 * jax.random.normal(ks[1], (3, 3, CIN, C2))
    scale = 1.0 + 0.1 * jax.random.normal(ks[2], (C2,))
    bias = 0.1 * jax.random.normal(ks[3], (C2,))
    mean = 0.1 * jax.random.normal(ks[4], (C2,))
    var = 0.5 + jax.random.uniform(ks[5], (C2,))
    w_head = 0.2 * jax.random.normal(ks[6], (k, k, C2 // 2, 3))
    srb = jax.random.normal(ks[7], (B, 2 * H, 2 * W, 3)) if blend else None
    a = 0.37 if blend else None

    mul, add = fold_bn_eval(scale, bias, mean, var)
    ref, ref_g = _ref_chain(x, w_up, mul, add, w_head, use_tanh, srb, a)

    srb_packed = space_to_depth(srb, 2) if blend else None
    got = packed_up_head(x, w_up, mul, add, w_head, use_tanh=use_tanh,
                         srb_packed=srb_packed, a=a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # the packed GLU features unpack to the reference features
    from tgsr_tpu.ops.blocks import depth_to_space

    g_packed = packed_up_features(x, w_up, mul, add)
    np.testing.assert_allclose(np.asarray(depth_to_space(g_packed, 2)),
                               np.asarray(ref_g), rtol=1e-4, atol=1e-5)
