"""Exact parity of the fused upsample-conv vs nearest_up2 + conv3x3."""

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.ops.blocks import upsample_nearest2x
from tgsr_tpu.ops.fused_upsample import fuse_upconv_kernel, upconv2x_fused


def _reference(x, w):
    up = upsample_nearest2x(x)
    return jax.lax.conv_general_dilated(
        up, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_fused_upconv_exact():
    k = jax.random.PRNGKey(0)
    for (h, w, cin, cout) in [(4, 4, 3, 8), (7, 5, 16, 32), (16, 16, 64, 64)]:
        x = jax.random.normal(k, (2, h, w, cin), jnp.float32)
        kern = jax.random.normal(jax.random.fold_in(k, h), (3, 3, cin, cout),
                                 jnp.float32)
        ref = _reference(x, kern)
        fused = upconv2x_fused(x, jnp.asarray(fuse_upconv_kernel(kern)))
        assert ref.shape == fused.shape
        # identical math, different summation order: f32 reassociation noise
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                                   rtol=1e-4, atol=1e-4)


def test_fused_kernel_jnp_matches_numpy():
    from tgsr_tpu.ops.fused_upsample import fuse_upconv_kernel_jnp

    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 5, 7), jnp.float32)
    a = fuse_upconv_kernel(np.asarray(k))
    b = np.asarray(fuse_upconv_kernel_jnp(k))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_upblock_fused_equals_plain():
    from tgsr_tpu.ops.blocks import UpBlock

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 16), jnp.float32)
    plain = UpBlock(8, fused=False)
    v = plain.init(jax.random.PRNGKey(5), x)
    y_plain = plain.apply(v, x)
    y_fused = UpBlock(8, fused=True).apply(v, x)  # same variable tree
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_fused),
                               rtol=1e-4, atol=1e-4)
