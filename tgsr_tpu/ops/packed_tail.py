"""Parity-packed (space-to-depth) XLA formulation of the 2x-upsample tail.

The canonical generator tail
    y = head_conv( GLU( BN( conv3x3( nearest_up2(x) ) ) ) )   [+ tanh/blend]
does all its work at the DOUBLED resolution with few channels (64) -- the
worst shape for the 128-lane MXU. In the parity-packed domain the same math
runs at the SOURCE resolution with 4x channels:

  * up2+conv3x3 -> ONE 2x2 conv producing 4 parity classes of channels
    (ops/fused_upsample.py transform; 0.44x FLOPs)
  * BN/GLU -> elementwise on class-tiled channels
  * the head conv (3x3 or 5x5 on the doubled grid) -> ONE 3x3 conv on the
    packed grid with a class-remapped kernel (ops/pallas_up_head.py
    pack_head_kernel); SAME zero-padding on the packed grid is exactly SAME
    zero-padding on the interleaved grid for k in {3, 5}
  * blends/tanh stay packed; depth_to_space only once at the very end.

Unlike the round-1 UpBlock(fused=True) experiment (which paid a
depth_to_space shuffle after EVERY up block and benched slower), here the
tensor STAYS packed through the whole tail, so the only shuffle is the
final d2s of a 12-channel image.

Numerical parity with the unpacked chain is exact up to float reassociation
(tests/test_packed_tail.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgsr_tpu.ops.blocks import depth_to_space
from tgsr_tpu.ops.fused_upsample import fuse_upconv_kernel_jnp
from tgsr_tpu.ops.pallas_up_head import pack_head_kernel_jnp


def upconv2x_packed(x: jax.Array, w_fused: jax.Array) -> jax.Array:
    """conv3x3(nearest_up2(x)) in packed form: [B,H,W,Cin] -> [B,H,W,4*Cout]
    with class-major channels ((di*2+dj)*Cout + c). No depth_to_space."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w_fused, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    cout = w_fused.shape[-1] // 4
    y00 = y[:, :-1, :-1, 0 * cout:1 * cout]
    y01 = y[:, :-1, 1:, 1 * cout:2 * cout]
    y10 = y[:, 1:, :-1, 2 * cout:3 * cout]
    y11 = y[:, 1:, 1:, 3 * cout:4 * cout]
    return jnp.concatenate([y00, y01, y10, y11], axis=-1)


def packed_bn_glu(y4: jax.Array, bn_mul: jax.Array,
                  bn_add: jax.Array) -> jax.Array:
    """Per-ORIGINAL-channel BN affine + GLU, applied to class-major packed
    channels: [B,H,W,4*C2] -> [B,H,W,4*(C2//2)]."""
    b, h, w, c4 = y4.shape
    c2 = bn_mul.shape[0]
    y4 = y4 * jnp.tile(bn_mul, 4) + jnp.tile(bn_add, 4)
    g = y4.reshape(b, h, w, 4, c2)
    half = c2 // 2
    g = g[..., :half] * jax.nn.sigmoid(g[..., half:].astype(jnp.float32)
                                       ).astype(y4.dtype)
    return g.reshape(b, h, w, 4 * half)


def packed_head_conv(g: jax.Array, w_head_packed: jax.Array) -> jax.Array:
    """SAME head conv on the packed grid: [B,H,W,4C] x [3,3,4C,4*cout]
    -> [B,H,W,4*cout] (class-major)."""
    return jax.lax.conv_general_dilated(
        g, w_head_packed, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def packed_up_head(
    x: jax.Array,  # [B, H, W, Cin] source-resolution features
    w_up: jax.Array,  # [3, 3, Cin, C2] canonical up-conv kernel
    bn_mul: jax.Array,  # [C2] folded BN scale
    bn_add: jax.Array,  # [C2] folded BN shift
    w_head: jax.Array,  # [k, k, C2//2, cout] head kernel (k in {3, 5})
    use_tanh: bool = False,
    srb_packed: Optional[jax.Array] = None,  # [B,H,W,4*cout] packed blend
    a: Optional[jax.Array] = None,  # scalar blend weight
    unpack: bool = True,
) -> jax.Array:
    """The whole tail in one packed chain. Returns the interleaved
    [B, 2H, 2W, cout] image (or the packed form when unpack=False)."""
    dt = x.dtype
    wp_up = fuse_upconv_kernel_jnp(w_up.astype(dt))
    wp_head = pack_head_kernel_jnp(w_head).astype(dt)
    g = packed_bn_glu(upconv2x_packed(x, wp_up), bn_mul.astype(dt),
                      bn_add.astype(dt))
    out = packed_head_conv(g, wp_head)
    if use_tanh:
        out = jnp.tanh(out)
    if srb_packed is not None:
        out = out + (a if a is not None else 1.0) * srb_packed
    if unpack:
        out = depth_to_space(out, 2)
    return out


def packed_up_features(x: jax.Array, w_up: jax.Array, bn_mul: jax.Array,
                       bn_add: jax.Array) -> jax.Array:
    """Just the up-block in packed form: [B,H,W,Cin] -> packed
    [B,H,W,4*(C2//2)] GLU features (class-major)."""
    dt = x.dtype
    wp_up = fuse_upconv_kernel_jnp(w_up.astype(dt))
    return packed_bn_glu(upconv2x_packed(x, wp_up), bn_mul.astype(dt),
                         bn_add.astype(dt))


# Eval-mode BN -> (mul, add): one implementation, shared with the pallas
# kernel module (a second copy here had already drifted to 1/sqrt vs
# rsqrt — same math, but an eps/formula fix would silently miss the twin)
from tgsr_tpu.ops.pallas_up_head import fold_bn as fold_bn_eval  # noqa: E402,F401,E501
