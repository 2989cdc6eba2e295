"""Reusable conv blocks (NHWC, TPU-native).

Functional/semantic parity with the reference block library (util.py:16-131),
re-designed channels-last for TPU: XLA tiles NHWC convs directly onto the MXU
without layout transposes. BatchNorm matches torch eval/train semantics
(eps 1e-5, running-stat momentum 0.1).

Reference mapping:
  GLU                 -> util.py:45-53   (channel-halving gate, dim 1 in NCHW
                                          == last dim here)
  conv1x1/3x3/5x5     -> util.py:56-70   (bias-free)
  upBlock             -> util.py:74-80   (nearest x2 -> conv3x3(in->2out) -> BN -> GLU)
  upBlocknoBN         -> util.py:83-88
  downBlock           -> util.py:92-98   (conv4x4 s2 -> BN -> LeakyReLU 0.2)
  Block3x3_relu       -> util.py:102-107
  ResBlock            -> util.py:110-130
  DepthToSpace/SpaceToDepth -> util.py:16-41
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def glu(x: jax.Array) -> jax.Array:
    """Channel-halving gated linear unit over the LAST axis.

    = util.py:49-53 (`x[:, :nc] * sigmoid(x[:, nc:])` in NCHW). Channel order
    is preserved by the OIHW->HWIO weight conversion, so splitting the last
    axis is numerically identical.
    """
    nc = x.shape[-1]
    assert nc % 2 == 0, "channels dont divide 2!"
    nc //= 2
    return x[..., :nc] * jax.nn.sigmoid(x[..., nc:])


class GLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return glu(x)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


def upsample_nearest2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour x2 upsample, NHWC (= nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


def depth_to_space(x: jax.Array, block_size: int) -> jax.Array:
    """Pixel-shuffle (util.py:16-27), NHWC variant with identical pixel order.

    Torch views NCHW as (N, bs, bs, C', H, W) then permutes to
    (N, C', H, bs, W, bs): channel index c = b1*bs*C' + b2*C' + c'.
    """
    n, h, w, c = x.shape
    bs = block_size
    cp = c // (bs * bs)
    x = x.reshape(n, h, w, bs, bs, cp)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h, bs, w, bs, cp
    return x.reshape(n, h * bs, w * bs, cp)


def space_to_depth(x: jax.Array, block_size: int) -> jax.Array:
    """Inverse pixel-shuffle (util.py:30-41)."""
    n, h, w, c = x.shape
    bs = block_size
    x = x.reshape(n, h // bs, bs, w // bs, bs, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h', w', bs, bs, c
    return x.reshape(n, h // bs, w // bs, bs * bs * c)


class Conv1x1(nn.Module):
    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                       padding="SAME", name="conv")(x)


class Conv3x3(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), use_bias=False,
                       padding="SAME", name="conv")(x)


class Conv5x5(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (5, 5), use_bias=False,
                       padding="SAME", name="conv")(x)


def batch_norm(train: bool, name: str = "bn") -> nn.BatchNorm:
    """BatchNorm matching torch defaults: eps=1e-5, running momentum 0.1
    (flax momentum 0.9 <=> new = 0.9*old + 0.1*batch)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class _Conv3x3Kernel(nn.Module):
    """Holds a canonical 3x3 HWIO kernel under <name>/kernel so fused and
    plain execution paths share the same checkpoint layout."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.out_features))


class UpBlock(nn.Module):
    """nearest x2 -> conv3x3(in -> 2*out) -> BN -> GLU (= util.py:74-80).

    With `fused=True` the upsample+conv computes as an algebraically
    identical 2x2 conv at the SOURCE resolution + depth_to_space
    (0.44x FLOPs, MXU-friendlier shape; see ops/fused_upsample.py). The
    parameter stays the canonical 3x3 kernel, so checkpoints convert the
    same either way; the kernel transform folds at compile time.
    """

    out_features: int
    use_bn: bool = True
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = _Conv3x3Kernel(x.shape[-1], self.out_features * 2,
                                name="conv")()
        if self.fused:
            from tgsr_tpu.ops.fused_upsample import (
                fuse_upconv_kernel_jnp,
                upconv2x_fused,
            )

            x = upconv2x_fused(x, fuse_upconv_kernel_jnp(
                kernel.astype(x.dtype)))
        else:
            x = upsample_nearest2x(x)
            x = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bn:
            x = batch_norm(train)(x)
        return glu(x)


class UpBlockNoBN(nn.Module):
    """= util.py:83-88."""

    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample_nearest2x(x)
        x = nn.Conv(self.out_features * 2, (3, 3), use_bias=False,
                    padding="SAME", name="conv")(x)
        return glu(x)


class DownBlock(nn.Module):
    """conv4x4 stride2 pad1 -> BN -> LeakyReLU(0.2) (= util.py:92-98)."""

    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch pad=1 each side with k=4,s=2 == SAME for even spatial dims
        x = nn.Conv(self.out_features, (4, 4), strides=(2, 2), use_bias=False,
                    padding=((1, 1), (1, 1)), name="conv")(x)
        x = batch_norm(train)(x)
        return leaky_relu(x)


class Block3x3Relu(nn.Module):
    """conv3x3 -> BN -> GLU, keeps spatial size (= util.py:102-107)."""

    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_features * 2, (3, 3), use_bias=False,
                    padding="SAME", name="conv")(x)
        x = batch_norm(train)(x)
        return glu(x)


class ResBlock(nn.Module):
    """conv3x3(c->2c) -> [BN] -> GLU -> conv3x3(c->c) -> [BN], + identity
    (= util.py:110-130)."""

    features: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features * 2, (3, 3), use_bias=False,
                    padding="SAME", name="conv1")(x)
        if self.use_bn:
            h = batch_norm(train, name="bn1")(h)
        h = glu(h)
        h = nn.Conv(self.features, (3, 3), use_bias=False,
                    padding="SAME", name="conv2")(h)
        if self.use_bn:
            h = batch_norm(train, name="bn2")(h)
        return h + x


class PlainResidualBlock(nn.Module):
    """conv -> [BN] -> LeakyReLU -> conv -> [BN], + identity
    (= model.py:8-30 `_Residual_Block`; unused by the shipped eval path)."""

    features: int = 64
    use_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (3, 3), use_bias=False,
                    padding="SAME", name="conv1")(x)
        if self.use_norm:
            h = batch_norm(train, name="in1")(h)
        h = leaky_relu(h)
        h = nn.Conv(self.features, (3, 3), use_bias=False,
                    padding="SAME", name="conv2")(h)
        if self.use_norm:
            h = batch_norm(train, name="in2")(h)
        return h + x
