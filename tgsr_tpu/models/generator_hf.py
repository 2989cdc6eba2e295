"""High-frequency SRResNet branch.

= NetG_high (model.py:133-209), NetG_highweight (model.py:212-298),
NetG_high_SR_weight (model.py:301-336).

Faithful quirk: in the reference, `self.a = nn.Parameter(...).cuda()`
(model.py:246-248) returns a plain tensor, so `a` is NOT registered in the
state dict (verified absent from netGH_epoch_7.pth) and evaluates to the
constructor constant 0.5 at inference. Here `a` IS a proper parameter
(trainable), and the torch-checkpoint converter initializes it to 0.5 --
reproducing the effective reference behavior while fixing the bug for
training.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgsr_tpu.ops.blocks import (
    ResBlock,
    UpBlock,
    batch_norm,
    depth_to_space,
    glu,
    space_to_depth,
)


class _ConvInBlock(nn.Module):
    """conv3x3(cin -> 2*ngf) -> BN -> GLU (the `convin` Sequential)."""

    ngf: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.ngf * 2, (3, 3), use_bias=False, padding="SAME",
                    name="conv")(x)
        x = batch_norm(train, name="bn")(x)
        return glu(x)


class _ResidualSeq(nn.Module):
    """conv3x3(ngf->2ngf) -> BN -> GLU -> conv3x3(ngf->ngf) -> BN
    (the `residual24` / `residual48` Sequential, model.py:229-232).
    NOTE: unlike ResBlock there is NO identity skip."""

    ngf: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.ngf * 2, (3, 3), use_bias=False, padding="SAME",
                    name="conv1")(x)
        h = batch_norm(train, name="bn1")(h)
        h = glu(h)
        h = nn.Conv(self.ngf, (3, 3), use_bias=False, padding="SAME",
                    name="conv2")(h)
        h = batch_norm(train, name="bn2")(h)
        return h


class _ConvOutput(nn.Module):
    """conv5x5(ngf -> 3) [+ Tanh] (model.py:223-226); weights shared across
    scales in the reference -- instantiated once, called three times."""

    use_tanh: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(3, (5, 5), use_bias=False, padding="SAME", name="conv")(x)
        return jnp.tanh(x) if self.use_tanh else x


class NetGHighWeight(nn.Module):
    """= NetG_highweight (model.py:212-298). x8 high-frequency branch that
    blends its per-scale output with the low-frequency pyramid:
        ims_i = one * conv_output(feat_i) + a * SRb_i
    """

    ngf: int = 32
    weightmap: bool = False
    low: str = "lr"  # 'lr' | 'lrblur' | 'lr-lrblur' (model.py:267-272)
    use_act: bool = True
    n_res: int = 6
    sizes: tuple = (64, 128, 256)  # weightmap spatial sizes (a1, a2, a3)
    fused_upsample: bool = False
    remat: bool = False  # rematerialize per-block (2x-channel GLU temps)

    @nn.compact
    def __call__(
        self,
        lr_img: jax.Array,  # [B, h, w, 3]
        srb: List[jax.Array],  # low-freq pyramid [64, 128, 256]
        lr_blur: Optional[jax.Array] = None,
        train: bool = False,
    ):
        if self.low == "lrblur":
            x = lr_blur
        elif self.low == "lr-lrblur":
            x = lr_img - lr_blur
        elif self.low == "lr":
            x = lr_img
        else:
            raise ValueError(self.low)

        ResCls, ResSeqCls, UpCls = ResBlock, _ResidualSeq, UpBlock
        if self.remat:
            ResCls = nn.remat(ResCls, static_argnums=(2,))
            ResSeqCls = nn.remat(ResSeqCls, static_argnums=(2,))
            UpCls = nn.remat(UpCls, static_argnums=(2,))

        out = _ConvInBlock(self.ngf, name="convin")(x, train)
        for i in range(self.n_res):
            out = ResCls(self.ngf, name=f"residual_{i}")(out, train)

        conv_output = _ConvOutput(self.use_act, name="conv_output")

        if self.weightmap:
            a1 = self.param("a1", nn.initializers.ones, (self.sizes[0],) * 2)
            a2 = self.param("a2", nn.initializers.ones, (self.sizes[1],) * 2)
            a3 = self.param("a3", nn.initializers.ones, (self.sizes[2],) * 2)
            weights = [a1[None, :, :, None], a2[None, :, :, None],
                       a3[None, :, :, None]]
            ones = [1.0, 1.0, 1.0]
        else:
            a = self.param(
                "a", lambda key, shape: jnp.full(shape, 0.5, jnp.float32), (1,)
            )
            weights = [a, a, a]
            ones = [1.0, 1.0, 1.0]

        fu = self.fused_upsample
        out = UpCls(self.ngf, fused=fu, name="upscale2x")(out, train)
        ims2 = ones[0] * conv_output(out) + weights[0] * srb[0]

        out = ResSeqCls(self.ngf, name="residual24")(out, train)
        out = UpCls(self.ngf, fused=fu, name="upscale4x")(out, train)
        ims4 = ones[1] * conv_output(out) + weights[1] * srb[1]

        out = ResSeqCls(self.ngf, name="residual48")(out, train)
        out = UpCls(self.ngf, fused=fu, name="upscale8x")(out, train)
        ims8 = ones[2] * conv_output(out) + weights[2] * srb[2]

        return [ims2, ims4, ims8], weights[2], ones[2]


class NetGHigh(nn.Module):
    """= NetG_high (model.py:133-209): additive-residual variant
    (ims_i = conv_output(feat_i) + SRb_i) with optional concat mode."""

    ngf: int = 32
    cat: bool = False
    n_res: int = 6

    @nn.compact
    def __call__(
        self,
        lr_img: jax.Array,
        srb: List[jax.Array],
        lr_blur: Optional[jax.Array] = None,
        low: bool = False,
        train: bool = False,
        outmiddle: bool = False,
    ):
        conv_output = _ConvOutput(True, name="conv_output")
        up2 = UpBlock(self.ngf, name="upscale2x")
        up4 = UpBlock(self.ngf, name="upscale4x")
        up8 = UpBlock(self.ngf, name="upscale8x")

        if self.cat:
            lrh = lr_img - lr_blur
            out = _ConvInBlock(self.ngf, name="convin")(
                jnp.concatenate([lrh, lr_blur], -1), train
            )
            out = up2(out, train)
            ims2 = conv_output(out)
            out = _ResidualSeq(self.ngf, name="residual24")(
                jnp.concatenate([ims2, srb[0]], -1), train
            )
            out = up4(out, train)
            ims4 = conv_output(out)
            out = _ResidualSeq(self.ngf, name="residual48")(
                jnp.concatenate([ims4, srb[1]], -1), train
            )
            out = up8(out, train)
            ims8 = conv_output(out)
            return [ims2, ims4, ims8]

        x = lr_blur if low else (lr_img - lr_blur)
        out = _ConvInBlock(self.ngf, name="convin")(x, train)
        for i in range(self.n_res):
            out = ResBlock(self.ngf, name=f"residual_{i}")(out, train)
        out = up2(out, train)
        f1 = out
        ims2 = conv_output(out) + srb[0]
        out = _ResidualSeq(self.ngf, name="residual24")(out, train)
        out = up4(out, train)
        f2 = out
        ims4 = conv_output(out) + srb[1]
        out = _ResidualSeq(self.ngf, name="residual48")(out, train)
        out = up8(out, train)
        f3 = out
        ims8 = conv_output(out) + srb[2]
        if outmiddle:
            return [ims2, ims4, ims8], [f1, f2, f3]
        return [ims2, ims4, ims8]


class NetGHighSRWeight(nn.Module):
    """= NetG_high_SR_weight (model.py:301-336): space-to-depth fusion
    variant with a 256x256 weight map."""

    ngf: int = 32
    size: int = 256

    @nn.compact
    def __call__(self, lr_img, srb, lr_blur=None, train: bool = False):
        # reference ties residual1 and residual to ONE Sequential
        # (model.py:312: `self.residual1 = self.residual = ...`)
        residual = _ResidualSeq(self.ngf, name="residual")

        out = _ConvInBlock(self.ngf, name="convin1")(lr_img, train)
        out = residual(out, train)
        xlr = UpBlock(self.ngf, name="upscale2x")(out, train)

        sr = srb[-1]
        x = space_to_depth(sr, 4)
        out = _ConvInBlock(self.ngf, name="convin")(x, train)
        out = residual(out, train)

        out1 = jnp.concatenate([xlr, out], -1)
        h = nn.Conv(self.ngf * 4 * 4 * 2, (3, 3), use_bias=False,
                    padding="SAME", name="convmd_conv")(out1)
        h = batch_norm(train, name="convmd_bn")(h)
        out2 = glu(h)
        out2 = depth_to_space(out2, 4)
        a = self.param("a", nn.initializers.ones, (self.size, self.size))
        im = _ConvOutput(True, name="conv_output")(out2) + a[None, :, :, None] * sr
        return [im], a
