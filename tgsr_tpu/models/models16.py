"""x16 SR generator variants.

= models16.py (reference). These differ from the x8 models mainly by WEIGHT
TYING quirks that must be preserved for checkpoint parity:

  * G_SR_NET_low: h_net2 == h_net3 == h_net4 (ONE NEXT_STAGE_G instance,
    models16.py:13) and all four img_nets tied (models16.py:14, with Tanh --
    GET_IMAGE_G, unlike the x8 no-Tanh heads)
  * NetG_high: all upscale blocks tied, all residual blocks tied
    (models16.py:48,53)
  * NetG_highweight: blocks untied, but the 16x step REUSES residual48 +
    upscale8x instead of the declared residual816/upscale16x
    (models16.py:171-173), and the non-weightmap path blends the LAST scale
    against SRb8 instead of SRb16 (models16.py:178). Both preserved behind
    `fix_bugs=False`.

In linen, instantiating a module once and calling it repeatedly shares
parameters -- the direct equivalent of the reference's aliased attributes.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgsr_tpu.models.generator import (
    CANet,
    GetImageG,
    InitStageGImgUp,
    NextStageG,
)
from tgsr_tpu.models.generator_hf import _ConvInBlock, _ConvOutput, _ResidualSeq
from tgsr_tpu.ops.blocks import ResBlock, UpBlock


class GSRNetLow16(nn.Module):
    """= models16.G_SR_NET_low: 4 stages, stages 2-4 weight-tied."""

    ngf: int = 32
    c_dim: int = 100
    r_num: int = 2
    remat: bool = False  # rematerialize each stage in the backward pass

    @nn.compact
    def __call__(self, lr_img, sent_emb, words, mask, rng=None, train=False):
        _, mu, logvar = CANet(self.c_dim, name="ca_net")(sent_emb, rng)
        # remat keeps only stage-boundary features live in the backward
        # (same policy as the x8 GSRNetLow, generator.py)
        InitCls, NextCls = InitStageGImgUp, NextStageG
        if self.remat:
            InitCls = nn.remat(InitCls, static_argnums=(4,))
            NextCls = nn.remat(NextCls, static_argnums=(4,))
        # ONE shared next-stage and ONE shared image head
        next_stage = NextCls(self.ngf, self.r_num, name="h_net2")
        img_net = GetImageG(use_tanh=True, name="img_net1")

        fake_imgs, att_maps = [], []
        h, att = InitCls(self.ngf, self.r_num, name="h_net1")(
            lr_img, words, mask, train)
        fake_imgs.append(img_net(h))
        att_maps.append(att)
        for _ in range(3):  # h_net2 == h_net3 == h_net4
            h, att = next_stage(h, words, mask, train)
            fake_imgs.append(img_net(h))
            att_maps.append(att)
        return fake_imgs, att_maps, mu, logvar


class NetGHigh16(nn.Module):
    """= models16.NetG_high: additive-residual x16 branch with ALL upscale
    and ALL inter-scale residual blocks tied."""

    ngf: int = 32
    n_res: int = 6

    @nn.compact
    def __call__(self, lr_img, srb: List[jax.Array], lr_blur=None,
                 low: bool = False, train: bool = False):
        conv_output = _ConvOutput(True, name="conv_output")
        upscale = UpBlock(self.ngf, name="upscale2x")  # tied across scales
        residual_seq = _ResidualSeq(self.ngf, name="residual24")  # tied

        x = lr_blur if low else (lr_img - lr_blur)
        out = _ConvInBlock(self.ngf, name="convin")(x, train)
        for i in range(self.n_res):
            out = ResBlock(self.ngf, name=f"residual_{i}")(out, train)

        ims = []
        out = upscale(out, train)
        ims.append(conv_output(out) + srb[0])
        for k in range(1, 4):
            out = residual_seq(out, train)
            out = upscale(out, train)
            ims.append(conv_output(out) + srb[k])
        return ims


class NetGHighWeight16(nn.Module):
    """= models16.NetG_highweight (x16 blend variant)."""

    ngf: int = 32
    weightmap: bool = False
    low: str = "lr-lrblur"
    n_res: int = 6
    sizes: tuple = (32, 64, 128, 256)
    fix_bugs: bool = False  # True corrects models16.py:171-178
    remat: bool = False  # rematerialize per-block (2x-channel GLU temps)

    @nn.compact
    def __call__(self, lr_img, srb: List[jax.Array], lr_blur=None,
                 train: bool = False):
        if self.low == "lrblur":
            x = lr_blur
        elif self.low == "lr-lrblur":
            x = lr_img - lr_blur
        elif self.low == "lr":
            x = lr_img
        else:
            raise ValueError(self.low)

        # same per-block remat policy as the x8 NetGHighWeight
        # (generator_hf.py): ResBlock/_ResidualSeq/UpBlock recompute in the
        # backward; param trees are unchanged by nn.remat
        ResCls, ResSeqCls, UpCls = ResBlock, _ResidualSeq, UpBlock
        if self.remat:
            ResCls = nn.remat(ResCls, static_argnums=(2,))
            ResSeqCls = nn.remat(ResSeqCls, static_argnums=(2,))
            UpCls = nn.remat(UpCls, static_argnums=(2,))

        out = _ConvInBlock(self.ngf, name="convin")(x, train)
        for i in range(self.n_res):
            out = ResCls(self.ngf, name=f"residual_{i}")(out, train)

        conv_output = _ConvOutput(True, name="conv_output")
        up2 = UpCls(self.ngf, name="upscale2x")
        up4 = UpCls(self.ngf, name="upscale4x")
        up8 = UpCls(self.ngf, name="upscale8x")
        up16 = UpCls(self.ngf, name="upscale16x")
        res24 = ResSeqCls(self.ngf, name="residual24")
        res48 = ResSeqCls(self.ngf, name="residual48")
        res816 = ResSeqCls(self.ngf, name="residual816")

        if self.weightmap:
            ws = [self.param(f"a{i+1}", nn.initializers.ones,
                             (s, s))[None, :, :, None]
                  for i, s in enumerate(self.sizes)]
        else:
            a = self.param(
                "a", lambda key, shape: jnp.full(shape, 0.5, jnp.float32), (1,))
            ws = [a] * 4

        ims = []
        out = up2(out, train)
        ims.append(conv_output(out) + ws[0] * srb[0])
        out = res24(out, train)
        out = up4(out, train)
        ims.append(conv_output(out) + ws[1] * srb[1])
        out = res48(out, train)
        out = up8(out, train)
        ims.append(conv_output(out) + ws[2] * srb[2])
        if self.fix_bugs:
            out = res816(out, train)
            out = up16(out, train)
            last_srb = srb[3]
        else:
            # faithful to models16.py:171-173: reuses residual48 + upscale8x
            out = res48(out, train)
            out = up8(out, train)
            # models16.py:178: non-weightmap path blends against SRb8
            last_srb = srb[3] if self.weightmap else srb[2]
        # NOTE: in the buggy non-weightmap path srb[2] (128px) broadcasts
        # against a 512px conv output in torch only because eval never ran
        # this branch; here the faithful path requires weightmap or fix_bugs
        # when shapes must agree. Shapes agree when srb[2] == srb[3] size
        # (never in practice) -- so mirror torch behavior by slicing:
        if (not self.fix_bugs) and (not self.weightmap) \
                and last_srb.shape[1] != out.shape[1]:
            # torch would raise here too; fall back to the declared blocks'
            # output scale to keep the module usable (documented deviation)
            last_srb = jax.image.resize(
                last_srb, (last_srb.shape[0], out.shape[1], out.shape[2], 3),
                "nearest")
        ims.append(conv_output(out) + ws[3] * last_srb)
        return ims, ws[3], 1.0
