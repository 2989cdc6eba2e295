"""Low-frequency (text-attentive) SR generator stack.

= CA_NET (util.py:372-400), INIT_STAGE_GImgup (util.py:726-777),
NEXT_STAGE_G (util.py:781-823), GET_IMAGE_G* (util.py:894-933),
G_SR_NET_low / G_SR_NET_low_stage1 (model.py:34-130).

All tensors are NHWC; images live in [-1, 1].

Faithful quirks preserved:
  * CA_NET samples noise even at eval (util.py:388-395) but its c_code output
    is UNUSED by the SR path (model.py:52 passes None/ignores) -- so inference
    is deterministic; mu/logvar only feed the KL term during training.
  * The low-branch image heads have no Tanh (GET_IMAGE_G_noAct, model.py:44-46);
    the [-1,1] range is enforced only at save time.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgsr_tpu.ops.attention import WordPixelAttention
from tgsr_tpu.ops.blocks import (
    ResBlock,
    UpBlock,
    UpBlockNoBN,
    batch_norm,
    glu,
    leaky_relu,
    upsample_nearest2x,
)


class CANet(nn.Module):
    """Conditioning augmentation (= CA_NET, util.py:372-400).

    Linear t_dim -> 4*c_dim -> GLU -> split (mu, logvar); reparametrize.
    """

    c_dim: int = 100

    @nn.compact
    def __call__(
        self, sent_emb: jax.Array, rng: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = nn.Dense(self.c_dim * 4, use_bias=True, name="fc")(sent_emb)
        x = glu(x)
        mu, logvar = x[:, : self.c_dim], x[:, self.c_dim :]
        if rng is not None:
            eps = jax.random.normal(rng, mu.shape, mu.dtype)
        else:
            eps = jnp.zeros_like(mu)
        c_code = eps * jnp.exp(logvar * 0.5) + mu
        return c_code, mu, logvar


class InitStageGImgUp(nn.Module):
    """SR entry stage (= INIT_STAGE_GImgup, util.py:726-777).

    im2f embeds the LR image to ngf channels; cross-attend words; concat;
    R_NUM ResBlocks on 2*ngf; x2 upsample to ngf.
    Ignores the sentence code (the reference's forward drops c_code0).
    """

    ngf: int = 32
    r_num: int = 2
    use_bn: bool = True
    fused_upsample: bool = False

    @nn.compact
    def __call__(self, lr_img, words, mask, train: bool = False):
        x = nn.Conv(self.ngf * 2, (3, 3), use_bias=False, padding="SAME",
                    name="im2f_conv")(lr_img)
        if self.use_bn:
            x = batch_norm(train, name="im2f_bn")(x)
        h_code = glu(x)  # [B, h, w, ngf]
        c_code, attn = WordPixelAttention(self.ngf, name="att")(h_code, words, mask)
        h = jnp.concatenate([h_code, c_code], axis=-1)  # 2*ngf
        for i in range(self.r_num):
            h = ResBlock(self.ngf * 2, use_bn=self.use_bn, name=f"residual_{i}")(
                h, train
            )
        if self.use_bn:
            up = UpBlock(self.ngf, fused=self.fused_upsample, name="upsample")
            out = up(h, train)
        else:
            out = UpBlockNoBN(self.ngf, name="upsample")(h)
        return out, attn


class NextStageG(nn.Module):
    """Repeated stage (= NEXT_STAGE_G, util.py:781-823)."""

    ngf: int = 32
    r_num: int = 2
    fused_upsample: bool = False

    @nn.compact
    def __call__(self, h_code, words, mask, train: bool = False):
        c_code, attn = WordPixelAttention(self.ngf, name="att")(h_code, words, mask)
        h = jnp.concatenate([h_code, c_code], axis=-1)
        for i in range(self.r_num):
            h = ResBlock(self.ngf * 2, name=f"residual_{i}")(h, train)
        out = UpBlock(self.ngf, fused=self.fused_upsample,
                      name="upsample")(h, train)
        return out, attn


class GetImageG(nn.Module):
    """conv3x3(ngf -> 3) head (= GET_IMAGE_G / _noAct / _Bic,
    util.py:894-933)."""

    use_tanh: bool = False  # eval path uses GET_IMAGE_G_noAct (model.py:44-46)

    @nn.compact
    def __call__(self, h_code, bic: Optional[jax.Array] = None):
        x = nn.Conv(3, (3, 3), use_bias=False, padding="SAME", name="conv")(h_code)
        if self.use_tanh:
            x = jnp.tanh(x)
        if bic is not None:
            x = x + bic
        return x


class GSRNetLow(nn.Module):
    """Low-frequency generator (= G_SR_NET_low, model.py:34-78), generalized
    to n_stages (3 for x8 / BRANCH_NUM=4).

    forward(LR, sent_emb, words, mask) ->
        (fake_imgs pyramid, att_maps, mu, logvar)
    """

    ngf: int = 32
    c_dim: int = 100
    n_stages: int = 3
    r_num: int = 2
    use_tanh_heads: bool = False
    fused_upsample: bool = False
    remat: bool = False  # rematerialize each stage in the backward pass

    @nn.compact
    def __call__(
        self,
        lr_img: jax.Array,  # [B, h, w, 3] in [-1, 1]
        sent_emb: jax.Array,  # [B, 256]
        words: jax.Array,  # [B, T, 256]
        mask: Optional[jax.Array],  # [B, T] True = pad
        rng: Optional[jax.Array] = None,
        train: bool = False,
        outmiddle: bool = False,
    ):
        # remat trades FLOPs for HBM: only stage BOUNDARY features are kept
        # live for the backward; the intra-stage attention materialization
        # and the 2x-channel GLU pre-activations (the largest buffers at the
        # 128/256px stages) are recomputed. Unlocks batch >= 256 on one v5e
        # (docs/PERF.md "Training batch scaling").
        InitCls, NextCls = InitStageGImgUp, NextStageG
        if self.remat:
            InitCls = nn.remat(InitCls, static_argnums=(4,))
            NextCls = nn.remat(NextCls, static_argnums=(4,))
        fake_imgs: List[jax.Array] = []
        att_maps: List[jax.Array] = []
        feats: List[jax.Array] = []
        _, mu, logvar = CANet(self.c_dim, name="ca_net")(sent_emb, rng)
        h, att = InitCls(self.ngf, self.r_num,
                         fused_upsample=self.fused_upsample,
                         name="h_net1")(lr_img, words, mask, train)
        feats.append(h)
        fake_imgs.append(GetImageG(self.use_tanh_heads, name="img_net1")(h))
        att_maps.append(att)
        for s in range(2, self.n_stages + 1):
            h, att = NextCls(self.ngf, self.r_num,
                             fused_upsample=self.fused_upsample,
                             name=f"h_net{s}")(h, words, mask, train)
            feats.append(h)
            fake_imgs.append(
                GetImageG(self.use_tanh_heads, name=f"img_net{s}")(h)
            )
            att_maps.append(att)
        if outmiddle:
            return fake_imgs, att_maps, mu, logvar, feats
        return fake_imgs, att_maps, mu, logvar


class GSRNetLowStage1(nn.Module):
    """Ablation variant (= G_SR_NET_low_stage1, model.py:81-130): attention
    only at stage 1; later stages are plain no-BN ResBlocks after a shared
    conv+up block; attention maps are nearest-upsampled."""

    ngf: int = 32
    c_dim: int = 100
    r_num: int = 2

    @nn.compact
    def __call__(self, lr_img, sent_emb, words, mask, rng=None, train=False):
        ngf = self.ngf
        _, mu, logvar = CANet(self.c_dim, name="ca_net")(sent_emb, rng)
        h1, attn0 = InitStageGImgUp(ngf, self.r_num, use_bn=False, name="h_net1")(
            lr_img, words, mask, train
        )
        fake1 = GetImageG(True, name="img_net1")(h1)

        # up1 = conv3x3(ngf->2ngf) -> LeakyReLU -> upBlocknoBN(2ngf->ngf)
        # NOTE reference reuses self.up1 for both steps (model.py:116,123);
        # instantiating once and calling twice shares params in linen too.
        up1_conv = nn.Conv(ngf * 2, (3, 3), use_bias=False, padding="SAME",
                           name="up1_conv")
        up1_up = UpBlockNoBN(ngf, name="up1_up")

        def up1(x):
            return up1_up(leaky_relu(up1_conv(x)))

        h1u = up1(h1)
        h2 = ResBlock(ngf, use_bn=False, name="h_net2")(h1u, train)
        fake2 = GetImageG(True, name="img_net2")(h2)
        attn1 = upsample_nearest2x(
            attn0.transpose(0, 2, 3, 1)
        ).transpose(0, 3, 1, 2)

        h2u = up1(h2)
        h3 = ResBlock(ngf, use_bn=False, name="h_net3")(h2u, train)
        fake3 = GetImageG(True, name="img_net3")(h3)
        attn2 = upsample_nearest2x(
            attn1.transpose(0, 2, 3, 1)
        ).transpose(0, 3, 1, 2)

        return [fake1, fake2, fake3], [attn0, attn1, attn2], mu, logvar
