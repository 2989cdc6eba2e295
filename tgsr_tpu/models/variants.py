"""Generator stage variant zoo.

= the full set of alternative/experimental modules the reference ships
(util.py:133-171, 404-722, 827-890, 937-1061), including ones unused by the
shipped eval path -- kept for capability parity (ablations and the original
AttnGAN text-to-image entry stage).

All modules are NHWC, linen, and take words as [B, T, E].
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from tgsr_tpu.ops.attention import WordPixelAttention, WordPixelAttentionWeighted
from tgsr_tpu.ops.blocks import (
    Block3x3Relu,
    DownBlock,
    ResBlock,
    UpBlock,
    batch_norm,
    glu,
    leaky_relu,
)


class _FcEntry(nn.Module):
    """Linear(nz -> ngf*4*4*2, no bias) -> BN1d -> GLU -> reshape 4x4
    (shared stem of the INIT_STAGE_G* family, util.py:413-417)."""

    ngf: int

    @nn.compact
    def __call__(self, z, train: bool = False):
        x = nn.Dense(self.ngf * 4 * 4 * 2, use_bias=False, name="fc")(z)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="fc_bn")(x)
        x = glu(x)
        # torch seeds the grid CHANNEL-major: view(-1, ngf, 4, 4)
        # (util.py:433); the NHWC equivalent must reshape in NCHW order
        # THEN transpose — a direct (-1, 4, 4, ngf) reshape scrambles the
        # fc features across space and channels for converted weights
        return x.reshape(-1, self.ngf, 4, 4).transpose(0, 2, 3, 1)


class InitStageG(nn.Module):
    """= INIT_STAGE_G (util.py:404-443): the original AttnGAN entry --
    noise + sentence code -> fc 4x4 -> 4 upBlocks -> 64x64 features."""

    ngf: int  # the reference passes ngf*16 here

    @nn.compact
    def __call__(self, z_code, c_code, train: bool = False):
        x = jnp.concatenate([c_code, z_code], axis=-1)
        out = _FcEntry(self.ngf)(x, train)
        out = UpBlock(self.ngf // 2, name="upsample1")(out, train)
        out = UpBlock(self.ngf // 4, name="upsample2")(out, train)
        out = UpBlock(self.ngf // 8, name="upsample3")(out, train)
        out = UpBlock(self.ngf // 16, name="upsample4")(out, train)
        return out


class InitStageGup4(nn.Module):
    """= INIT_STAGE_Gup4 (util.py:447-475): fc 4x4 -> 2 upBlocks -> 16x16."""

    ngf: int

    @nn.compact
    def __call__(self, z_code, c_code, train: bool = False):
        x = jnp.concatenate([c_code, z_code], axis=-1)
        out = _FcEntry(self.ngf)(x, train)
        out = UpBlock(self.ngf // 2, name="upsample1")(out, train)
        out = UpBlock(self.ngf // 4, name="upsample2")(out, train)
        return out


class InitStageGim(nn.Module):
    """= INIT_STAGE_Gim c32 path (util.py:479-561 define_module0): embeds the
    LR image AND the sentence code (via fc 4x4 + upsamples to the LR size),
    concatenates and fuses. scale=8 assumes a 32px LR."""

    ngf: int = 32
    scale: int = 8

    @nn.compact
    def __call__(self, lr_img, c_code, train: bool = False):
        f = Block3x3Relu(self.ngf, name="fin")(lr_img, train)
        out = _FcEntry(self.ngf)(c_code, train)
        out = UpBlock(self.ngf, name="upsample1")(out, train)
        out = UpBlock(self.ngf, name="upsample2")(out, train)
        if self.scale == 8:
            out = UpBlock(self.ngf, name="upsample3")(out, train)
        x = jnp.concatenate([out, f], axis=-1)
        return Block3x3Relu(self.ngf, name="fout")(x, train)


class InitStageGf(nn.Module):
    """= INIT_STAGE_Gf (util.py:565-613): like Gim but takes precomputed LR
    FEATURES instead of the image."""

    ngf: int = 32
    scale: int = 8

    @nn.compact
    def __call__(self, lr_features, c_code, train: bool = False):
        out = _FcEntry(self.ngf)(c_code, train)
        out = UpBlock(self.ngf // 2, name="upsample1")(out, train)
        out = UpBlock(self.ngf // 4, name="upsample2")(out, train)
        if self.scale == 8:
            out = UpBlock(self.ngf // 8, name="upsample3")(out, train)
        x = jnp.concatenate([out, lr_features], axis=-1)
        return Block3x3Relu(32, name="fout")(x, train)


class InitStageGfc(nn.Module):
    """= INIT_STAGE_Gfc (util.py:617-659): sentence-code-only feature stack
    (scale 8 -> 32x32; scale 1 -> 256x256)."""

    ngf: int = 32
    scale: int = 8

    @nn.compact
    def __call__(self, c_code, train: bool = False):
        out = _FcEntry(self.ngf)(c_code, train)
        out = UpBlock(self.ngf // 2, name="upsample1")(out, train)
        out = UpBlock(self.ngf // 4, name="upsample2")(out, train)
        out = UpBlock(self.ngf // 8, name="upsample3")(out, train)
        if self.scale == 1:
            out = UpBlock(self.ngf // 8, name="upsample4")(out, train)
            out = UpBlock(self.ngf // 8, name="upsample5")(out, train)
            out = UpBlock(self.ngf // 8, name="upsample6")(out, train)
        return out


class InitStageGImg(nn.Module):
    """= INIT_STAGE_GImg (util.py:663-722): image + word attention entry
    WITHOUT upsampling; optional reweighted attention
    (GlobalAttentionGeneral_weight)."""

    ngf: int = 32
    r_num: int = 2
    weightatten: bool = False

    @nn.compact
    def __call__(self, lr_img, words, mask, train: bool = False):
        att_cls = (WordPixelAttentionWeighted if self.weightatten
                   else WordPixelAttention)
        x = nn.Conv(self.ngf * 2, (3, 3), use_bias=False, padding="SAME",
                    name="im2f_conv")(lr_img)
        x = batch_norm(train, name="im2f_bn")(x)
        h_code = glu(x)
        c_code, att = att_cls(self.ngf, name="att")(h_code, words, mask)
        h = jnp.concatenate([h_code, c_code], axis=-1)
        for i in range(self.r_num):
            h = ResBlock(self.ngf * 2, name=f"residual_{i}")(h, train)
        return Block3x3Relu(self.ngf, name="fout")(h, train)


class NextStageGNoAttn(nn.Module):
    """= NEXT_STAGE_G_noAttn (util.py:827-856): conv-GLU instead of
    attention, then residuals + upsample."""

    ngf: int = 32
    r_num: int = 2

    @nn.compact
    def __call__(self, h_code, train: bool = False):
        c = Block3x3Relu(self.ngf, name="noatt")(h_code, train)
        h = c
        for i in range(self.r_num):
            h = ResBlock(self.ngf, name=f"residual_{i}")(h, train)
        return UpBlock(self.ngf, name="upsample")(h, train)


class NextStageGLR(nn.Module):
    """= NEXT_STAGE_G_LR (util.py:860-890): attention stage with NO
    upsample; InstanceNorm in the output fuse."""

    ngf: int = 32
    r_num: int = 2

    @nn.compact
    def __call__(self, h_code, words, mask, train: bool = False):
        c_code, att = WordPixelAttention(self.ngf, name="att")(
            h_code, words, mask)
        h = jnp.concatenate([h_code, c_code], axis=-1)
        for i in range(self.r_num):
            h = ResBlock(self.ngf * 2, name=f"residual_{i}")(h, train)
        h = nn.Conv(self.ngf * 2, (3, 3), use_bias=False, padding="SAME",
                    name="fout_conv")(h)
        # InstanceNorm2d (non-affine in torch by default)
        mean = h.mean(axis=(1, 2), keepdims=True)
        var = h.var(axis=(1, 2), keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        return glu(h), att


class EDCoder(nn.Module):
    """= EDCODER (util.py:133-171): small U-Net encoder-decoder with skip
    concats ending in a Tanh image head (experimental)."""

    ngf: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ngf = self.ngf
        x1 = Block3x3Relu(ngf, name="conv1")(x, train)
        xd1 = DownBlock(ngf * 2, name="d1")(x1, train)
        xd2 = DownBlock(ngf * 4, name="d2")(xd1, train)
        xd3 = DownBlock(ngf * 8, name="d3")(xd2, train)
        xu3 = UpBlock(ngf * 4, name="u1")(xd3, train)
        x22 = jnp.concatenate([xd2, xu3], axis=-1)
        x23 = Block3x3Relu(ngf * 4, name="conv2")(x22, train)
        xu2 = UpBlock(ngf * 2, name="u2")(x23, train)
        x12 = jnp.concatenate([xd1, xu2], axis=-1)
        x13 = Block3x3Relu(ngf * 2, name="conv3")(x12, train)
        xu1 = UpBlock(ngf, name="u3")(x13, train)
        out = nn.Conv(3, (3, 3), use_bias=False, padding="SAME",
                      name="img_conv")(xu1)
        return jnp.tanh(out)


# ---------------------------------------------------------------------------
# Image-Adaptive Word Demand family (util.py:937-1061): experiments that
# re-weight word features using image features before attention.
# ---------------------------------------------------------------------------


class IAWD(nn.Module):
    """= IAWD (util.py:937-960): channel-correlation reweighting of word
    features. words: [B, T, E=256]."""

    out_features: int = 256

    @nn.compact
    def __call__(self, imf, words):
        b, ih, iw, _ = imf.shape
        h1 = nn.Conv(self.out_features, (3, 3), use_bias=False,
                     padding="SAME", name="conv1")(imf)
        h2 = nn.Conv(self.out_features, (3, 3), use_bias=False,
                     padding="SAME", name="conv2")(imf)
        h1 = h1.reshape(b, -1, self.out_features)  # [B, HW, E]
        h2 = h2.reshape(b, -1, self.out_features)
        # [B, E, E] correlation, softmax over dim 1 (reference sm dim=1)
        w = jnp.einsum("bpe,bpf->bef", h1, h2)
        w = jax.nn.softmax(w, axis=1)
        out = jnp.einsum("bef,btf->bte", w, words)
        return out + words


class WordAtten(nn.Module):
    """= Word_atten (util.py:963-987): per-word scalar weights from the
    image-correlated word features."""

    out_features: int = 256

    @nn.compact
    def __call__(self, imf, words):
        b = imf.shape[0]
        h1 = nn.Conv(self.out_features, (3, 3), use_bias=False,
                     padding="SAME", name="conv1")(imf)
        h2 = nn.Conv(self.out_features, (3, 3), use_bias=False,
                     padding="SAME", name="conv2")(imf)
        h1 = h1.reshape(b, -1, self.out_features)
        h2 = h2.reshape(b, -1, self.out_features)
        w = jax.nn.softmax(jnp.einsum("bpe,bpf->bef", h1, h2), axis=1)
        # faithful quirk: the reference's Softmax(dim=1) normalizes the
        # FEATURE axis (util.py:984), so the feature-mean below is
        # identically 1/out_features for every word and the module
        # degenerates to words/out_features — the author's own note says
        # it underperforms; preserved per the faithfulness rule
        iawf = jax.nn.softmax(jnp.einsum("bef,btf->bte", w, words), axis=2)
        wei = jnp.mean(iawf, axis=-1, keepdims=True)  # [B, T, 1] == 1/e
        return wei * words


class IAWDSent(nn.Module):
    """= IAWDsent (util.py:990-1016): pixel-pair correlation, 4x avg-pooled,
    applied to the SENTENCE vector."""

    @nn.compact
    def __call__(self, imf, sent):
        b, ih, iw, _ = imf.shape
        q = ih * iw
        h1 = nn.Conv(1, (3, 3), use_bias=False, padding="SAME",
                     name="conv1")(imf).reshape(b, 1, q)
        h2 = nn.Conv(1, (3, 3), use_bias=False, padding="SAME",
                     name="conv2")(imf).reshape(b, 1, q)
        h4 = jax.nn.softmax(
            jnp.einsum("bxq,bxp->bqp", h2, h1), axis=1)  # [B, q, q]
        # AvgPool2d(k=5, s=4, p=2) over the [q, q] map
        h4 = h4[:, None]  # NCHW-ish -> use NHWC pooling
        h4 = h4.transpose(0, 2, 3, 1)
        s = jax.lax.reduce_window(
            h4, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 4, 4, 1),
            [(0, 0), (2, 2), (2, 2), (0, 0)]) / 25.0
        w = s[..., 0]  # [B, q/4, q/4]
        v = sent[:, :, None]  # [B, E, 1] -- E must equal q/4 (ref contract)
        out = jnp.matmul(w, v) + v
        return out[..., 0]


class IAWDWord(nn.Module):
    """= IAWDword (util.py:1019-1043): same pooled pixel-pair correlation
    applied to the WORD matrix [B, T?, E] (reference multiplies [q/4, q/4]
    by wf, so wf's leading feature dim must equal q/4)."""

    @nn.compact
    def __call__(self, imf, wf):
        b, ih, iw, _ = imf.shape
        q = ih * iw
        h1 = nn.Conv(1, (3, 3), use_bias=False, padding="SAME",
                     name="conv1")(imf).reshape(b, 1, q)
        h2 = nn.Conv(1, (3, 3), use_bias=False, padding="SAME",
                     name="conv2")(imf).reshape(b, 1, q)
        h4 = jax.nn.softmax(
            jnp.einsum("bxq,bxp->bqp", h2, h1), axis=1)
        h4 = h4[:, :, :, None]
        s = jax.lax.reduce_window(
            h4, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 4, 4, 1),
            [(0, 0), (2, 2), (2, 2), (0, 0)]) / 25.0
        w = s[..., 0]
        return jnp.matmul(w, wf) + wf


class IAWDSpatial(nn.Module):
    """= IAWDspatial (util.py:1046-1061): spatial-sum softmax weighting.
    (The reference module references an undefined self.sm -- it would crash
    if called; implemented with the evident intent.)"""

    @nn.compact
    def __call__(self, imf, words):
        b, ih, iw, _ = imf.shape
        hs = jnp.sum(imf, axis=-1).reshape(b, -1)  # [B, HW]
        w = jax.nn.softmax(hs, axis=-1).reshape(b, ih, iw)
        # project spatial weights onto word features via mean pooling
        scale = jnp.mean(w, axis=(1, 2))[:, None, None]
        return words * (1.0 + scale)
