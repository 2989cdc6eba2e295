"""Multi-scale conditional discriminators.

ABSENT from the reference snapshot: the loss layer calls
`netD(imgs)`, `netD.COND_DNET(features, sent_emb)`, `netD.UNCOND_DNET(features)`
(miscc/losses.py:290-316, 351-391) and configs set TRAIN.B_NET_D / GAN.DF_DIM,
but no D_NET class exists anywhere. This module implements the AttnGAN
convention the interface pins down: per-scale 64/128/256 downsampling CNNs to
a [4, 4, 8*ndf] feature cube, a conditional logit head that joins the
sentence embedding, and an unconditional head.

Outputs are raw LOGITS; the BCEWithLogits loss family
(losses.py:290-316) consumes them directly and the BCE ("or") family applies
sigmoid inside the loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgsr_tpu.ops.blocks import batch_norm, leaky_relu


class _Down(nn.Module):
    """conv4x4 stride2 [-> BN] -> LeakyReLU(0.2)."""

    features: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (4, 4), strides=(2, 2), use_bias=False,
                    padding=((1, 1), (1, 1)), name="conv")(x)
        if self.use_bn:
            x = batch_norm(train, name="bn")(x)
        return leaky_relu(x)


class _Block3x3LeakyRelu(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), use_bias=False, padding="SAME",
                    name="conv")(x)
        x = batch_norm(train, name="bn")(x)
        return leaky_relu(x)


class DNet(nn.Module):
    """Discriminator for one pyramid scale.

    `img_size` in {64, 128, 256}: the encoder downsamples by 16x then by an
    extra 2x per doubling above 64, always ending at a 4x4 x (8*ndf) cube.

    Usage (mirrors the reference call sites):
        features = dnet.apply(vars, img, method=DNet.features)
        cond     = dnet.apply(vars, features, sent, method=DNet.cond_logit)
        uncond   = dnet.apply(vars, features, method=DNet.uncond_logit)
    """

    ndf: int = 64
    nef: int = 256  # sentence embedding dim
    img_size: int = 64
    b_condition: bool = True

    def setup(self):
        ndf = self.ndf
        # Downsample to a 4x4 cube: ndf -> 2ndf -> 4ndf -> 8ndf for the
        # canonical 64px scale (AttnGAN encode_image_by_16times), with the
        # channel ramp truncated for smaller test scales and extra
        # down+3x3 pairs appended for larger ones.
        downs = [_Down(ndf, use_bn=False)]
        size = self.img_size // 2
        mult = 1
        while size > 4 and mult < 8:
            mult *= 2
            downs.append(_Down(ndf * mult))
            size //= 2
        extra = []
        while size > 4:
            extra.append(_Down(ndf * mult * 2))
            extra.append(_Block3x3LeakyRelu(ndf * mult))
            size //= 2
        self.downs = downs
        self.extra = extra
        # conditional head: conv3x3(8ndf+nef -> 8ndf) + BN + LReLU, then
        # 4x4 logit. b_condition=False (the reference's bcondition
        # semantics / TRAIN.B_NET_D configs) builds no conditional head at
        # all — the param tree then matches an unconditional-only D.
        if self.b_condition:
            self.joint = _Block3x3LeakyRelu(ndf * 8)
            self.cond_out = nn.Conv(1, (4, 4), strides=(4, 4),
                                    use_bias=True, padding="VALID",
                                    name="cond_out")
        self.uncond_out = nn.Conv(1, (4, 4), strides=(4, 4), use_bias=True,
                                  padding="VALID", name="uncond_out")

    def features(self, img: jax.Array, train: bool = False) -> jax.Array:
        """img [B, S, S, 3] -> [B, 4, 4, 8*ndf]."""
        x = img
        for d in self.downs:
            x = d(x, train)
        for d in self.extra:
            x = d(x, train)
        return x

    def cond_logit(self, h: jax.Array, sent: jax.Array,
                   train: bool = False) -> jax.Array:
        """COND_DNET(features, sent_emb) -> [B] logits."""
        if not self.b_condition:
            raise ValueError("DNet(b_condition=False) has no conditional "
                             "head (reference bcondition semantics)")
        b = h.shape[0]
        c = jnp.broadcast_to(sent[:, None, None, :], (b, 4, 4, sent.shape[-1]))
        x = jnp.concatenate([h, c], axis=-1)
        x = self.joint(x, train)
        x = self.cond_out(x)
        return x.reshape(b)

    def uncond_logit(self, h: jax.Array, train: bool = False) -> jax.Array:
        """UNCOND_DNET(features) -> [B] logits."""
        b = h.shape[0]
        return self.uncond_out(h).reshape(b)

    def __call__(self, img, sent, train: bool = False):
        """Convenience: returns (cond_logit, uncond_logit); cond is None
        for an unconditional-only D (b_condition=False)."""
        h = self.features(img, train)
        cond = (self.cond_logit(h, sent, train) if self.b_condition
                else None)
        return cond, self.uncond_logit(h, train)


class ESRGANDNet(nn.Module):
    """Plain unconditional SR discriminator for the ESRGAN/relativistic loss
    family (losses.py:813-883): netD(img) -> logits directly."""

    ndf: int = 64

    @nn.compact
    def __call__(self, img, train: bool = False):
        x = img
        feats = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8]
        for i, f in enumerate(feats):
            x = _Down(f, use_bn=(i > 0), name=f"down_{i}")(x, train)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(100, name="fc1")(x)
        x = leaky_relu(x)
        return nn.Dense(1, name="fc2")(x).reshape(-1)
