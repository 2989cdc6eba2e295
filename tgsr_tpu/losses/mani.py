"""ManiGAN-style loss family.

= miscc/losses.py:583-748: discriminator_lossMani / generator_lossMani /
DCM_generator_loss / word_level_correlation.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tgsr_tpu.losses.damsm import cosine_similarity, sent_loss, words_loss
from tgsr_tpu.losses.gan import bce_on_sigmoid, discriminator_loss
from tgsr_tpu.ops.attention import NEG_INF, func_attention


def word_level_correlation(
    img_features: jax.Array,  # [B, R, E]
    words_emb: jax.Array,  # [B, T, E]
    cap_lens: jax.Array,  # [B]
    labels: jax.Array,  # [B] targets in {0, 1}
    gamma1: float = 4.0,
    gamma2: float = 5.0,
) -> jax.Array:
    """= word_level_correlation (losses.py:706-748): per-sample self-attended
    word-region similarity squashed by sigmoid, BCE against labels.

    NOTE the reference builds `similar_list` with requires_grad=False
    (losses.py:745), so this term contributes a VALUE but no gradient --
    reproduced with stop_gradient.
    """
    B, T, E = words_emb.shape
    word_mask = jnp.arange(T)[None, :] >= cap_lens[:, None]

    def one(words_i, regions_i, mask_i):
        w = words_i[None]  # [1, T, E]
        ctx, _ = func_attention(w, regions_i[None], gamma1,
                                word_mask=mask_i[None])
        # self attention over words: avg word vector vs each word
        denom = jnp.maximum(jnp.sum(~mask_i), 1)
        aver = jnp.sum(jnp.where(mask_i[:, None], 0, words_i),
                       axis=0) / denom  # [E]
        res = aver @ words_i.T  # [T]
        res = jnp.where(mask_i, NEG_INF, res)
        res = jax.nn.softmax(res)
        self_ctx = ctx[0] * res[:, None]  # [T, E]
        sim = cosine_similarity(words_i, self_ctx)  # [T]
        sim = jnp.where(mask_i, NEG_INF, sim * gamma2)
        row = jax.nn.logsumexp(sim)
        return jax.nn.sigmoid(row)

    sims = jax.vmap(one)(words_emb, img_features, word_mask)
    sims = jax.lax.stop_gradient(sims)
    sims = jnp.clip(sims, 1e-7, 1 - 1e-7)
    return -jnp.mean(labels * jnp.log(sims) + (1 - labels) * jnp.log1p(-sims))


def discriminator_loss_mani(
    d_features, d_cond, d_uncond,
    real_imgs, fake_imgs, conditions,
    image_encoder: Callable, words_embs, cap_lens,
    gamma1: float = 4.0, gamma2: float = 5.0,
) -> jax.Array:
    """= discriminator_lossMani (losses.py:583-618): the standard cond D
    loss plus real-image word-level correlation."""
    err = discriminator_loss(d_features, d_cond, d_uncond, real_imgs,
                             fake_imgs, conditions)
    region_features, _ = image_encoder(real_imgs)
    b = real_imgs.shape[0]
    err = err + word_level_correlation(
        region_features, words_embs, cap_lens, jnp.ones((b,)), gamma1, gamma2)
    return err


def generator_loss_mani(
    ds: Sequence[Tuple[Callable, Callable, Optional[Callable]]],
    image_encoder: Callable,
    vgg_apply: Callable,  # img -> list of feature maps
    fake_imgs: Sequence[jax.Array],
    real_imgs: Sequence[jax.Array],
    sent_emb, words_embs, cap_lens, class_ids,
    gammas=(4.0, 5.0, 10.0), smooth_lambda: float = 1.0,
):
    """= generator_lossMani (losses.py:619-667): per-D adversarial + DAMSM
    on finest + VGG perceptual MSE over all scales / 3."""
    b = sent_emb.shape[0]
    ones = jnp.ones((b,), jnp.float32)
    total = 0.0
    feature_loss = 0.0
    logs = {}
    for i, ((d_feat, d_cond, d_uncond), fake, real) in enumerate(
            zip(ds, fake_imgs, real_imgs)):
        features = d_feat(fake)
        g_loss = bce_on_sigmoid(d_cond(features, sent_emb), ones)
        if d_uncond is not None:
            g_loss = g_loss + bce_on_sigmoid(d_uncond(features), ones)
        total = total + g_loss
        logs[f"g_loss{i}"] = g_loss
        rf = vgg_apply(real)
        ff = vgg_apply(fake)
        for r, f in zip(rf, ff):
            feature_loss = feature_loss + jnp.mean((r - f) ** 2)
    region_features, cnn_code = image_encoder(fake_imgs[-1])
    w0, w1, _ = words_loss(region_features, words_embs, cap_lens, class_ids,
                           gammas[0], gammas[1], gammas[2])
    s0, s1 = sent_loss(cnn_code, sent_emb, class_ids, gammas[2])
    total = total + (w0 + w1) * smooth_lambda + (s0 + s1) * smooth_lambda
    total = total + feature_loss / 3.0
    logs["w_loss"] = w0 + w1
    logs["s_loss"] = s0 + s1
    logs["vgg_feature_loss"] = feature_loss / 3.0
    return total, logs


def dcm_generator_loss(
    d_feat, d_cond, d_uncond, image_encoder, fake_img,
    sent_emb, words_embs, cap_lens, class_ids,
    gammas=(4.0, 5.0, 10.0), smooth_lambda: float = 1.0,
):
    """= DCM_generator_loss (losses.py:668-704): single-image variant."""
    b = sent_emb.shape[0]
    ones = jnp.ones((b,), jnp.float32)
    features = d_feat(fake_img)
    g_loss = bce_on_sigmoid(d_cond(features, sent_emb), ones)
    if d_uncond is not None:
        g_loss = g_loss + bce_on_sigmoid(d_uncond(features), ones)
    region_features, cnn_code = image_encoder(fake_img)
    w0, w1, _ = words_loss(region_features, words_embs, cap_lens, class_ids,
                           gammas[0], gammas[1], gammas[2])
    s0, s1 = sent_loss(cnn_code, sent_emb, class_ids, gammas[2])
    total = g_loss + (w0 + w1) * smooth_lambda + (s0 + s1) * smooth_lambda
    return total, {"g_loss": g_loss, "w_loss": w0 + w1, "s_loss": s0 + s1}
