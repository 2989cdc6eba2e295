"""GAN loss families.

= miscc/losses.py:290-424 (BCEWithLogits family), 428-580 ("or" plain-BCE
family), 750-776 (unconditional), 813-883 (ESRGAN relativistic family).

Discriminators are functional here: the caller passes `d_apply(img) ->
(cond_logit, uncond_logit)` closures (one per pyramid scale), keeping the
loss layer jit-pure. `uncond` heads may be None (= netD.UNCOND_DNET is None
branches in the reference).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tgsr_tpu.losses.damsm import sent_loss, words_loss


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable mean BCEWithLogits (= nn.BCEWithLogitsLoss)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_on_sigmoid(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """= nn.BCELoss()(sigmoid(logits), targets). The "or" loss family feeds
    sigmoid-activated discriminators into plain BCE; with a logits-producing
    D this is the same computation as bce_with_logits -- kept distinct for
    call-site clarity."""
    return bce_with_logits(logits, targets)


def bce_on_probs(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """= nn.BCELoss() applied DIRECTLY to `probs` (not to sigmoid(logits)).

    Needed by the relativistic EGAN family (losses.py:852-883), which feeds
    a DIFFERENCE of two sigmoid outputs into BCELoss. Matches torch's
    clamped-log convention (log terms floored at -100). Inputs outside
    [0, 1] are a domain error in torch (RuntimeError); here they produce
    NaN -- the relativistic D loss is in that regime almost always, see
    relativistic_d_loss."""
    logp = jnp.maximum(jnp.log(probs), -100.0)
    log1mp = jnp.maximum(jnp.log(1.0 - probs), -100.0)
    return -jnp.mean(targets * logp + (1.0 - targets) * log1mp)


# ---------------------------------------------------------------------------
# Primary (BCEWithLogits) family -- losses.py:290-424
# ---------------------------------------------------------------------------

def discriminator_loss(
    d_features: Callable,  # img -> features
    d_cond: Callable,  # (features, sent) -> logits [B]
    d_uncond: Optional[Callable],  # features -> logits [B]
    real_imgs: jax.Array,
    fake_imgs: jax.Array,  # caller must stop_gradient (the .detach())
    conditions: jax.Array,  # sent_emb [B, E]
) -> jax.Array:
    """= discriminator_loss (losses.py:290-316): real/fake/cond-real/
    cond-fake/cond-wrong (rolled batch) with (real+cond_real)/2 +
    (fake+cond_fake+cond_wrong)/3 weighting."""
    b = real_imgs.shape[0]
    ones = jnp.ones((b,), jnp.float32)
    zeros = jnp.zeros((b,), jnp.float32)
    fake_imgs = jax.lax.stop_gradient(fake_imgs)

    real_features = d_features(real_imgs)
    fake_features = d_features(fake_imgs)

    cond_real = bce_with_logits(d_cond(real_features, conditions), ones)
    cond_fake = bce_with_logits(d_cond(fake_features, conditions), zeros)
    # mismatched pairs: image i vs caption i+1 (losses.py:302)
    cond_wrong = bce_with_logits(
        d_cond(
            jax.tree.map(lambda f: f[: b - 1], real_features),
            conditions[1:b],
        ),
        zeros[1:b],
    )

    if d_uncond is not None:
        real_err = bce_with_logits(d_uncond(real_features), ones)
        fake_err = bce_with_logits(d_uncond(fake_features), zeros)
        return (real_err + cond_real) / 2.0 + (
            fake_err + cond_fake + cond_wrong
        ) / 3.0
    return cond_real + (cond_fake + cond_wrong) / 2.0


def generator_loss(
    ds: Sequence[Tuple[Callable, Callable, Optional[Callable]]],
    # list of (d_features, d_cond, d_uncond) per pyramid scale
    image_encoder: Optional[Callable],
    # fake_img -> (region_features [B,R,E], cnn_code [B,E])
    fake_imgs: Sequence[jax.Array],
    sent_emb: jax.Array,
    words_embs: jax.Array,  # [B, T, E]
    cap_lens: jax.Array,
    class_ids: Optional[jax.Array],
    gammas: Tuple[float, float, float] = (4.0, 5.0, 10.0),
    smooth_lambda: float = 1.0,
    w: float = 1.0,
    s: float = 1.0,
    g: float = 1.0,
    word_scale: Optional[jax.Array] = None,  # reweight variant
):
    """= generator_loss (losses.py:351-391) / generator_re_weight_loss
    (:318-350 via word_scale). Per-D cond+uncond BCE plus DAMSM word+sent
    loss on the finest scale. Returns (total, logs dict)."""
    b = sent_emb.shape[0]
    ones = jnp.ones((b,), jnp.float32)
    total = 0.0
    logs = {}
    for i, ((d_feat, d_cond, d_uncond), fake) in enumerate(zip(ds, fake_imgs)):
        features = d_feat(fake)
        cond_err = bce_with_logits(d_cond(features, sent_emb), ones)
        if d_uncond is not None:
            err = bce_with_logits(d_uncond(features), ones)
            g_loss = err + cond_err
        else:
            g_loss = cond_err
        g_loss = g * g_loss
        total = total + g_loss
        logs[f"g_loss{i}"] = g_loss

    if image_encoder is not None:
        region_features, cnn_code = image_encoder(fake_imgs[-1])
        w0, w1, _ = words_loss(
            region_features, words_embs, cap_lens, class_ids,
            gammas[0], gammas[1], gammas[2], word_scale=word_scale,
        )
        w_loss = w * (w0 + w1) * smooth_lambda
        s0, s1 = sent_loss(cnn_code, sent_emb, class_ids, gammas[2])
        s_loss = s * (s0 + s1) * smooth_lambda
        total = total + w_loss + s_loss
        logs["w_loss"] = w_loss
        logs["s_loss"] = s_loss
    return total, logs


def generator_loss_oneim(ds_last, image_encoder, fake_imgs, sent_emb,
                         words_embs, cap_lens, class_ids,
                         gammas=(4.0, 5.0, 10.0), smooth_lambda=1.0):
    """= generator_loss_oneim (losses.py:392-424): finest scale only."""
    return generator_loss(
        [ds_last], image_encoder, [fake_imgs[-1]], sent_emb, words_embs,
        cap_lens, class_ids, gammas, smooth_lambda,
    )


# ---------------------------------------------------------------------------
# "or" family (sigmoid-inside-D + plain BCE) -- losses.py:428-580
# With logits-producing discriminators these reduce to the same math; the
# distinct entry points preserve the reference API surface (per-D g weights
# in the face variant, wordsent-only and no-wordsent ablations).
# ---------------------------------------------------------------------------

def discriminator_loss_sigmoid(*args, **kwargs):
    """= discriminator_lossor (losses.py:428-452)."""
    return discriminator_loss(*args, **kwargs)


def generator_loss_sigmoid(ds, image_encoder, fake_imgs, sent_emb, words_embs,
                           cap_lens, class_ids, gammas=(4.0, 5.0, 10.0),
                           smooth_lambda=1.0, w=1.0, s=1.0, g=1.0):
    """= generator_lossor (losses.py:455-496); w==0 or s==0 skips the DAMSM
    terms (the reference's `(s != 0) and (w != 0)` gate)."""
    enc = image_encoder if (w != 0 and s != 0) else None
    return generator_loss(ds, enc, fake_imgs, sent_emb, words_embs, cap_lens,
                          class_ids, gammas, smooth_lambda, w, s, g)


def generator_loss_wordsent_only(image_encoder, fake_imgs, sent_emb,
                                 words_embs, cap_lens, class_ids,
                                 gammas=(4.0, 5.0, 10.0), smooth_lambda=1.0,
                                 w=1.0, s=1.0):
    """= generator_lossor_wordsentOnly (losses.py:499-522)."""
    region_features, cnn_code = image_encoder(fake_imgs[-1])
    w0, w1, _ = words_loss(region_features, words_embs, cap_lens, class_ids,
                           gammas[0], gammas[1], gammas[2])
    s0, s1 = sent_loss(cnn_code, sent_emb, class_ids, gammas[2])
    total = w * (w0 + w1) * smooth_lambda + s * (s0 + s1) * smooth_lambda
    return total, {"w_loss": w * (w0 + w1), "s_loss": s * (s0 + s1)}


def generator_loss_no_wordsent(ds, fake_imgs, sent_emb, g=1.0):
    """= generator_lossor_nowordsent (losses.py:525-545)."""
    return generator_loss(ds, None, fake_imgs, sent_emb, None, None, None,
                          g=g)


def generator_loss_face(ds, image_encoder, fake_imgs, sent_emb, words_embs,
                        cap_lens, class_ids, gammas=(4.0, 5.0, 10.0),
                        smooth_lambda=1.0, w=1.0, s=1.0, g=None):
    """= generator_lossorface (losses.py:548-580): per-D g weights."""
    if g is None:
        g = [1.0] * len(ds)
    b = sent_emb.shape[0]
    ones = jnp.ones((b,), jnp.float32)
    total = 0.0
    logs = {}
    for i, ((d_feat, d_cond, d_uncond), fake) in enumerate(zip(ds, fake_imgs)):
        features = d_feat(fake)
        cond_err = bce_on_sigmoid(d_cond(features, sent_emb), ones)
        g_loss = cond_err
        if d_uncond is not None:
            g_loss = g_loss + bce_on_sigmoid(d_uncond(features), ones)
        total = total + g[i] * g_loss
        logs[f"g_loss{i}"] = g_loss
    region_features, cnn_code = image_encoder(fake_imgs[-1])
    w0, w1, _ = words_loss(region_features, words_embs, cap_lens, class_ids,
                           gammas[0], gammas[1], gammas[2])
    s0, s1 = sent_loss(cnn_code, sent_emb, class_ids, gammas[2])
    total = total + w * (w0 + w1) * smooth_lambda + s * (s0 + s1) * smooth_lambda
    logs["w_loss"] = w0 + w1
    logs["s_loss"] = s0 + s1
    return total, logs


# ---------------------------------------------------------------------------
# Unconditional family -- losses.py:750-776
# ---------------------------------------------------------------------------

def generator_loss_uncond(ds, fake_imgs):
    """= generator_lossor_Uncond (losses.py:750-762)."""
    total = 0.0
    logs = {}
    for i, ((d_feat, _, d_uncond), fake) in enumerate(zip(ds, fake_imgs)):
        b = fake.shape[0]
        logits = d_uncond(d_feat(fake))
        g_loss = bce_on_sigmoid(logits, jnp.ones((b,), jnp.float32))
        total = total + g_loss
        logs[f"uncond_g_loss{i}"] = g_loss
    return total, logs


def discriminator_loss_uncond(d_features, d_uncond, real_imgs, fake_imgs):
    """= discriminator_lossor_Uncond (losses.py:765-776)."""
    b = real_imgs.shape[0]
    fake_imgs = jax.lax.stop_gradient(fake_imgs)
    real_logits = d_uncond(d_features(real_imgs))
    fake_logits = d_uncond(d_features(fake_imgs))
    return bce_on_sigmoid(real_logits, jnp.ones((b,))) + bce_on_sigmoid(
        fake_logits, jnp.zeros((b,))
    )


# ---------------------------------------------------------------------------
# ESRGAN relativistic family -- losses.py:813-883
# ---------------------------------------------------------------------------

def esrgan_g_loss(d_apply: Callable, fake_imgs: jax.Array, real_imgs: jax.Array):
    """= ESRGAN_loss (losses.py:814-829). NOTE the reference swaps the
    operands (pred_real = D(fake.detach()), pred_fake = D(real)) -- behavior
    preserved."""
    b = fake_imgs.shape[0]
    pred_real = d_apply(jax.lax.stop_gradient(fake_imgs))
    pred_fake = d_apply(real_imgs)
    return bce_with_logits(pred_fake - pred_real, jnp.ones((b,)))


def esrgan_d_loss(d_apply: Callable, real_imgs: jax.Array, fake_imgs: jax.Array):
    """= ESRGAND_loss (losses.py:832-849): relativistic average GAN."""
    b = real_imgs.shape[0]
    pred_fake = d_apply(jax.lax.stop_gradient(fake_imgs))
    pred_real = d_apply(real_imgs)
    loss_real = bce_with_logits(
        pred_real - jnp.mean(pred_fake, axis=0, keepdims=True), jnp.ones((b,))
    )
    loss_fake = bce_with_logits(
        pred_fake - jnp.mean(pred_real, axis=0, keepdims=True), jnp.zeros((b,))
    )
    return (loss_real + loss_fake) / 2.0


def relativistic_g_loss(d_feat, d_uncond, fake_imgs, real_imgs):
    """= generator_EGAN_loss (losses.py:852-868): BCELoss on the DIFFERENCE
    of the sigmoid-terminated D outputs. Quirks preserved: the FAKE images
    are detached (losses.py:857 -- so no gradient reaches G through them),
    and the loss is domain-valid only where sigmoid(fake) > sigmoid(real)
    elementwise (torch raises otherwise; here: NaN)."""
    b = fake_imgs.shape[0]
    p_fake = jax.nn.sigmoid(d_uncond(d_feat(jax.lax.stop_gradient(fake_imgs))))
    p_real = jax.nn.sigmoid(d_uncond(d_feat(real_imgs)))
    return bce_on_probs(p_fake - p_real, jnp.ones((b,)))


def relativistic_d_loss(d_feat, d_uncond, real_imgs, fake_imgs):
    """= discriminator_EGAND_loss (losses.py:871-883). NOTE: since
    mean(p_real - mean(p_fake)) + mean(p_fake - mean(p_real)) == 0, at least
    one BCE input element is <= 0 whenever the two prediction sets are not
    all equal -- the reference raises (torch BCELoss domain check) in any
    non-degenerate regime; here the same regime yields NaN."""
    b = real_imgs.shape[0]
    p_fake = jax.nn.sigmoid(d_uncond(d_feat(jax.lax.stop_gradient(fake_imgs))))
    p_real = jax.nn.sigmoid(d_uncond(d_feat(real_imgs)))
    loss_real = bce_on_probs(
        p_real - jnp.mean(p_fake, axis=0, keepdims=True), jnp.ones((b,))
    )
    loss_fake = bce_on_probs(
        p_fake - jnp.mean(p_real, axis=0, keepdims=True), jnp.zeros((b,))
    )
    return (loss_real + loss_fake) / 2.0
