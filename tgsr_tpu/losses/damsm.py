"""DAMSM contrastive losses, fully batched.

= miscc/losses.py:12-136 (cosine_similarity, sent_loss, words_loss) and
:234-287 (similarity-only variants).

The reference computes words_loss with a Python loop over the batch, each
iteration doing B x T x 289 bmms (losses.py:73-113) -- O(B) kernel launches.
Here the loop is a single vmap: one [B, B, T, R] einsum chain that XLA maps
onto the MXU in one shot. Class-mask and label semantics are identical;
variable caption lengths are handled by masking instead of per-sample
slicing (padded word rows are excluded from both the Eq. 8 softmax and the
Eq. 10 log-sum-exp).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tgsr_tpu.ops.attention import NEG_INF, func_attention


def cosine_similarity(x1: jax.Array, x2: jax.Array, axis: int = -1,
                      eps: float = 1e-8) -> jax.Array:
    """= losses.py:12-18."""
    w12 = jnp.sum(x1 * x2, axis=axis)
    w1 = jnp.linalg.norm(x1, axis=axis)
    w2 = jnp.linalg.norm(x2, axis=axis)
    return w12 / jnp.clip(w1 * w2, min=eps)


def _class_mask(class_ids: Optional[jax.Array], batch: int) -> Optional[jax.Array]:
    """mask[i, j] = True where class_ids[j] == class_ids[i] and j != i
    (same-class negatives are excluded; losses.py:24-34)."""
    if class_ids is None:
        return None
    eq = class_ids[:, None] == class_ids[None, :]
    return eq & ~jnp.eye(batch, dtype=bool)


def _symmetric_ce(scores: jax.Array, mask: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """CrossEntropy over rows of scores and of scores.T with diagonal labels."""
    if mask is not None:
        scores = jnp.where(mask, NEG_INF, scores)
    labels = jnp.arange(scores.shape[0])
    logp0 = jax.nn.log_softmax(scores, axis=-1)
    logp1 = jax.nn.log_softmax(scores.T, axis=-1)
    loss0 = -jnp.mean(logp0[labels, labels])
    loss1 = -jnp.mean(logp1[labels, labels])
    return loss0, loss1


def sent_loss(
    cnn_code: jax.Array,  # [B, E] global image features
    rnn_code: jax.Array,  # [B, E] sentence embeddings
    class_ids: Optional[jax.Array],  # [B] int
    gamma3: float = 10.0,
    eps: float = 1e-8,
) -> Tuple[jax.Array, jax.Array]:
    """= losses.py:21-62. gamma3-scaled cosine score matrix, same-class
    negatives masked to -inf, symmetric CE with diagonal labels."""
    b = cnn_code.shape[0]
    norm_c = jnp.linalg.norm(cnn_code, axis=-1, keepdims=True)
    norm_r = jnp.linalg.norm(rnn_code, axis=-1, keepdims=True)
    scores = (cnn_code @ rnn_code.T) / jnp.clip(norm_c @ norm_r.T, min=eps)
    scores = scores * gamma3
    return _symmetric_ce(scores, _class_mask(class_ids, b))


def sent_similarity(cnn_code, rnn_code, gamma3: float = 10.0, eps: float = 1e-8):
    """= losses.py:234-250 (no-label scoring)."""
    norm_c = jnp.linalg.norm(cnn_code, axis=-1, keepdims=True)
    norm_r = jnp.linalg.norm(rnn_code, axis=-1, keepdims=True)
    return (cnn_code @ rnn_code.T) / jnp.clip(norm_c @ norm_r.T, min=eps) * gamma3


def _words_similarity_matrix(
    img_features: jax.Array,  # [B, R, E] region features
    words_emb: jax.Array,  # [B, T, E]
    cap_lens: jax.Array,  # [B]
    gamma1: float,
    gamma2: float,
    word_scale: Optional[jax.Array] = None,  # [B, T] per-word confidence
) -> Tuple[jax.Array, jax.Array]:
    """similarities[img j, caption i] (= the inner loop of losses.py:73-116)
    and the diagonal attention maps [B, T, R]."""
    B, T, E = words_emb.shape
    word_mask = jnp.arange(T)[None, :] >= cap_lens[:, None]  # [B, T] True=pad
    if word_scale is not None:
        words_emb = words_emb * word_scale[:, :, None]

    def one_caption(words_i, mask_i, i):
        # broadcast caption i's words against ALL images' regions
        w = jnp.broadcast_to(words_i[None], (B, T, E))
        m = jnp.broadcast_to(mask_i[None], (B, T))
        ctx, attn = func_attention(w, img_features, gamma1, word_mask=m)
        sim = cosine_similarity(w, ctx)  # [B, T]
        # Eq. (10): log sum_t exp(gamma2 * sim_t) over VALID words only
        sim = jnp.where(mask_i[None, :], NEG_INF, sim * gamma2)
        col = jax.nn.logsumexp(sim, axis=-1)  # [B]
        # only caption i's attention over IMAGE i survives (losses.py:93);
        # returning the full [B,T,R] per caption would materialize a
        # [B,B,T,R] tensor (~546 MB HBM at B=128) just to take a diagonal
        return col, attn[i]

    cols, diag_attn = jax.vmap(one_caption)(words_emb, word_mask,
                                            jnp.arange(B))
    similarities = cols.T  # [img B, caption B]
    return similarities, diag_attn


def words_loss(
    img_features: jax.Array,  # [B, R, E]
    words_emb: jax.Array,  # [B, T, E]
    cap_lens: jax.Array,  # [B]
    class_ids: Optional[jax.Array],
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    gamma3: float = 10.0,
    word_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """= losses.py:65-136 (and the reweighted variant via `word_scale`,
    losses.py:137-232). Returns (loss0, loss1, attn_maps [B, T, R])."""
    b = img_features.shape[0]
    sims, attn = _words_similarity_matrix(
        img_features, words_emb, cap_lens, gamma1, gamma2, word_scale
    )
    sims = sims * gamma3
    loss0, loss1 = _symmetric_ce(sims, _class_mask(class_ids, b))
    return loss0, loss1, attn


def words_similarity(img_features, words_emb, cap_lens,
                     gamma1=4.0, gamma2=5.0):
    """= losses.py:251-287."""
    sims, _ = _words_similarity_matrix(
        img_features, words_emb, cap_lens, gamma1, gamma2
    )
    return sims


def word_confidence_scores(attn_maps: jax.Array, cap_lens: jax.Array) -> jax.Array:
    """Per-word confidence from generator attention maps
    (= losses.py:151-163): sum of attention mass above 2*(2/len) threshold.

    attn_maps: [B, T, H, W]; returns [B, T].
    """
    B, T = attn_maps.shape[:2]
    thresh = 2.0 / jnp.maximum(cap_lens.astype(jnp.float32), 1.0)
    m = (attn_maps > (2.0 * thresh)[:, None, None, None]).astype(attn_maps.dtype)
    return jnp.sum(attn_maps * m, axis=(2, 3))
