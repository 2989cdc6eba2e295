"""Bidirectional LSTM/GRU text encoder (= RNN_ENCODER, util.py:175-260).

The reference relies on torch packed sequences (sorted-by-length batches,
pack_padded_sequence) to handle variable caption lengths. Packed sequences
are a data-dependent-shape construct that XLA cannot trace; the TPU-native
equivalent is a masked `lax.scan` over a static [B, T] layout:

  * forward pass: carry stops updating at t >= len (so the final carry equals
    the state at the last valid token -- identical to the packed final hidden)
  * backward pass: scanned in reverse; steps with t >= len are no-ops, so the
    carry after t = 0 equals the packed reverse-direction final hidden
  * per-step outputs are zeroed outside the valid range, matching
    pad_packed_sequence's zero padding (util.py:250)

No sorting requirement: the mask does the work, which also removes the
sort/unsort permutation the reference forces onto the whole data pipeline
(datasets.py:33-68).

Output layout is channels-last: words [B, T, D], sentence [B, D] where the
feature dim is [forward_half, backward_half] -- the same ordering torch uses
for bidirectional outputs, so converted weights reproduce exact values.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _lstm_step(x, h, c, w_ih, w_hh, b):
    """One torch-convention LSTM cell step. Gate order i, f, g, o."""
    gates = x @ w_ih + h @ w_hh + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _gru_step(x, h, w_ih, w_hh, b_ih, b_hh):
    """One torch-convention GRU cell step. Gate order r, z, n."""
    gi = x @ w_ih + b_ih
    gh = h @ w_hh + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _masked_lstm(xs, lens, w_ih, w_hh, b, hidden, reverse):
    """Masked scan over time. xs [B, T, I], lens [B]. Returns
    (outputs [B, T, H] zero-padded, final_h [B, H])."""
    B, T, _ = xs.shape
    h0 = jnp.zeros((B, hidden), xs.dtype)
    c0 = jnp.zeros((B, hidden), xs.dtype)
    ts = jnp.arange(T)
    if reverse:
        ts = ts[::-1]

    def step(carry, t):
        h, c = carry
        x_t = jax.lax.dynamic_index_in_dim(xs, t, axis=1, keepdims=False)
        h_new, c_new = _lstm_step(x_t, h, c, w_ih, w_hh, b)
        valid = (t < lens)[:, None]
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        out = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        return (h, c), out

    (h_f, _), outs = jax.lax.scan(step, (h0, c0), ts)
    outs = jnp.swapaxes(outs, 0, 1)  # [B, T, H] in scan order
    if reverse:
        outs = outs[:, ::-1]
    return outs, h_f


def _masked_gru(xs, lens, w_ih, w_hh, b_ih, b_hh, hidden, reverse):
    B, T, _ = xs.shape
    h0 = jnp.zeros((B, hidden), xs.dtype)
    ts = jnp.arange(T)
    if reverse:
        ts = ts[::-1]

    def step(h, t):
        x_t = jax.lax.dynamic_index_in_dim(xs, t, axis=1, keepdims=False)
        h_new = _gru_step(x_t, h, w_ih, w_hh, b_ih, b_hh)
        valid = (t < lens)[:, None]
        h = jnp.where(valid, h_new, h)
        out = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        return h, out

    h_f, outs = jax.lax.scan(step, h0, ts)
    outs = jnp.swapaxes(outs, 0, 1)
    if reverse:
        outs = outs[:, ::-1]
    return outs, h_f


class TextEncoder(nn.Module):
    """= RNN_ENCODER(ntoken, ninput=300, nhidden=EMBEDDING_DIM) with
    bidirectional=True, nlayers=1 (util.py:175-260).

    nhidden here follows the reference constructor quirk: the per-direction
    hidden size is nhidden // num_directions (util.py:191).
    """

    vocab_size: int
    emb_dim: int = 300
    nhidden: int = 256  # total across directions (cfg.TEXT.EMBEDDING_DIM)
    drop_prob: float = 0.5
    rnn_type: str = "LSTM"  # 'LSTM' | 'GRU'
    bidirectional: bool = True

    @property
    def _h(self) -> int:
        return self.nhidden // (2 if self.bidirectional else 1)

    @nn.compact
    def __call__(
        self,
        captions: jax.Array,  # [B, T] int token ids (0 = pad/<end>)
        cap_lens: jax.Array,  # [B] int true lengths
        train: bool = False,
        rngs_dropout: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (words_emb [B, T, D], sent_emb [B, D])."""
        H = self._h
        emb_table = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.1, 0.1),
            (self.vocab_size, self.emb_dim),
        )
        emb = emb_table[captions]  # [B, T, emb_dim]
        if train and self.drop_prob > 0:
            # randomness comes from rngs_dropout when given, else from the
            # apply-level rngs={'dropout': ...} (flax make_rng)
            emb = nn.Dropout(rate=self.drop_prob, deterministic=False)(
                emb, rng=rngs_dropout)

        n_gates = 4 if self.rnn_type == "LSTM" else 3

        def mk(name, shape):
            # torch LSTM init: U(-1/sqrt(H), 1/sqrt(H))
            bound = 1.0 / jnp.sqrt(H)
            return self.param(
                name,
                lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
                shape,
            )

        dirs = ["fwd", "bwd"] if self.bidirectional else ["fwd"]
        outs, finals = [], []
        for d in dirs:
            w_ih = mk(f"w_ih_{d}", (self.emb_dim, n_gates * H))
            w_hh = mk(f"w_hh_{d}", (H, n_gates * H))
            b_ih = mk(f"b_ih_{d}", (n_gates * H,))
            b_hh = mk(f"b_hh_{d}", (n_gates * H,))
            rev = d == "bwd"
            if self.rnn_type == "LSTM":
                o, hf = _masked_lstm(emb, cap_lens, w_ih, w_hh, b_ih + b_hh, H, rev)
            elif self.rnn_type == "GRU":
                o, hf = _masked_gru(emb, cap_lens, w_ih, w_hh, b_ih, b_hh, H, rev)
            else:
                raise NotImplementedError(self.rnn_type)
            outs.append(o)
            finals.append(hf)

        words_emb = jnp.concatenate(outs, axis=-1)  # [B, T, D]
        sent_emb = jnp.concatenate(finals, axis=-1)  # [B, D]
        return words_emb, sent_emb
