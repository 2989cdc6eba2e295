"""Bi-LSTM/GRU text encoder parity vs. torch packed-sequence RNN_ENCODER
semantics (util.py:233-260), including variable lengths."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from tgsr_tpu.checkpoints.convert_torch import convert_text_encoder  # noqa: E402
from tgsr_tpu.models.text_encoder import TextEncoder  # noqa: E402


def _torch_oracle(rnn_type, captions, cap_lens, ntoken, emb_dim, H):
    torch.manual_seed(0)
    encoder = tnn.Embedding(ntoken, emb_dim)
    encoder.weight.data.uniform_(-0.1, 0.1)
    if rnn_type == "LSTM":
        rnn = tnn.LSTM(emb_dim, H, 1, batch_first=True, bidirectional=True)
    else:
        rnn = tnn.GRU(emb_dim, H, 1, batch_first=True, bidirectional=True)
    rnn.eval()

    emb = encoder(captions)
    packed = pack_padded_sequence(emb, cap_lens.tolist(), batch_first=True)
    if rnn_type == "LSTM":
        h0 = (torch.zeros(2, captions.shape[0], H), torch.zeros(2, captions.shape[0], H))
    else:
        h0 = torch.zeros(2, captions.shape[0], H)
    with torch.no_grad():
        output, hidden = rnn(packed, h0)
    output = pad_packed_sequence(output, batch_first=True, total_length=captions.shape[1])[0]
    words_emb = output  # [B, T, 2H]
    hn = hidden[0] if rnn_type == "LSTM" else hidden
    sent_emb = hn.transpose(0, 1).contiguous().view(-1, 2 * H)

    sd = {"encoder.weight": encoder.weight}
    for name, p in rnn.named_parameters():
        sd[f"rnn.{name}"] = p
    return words_emb.numpy(), sent_emb.numpy(), sd


@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU"])
def test_bidirectional_parity_variable_lengths(rnn_type):
    ntoken, emb_dim, H, T = 41, 300, 128, 18
    # sorted desc as the reference requires; ours doesn't need sorting but
    # match the oracle's input
    cap_lens = torch.tensor([18, 11, 5, 1])
    B = len(cap_lens)
    g = torch.Generator().manual_seed(3)
    captions = torch.randint(1, ntoken, (B, T), generator=g)
    for i, L in enumerate(cap_lens):
        captions[i, L:] = 0

    words_ref, sent_ref, sd = _torch_oracle(
        rnn_type, captions, cap_lens, ntoken, emb_dim, H
    )

    enc = TextEncoder(vocab_size=ntoken, emb_dim=emb_dim, nhidden=2 * H,
                      rnn_type=rnn_type)
    variables = convert_text_encoder(sd, rnn_type)
    words, sent = enc.apply(
        variables, jnp.asarray(captions.numpy()), jnp.asarray(cap_lens.numpy())
    )

    np.testing.assert_allclose(words_ref, np.asarray(words), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(sent_ref, np.asarray(sent), rtol=1e-5, atol=1e-5)


def test_unsorted_batch_matches_sorted():
    """The masked-scan encoder must not require length-sorted batches."""
    ntoken, emb_dim, H, T = 41, 300, 128, 18
    cap_lens = torch.tensor([5, 18, 1, 11])  # unsorted
    B = len(cap_lens)
    g = torch.Generator().manual_seed(4)
    captions = torch.randint(1, ntoken, (B, T), generator=g)
    for i, L in enumerate(cap_lens):
        captions[i, L:] = 0

    order = torch.argsort(cap_lens, descending=True)
    words_ref, sent_ref, sd = _torch_oracle(
        "LSTM", captions[order], cap_lens[order], ntoken, emb_dim, H
    )
    inv = torch.argsort(order)
    words_ref = words_ref[inv.numpy()]
    sent_ref = sent_ref[inv.numpy()]

    enc = TextEncoder(vocab_size=ntoken, emb_dim=emb_dim, nhidden=2 * H)
    variables = convert_text_encoder(sd)
    words, sent = enc.apply(
        variables, jnp.asarray(captions.numpy()), jnp.asarray(cap_lens.numpy())
    )
    np.testing.assert_allclose(words_ref, np.asarray(words), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(sent_ref, np.asarray(sent), rtol=1e-5, atol=1e-5)
