"""DAMSM / pixel / KL loss parity vs. reference miscc/losses.py."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tgsr_tpu.losses import (  # noqa: E402
    cycle_mse,
    kl_loss,
    mse_pyramid,
    sent_loss,
    words_loss,
)
from tests.reference_oracle import load_reference  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_losses():
    load_reference()
    import importlib

    m = importlib.import_module("miscc.losses")
    # modern torch rejects ByteTensor masks; the reference's `server=1`
    # branch applies the .bool() cast (losses.py:52-55)
    m.server = 1
    return m


def _data(B=6, E=32, T=7, R=9, seed=0):
    g = torch.Generator().manual_seed(seed)
    img = torch.randn(B, E, 3, 3, generator=g)  # R = 9 regions
    words = torch.randn(B, E, T, generator=g)
    cap_lens = torch.tensor(sorted([T, T - 1, T - 2, 4, 3, 2], reverse=True))
    class_ids = np.array([1, 2, 2, 3, 4, 1])
    labels = torch.arange(B)
    return img, words, cap_lens, class_ids, labels


def test_sent_loss_parity(ref_losses):
    B, E = 6, 32
    g = torch.Generator().manual_seed(1)
    cnn = torch.randn(B, E, generator=g)
    rnn = torch.randn(B, E, generator=g)
    class_ids = np.array([1, 2, 2, 3, 4, 1])
    labels = torch.arange(B)
    l0, l1 = ref_losses.sent_loss(cnn, rnn, labels, class_ids, B)
    j0, j1 = sent_loss(jnp.asarray(cnn.numpy()), jnp.asarray(rnn.numpy()),
                       jnp.asarray(class_ids), gamma3=10.0)
    np.testing.assert_allclose(l0.item(), float(j0), rtol=1e-5)
    np.testing.assert_allclose(l1.item(), float(j1), rtol=1e-5)


def test_sent_loss_no_class_parity(ref_losses):
    B, E = 5, 16
    g = torch.Generator().manual_seed(2)
    cnn = torch.randn(B, E, generator=g)
    rnn = torch.randn(B, E, generator=g)
    labels = torch.arange(B)
    l0, l1 = ref_losses.sent_loss(cnn, rnn, labels, None, B)
    j0, j1 = sent_loss(jnp.asarray(cnn.numpy()), jnp.asarray(rnn.numpy()),
                       None, gamma3=10.0)
    np.testing.assert_allclose(l0.item(), float(j0), rtol=1e-5)
    np.testing.assert_allclose(l1.item(), float(j1), rtol=1e-5)


def test_words_loss_parity(ref_losses):
    img, words, cap_lens, class_ids, labels = _data()
    B, E, T = words.shape
    l0, l1, att = ref_losses.words_loss(img, words, labels, cap_lens,
                                        class_ids, B)
    # reference reads gammas from its global cfg: GAMMA1=5, GAMMA2=5, GAMMA3=10
    j0, j1, att_j = words_loss(
        jnp.asarray(img.numpy().reshape(B, E, -1).transpose(0, 2, 1)),
        jnp.asarray(words.numpy().transpose(0, 2, 1)),
        jnp.asarray(cap_lens.numpy()),
        jnp.asarray(class_ids),
        gamma1=5.0, gamma2=5.0, gamma3=10.0,
    )
    np.testing.assert_allclose(l0.item(), float(j0), rtol=1e-4)
    np.testing.assert_allclose(l1.item(), float(j1), rtol=1e-4)
    # attention maps: reference returns per-sample [1, L_i, ih, iw]
    att_j = np.asarray(att_j)
    for i, a_ref in enumerate(att):
        L = int(cap_lens[i])
        a_ref = a_ref.numpy().reshape(1, L, -1)
        np.testing.assert_allclose(
            a_ref[0], att_j[i, :L], rtol=1e-4, atol=1e-6,
            err_msg=f"attn maps sample {i}",
        )


def test_mse_and_kl_parity(ref_losses):
    g = torch.Generator().manual_seed(3)
    fakes = [torch.randn(2, 3, s, s, generator=g) for s in (8, 16)]
    reals = [torch.randn(2, 3, s, s, generator=g) for s in (8, 16)]
    ref = ref_losses.MSE(fakes, reals).item()
    got = mse_pyramid(
        [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in fakes],
        [jnp.asarray(r.numpy().transpose(0, 2, 3, 1)) for r in reals],
    )
    np.testing.assert_allclose(ref, float(got), rtol=1e-5)

    mu = torch.randn(4, 10, generator=g)
    logvar = torch.randn(4, 10, generator=g)
    ref_kl = ref_losses.KL_loss(mu.clone(), logvar.clone()).item()
    got_kl = kl_loss(jnp.asarray(mu.numpy()), jnp.asarray(logvar.numpy()))
    np.testing.assert_allclose(ref_kl, float(got_kl), rtol=1e-5)


def test_cycle_mse_bicubic_parity(ref_losses):
    """CycleMSE's bicubic downsample must match torch's a=-0.75 kernel
    (jax.image's cubic is a=-0.5 -- 7% loss error before the custom
    resampler)."""
    import torch.nn.functional as F

    from tgsr_tpu.losses import cycle_mse
    from tgsr_tpu.ops.image import resize_bicubic_torch

    g = torch.Generator().manual_seed(4)
    fakes = [torch.randn(2, 3, s, s, generator=g) for s in (16, 32)]
    lr = torch.randn(2, 3, 8, 8, generator=g)
    ref = ref_losses.CycleMSE(fakes, lr).item()
    got = float(cycle_mse(
        [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in fakes],
        jnp.asarray(lr.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ref, got, rtol=1e-5)

    x = torch.randn(1, 3, 16, 16, generator=g)
    r = F.interpolate(x, size=[32, 32], mode="bicubic").numpy()
    j = np.asarray(resize_bicubic_torch(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), (32, 32)))
    np.testing.assert_allclose(r, j.transpose(0, 3, 1, 2), rtol=1e-4,
                               atol=1e-5)


def test_sent_similarity_parity(ref_losses):
    B, E = 6, 32
    g = torch.Generator().manual_seed(5)
    cnn = torch.randn(B, E, generator=g)
    rnn = torch.randn(B, E, generator=g)
    ref = ref_losses.sent_similarity(cnn, rnn).numpy()
    from tgsr_tpu.losses.damsm import sent_similarity

    got = np.asarray(sent_similarity(jnp.asarray(cnn.numpy()),
                                     jnp.asarray(rnn.numpy()), gamma3=10.0))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_words_similarity_parity(ref_losses):
    img, words, cap_lens, class_ids, labels = _data(seed=6)
    B, E, T = words.shape
    ref = ref_losses.words_similarity(img, words, cap_lens, B).numpy()
    from tgsr_tpu.losses.damsm import words_similarity

    got = np.asarray(words_similarity(
        jnp.asarray(img.numpy().reshape(B, E, -1).transpose(0, 2, 1)),
        jnp.asarray(words.numpy().transpose(0, 2, 1)),
        jnp.asarray(cap_lens.numpy()), gamma1=5.0, gamma2=5.0))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_weight_mse_parity(ref_losses):
    """weight_MSE (losses.py:792-804): attention-max weighting, nearest
    upsample, all-dims mean, and the last-scale weight map return."""
    from tgsr_tpu.losses.pixel import weight_mse

    g = torch.Generator().manual_seed(7)
    T = 5
    fakes = [torch.randn(2, 3, s, s, generator=g) for s in (8, 16)]
    reals = [torch.randn(2, 3, s, s, generator=g) for s in (8, 16)]
    attns = [torch.rand(2, T, s // 2, s // 2, generator=g) for s in (8, 16)]
    attns = [a / a.sum(dim=1, keepdim=True) for a in attns]
    ref, ref_w = ref_losses.weight_MSE(fakes, reals, attns)
    got, got_w = weight_mse(
        [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in fakes],
        [jnp.asarray(r.numpy().transpose(0, 2, 3, 1)) for r in reals],
        [jnp.asarray(a.numpy()) for a in attns])
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_w).transpose(0, 3, 1, 2), ref_w.numpy(),
        rtol=1e-5, atol=1e-7)
