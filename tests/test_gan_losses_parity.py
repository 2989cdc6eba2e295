"""GAN loss family parity vs reference miscc/losses.py.

Covers the four families VERDICT.md flagged as untested:
  * the primary BCEWithLogits family (:290-424) -- incl. discriminator_loss's
    rolled cond-wrong pairs and generator_loss's DAMSM terms
  * the "or"/face plain-BCE family (:428-580) -- sigmoid-terminated torch Ds
    vs our logits-producing closures (BCELoss(sigmoid(x)) == BCEWithLogits(x))
  * the unconditional family (:750-776)
  * the ESRGAN relativistic family (:813-883) -- incl. the operand-swap
    quirk (pred_real = D(fake.detach())) and the EGAN BCELoss-on-difference
    domain pathology
  * words_reweight_loss (:137-232) via word_confidence_scores + word_scale

Torch discriminators are deterministic linear stubs mirrored exactly on the
jax side, so any numeric divergence is a loss-math bug.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tgsr_tpu.losses.damsm import word_confidence_scores, words_loss  # noqa: E402
from tgsr_tpu.losses.gan import (  # noqa: E402
    discriminator_loss,
    discriminator_loss_uncond,
    esrgan_d_loss,
    esrgan_g_loss,
    generator_loss,
    generator_loss_face,
    generator_loss_no_wordsent,
    generator_loss_sigmoid,
    generator_loss_uncond,
    relativistic_d_loss,
    relativistic_g_loss,
)
from tests.reference_oracle import load_reference  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted"
)

B, E, FDIM = 6, 16, 12
IMG = (3, 8, 8)  # torch CHW
PX = IMG[0] * IMG[1] * IMG[2]


@pytest.fixture(scope="module")
def ref_losses():
    load_reference()
    import importlib

    m = importlib.import_module("miscc.losses")
    m.server = 1  # modern torch needs .bool() masks (losses.py:52-55)
    return m


class _StubD:
    """Linear torch discriminator with the reference's netD interface."""

    def __init__(self, seed, sigmoid, uncond=True):
        g = torch.Generator().manual_seed(seed)
        self.Wf = 0.1 * torch.randn(PX, FDIM, generator=g)
        self.Wc = 0.3 * torch.randn(FDIM + E, 1, generator=g)
        self.Wu = 0.3 * torch.randn(FDIM, 1, generator=g)
        self.sigmoid = sigmoid
        self.COND_DNET = self._cond
        self.UNCOND_DNET = self._uncond if uncond else None

    def __call__(self, img):
        return img.reshape(img.shape[0], -1) @ self.Wf

    def _act(self, z):
        return torch.sigmoid(z) if self.sigmoid else z

    def _cond(self, h, c):
        return self._act((torch.cat([h, c], dim=1) @ self.Wc).squeeze(1))

    def _uncond(self, h):
        return self._act((h @ self.Wu).squeeze(1))

    def jax_closures(self):
        """Returns (d_feat, d_cond, d_uncond) producing raw LOGITS on NHWC
        images -- the tgsr_tpu convention."""
        Wf = jnp.asarray(self.Wf.numpy())
        Wc = jnp.asarray(self.Wc.numpy())
        Wu = jnp.asarray(self.Wu.numpy())

        def d_feat(img):  # NHWC -> match torch's CHW flatten order
            return img.transpose(0, 3, 1, 2).reshape(img.shape[0], -1) @ Wf

        def d_cond(h, c):
            return (jnp.concatenate([h, c], axis=1) @ Wc).reshape(-1)

        def d_uncond(h):
            return (h @ Wu).reshape(-1)

        return d_feat, d_cond, d_uncond


class _StubEncoder:
    """image -> (region_features [B,E,17,17] torch / [B,R,E] jax, code)."""

    def __init__(self, seed):
        g = torch.Generator().manual_seed(seed)
        self.Wr = 0.05 * torch.randn(PX, E * 4, generator=g)
        self.Wc = 0.05 * torch.randn(PX, E, generator=g)

    def __call__(self, img):
        b = img.shape[0]
        flat = img.reshape(b, -1)
        region = (flat @ self.Wr).reshape(b, E, 2, 2)
        region = region.repeat_interleave(9, dim=2)[:, :, :17, :]
        region = region.repeat_interleave(9, dim=3)[:, :, :, :17]
        return region.contiguous(), flat @ self.Wc

    def jax_apply(self):
        def apply(img):  # NHWC
            b = img.shape[0]
            flat = img.transpose(0, 3, 1, 2).reshape(b, -1)
            region = (flat @ jnp.asarray(self.Wr.numpy())).reshape(b, E, 2, 2)
            region = jnp.repeat(region, 9, axis=2)[:, :, :17, :]
            region = jnp.repeat(region, 9, axis=3)[:, :, :, :17]
            # [B,E,17,17] -> [B, R=289, E]
            return region.reshape(b, E, -1).transpose(0, 2, 1), (
                flat @ jnp.asarray(self.Wc.numpy()))

        return apply


def _text(seed=0, T=7):
    g = torch.Generator().manual_seed(seed)
    sent = torch.randn(B, E, generator=g)
    words = torch.randn(B, E, T, generator=g)
    cap_lens = torch.tensor(sorted([T, T - 1, T - 2, 4, 3, 2], reverse=True))
    class_ids = np.array([1, 2, 2, 3, 4, 1])
    return sent, words, cap_lens, class_ids


def _imgs(seed, n_scales=2):
    g = torch.Generator().manual_seed(seed)
    return (
        [torch.randn(B, *IMG, generator=g) for _ in range(n_scales)],
        [torch.randn(B, *IMG, generator=g) for _ in range(n_scales)],
    )


def _nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def test_discriminator_loss_parity(ref_losses):
    """Primary BCEWithLogits D loss, with and without UNCOND head."""
    reals, fakes = _imgs(10, 1)
    sent, _, _, _ = _text(11)
    ones, zeros = torch.ones(B), torch.zeros(B)
    for uncond in (True, False):
        d = _StubD(seed=12, sigmoid=False, uncond=uncond)
        ref = ref_losses.discriminator_loss(d, reals[0], fakes[0], sent,
                                            ones, zeros).item()
        got = float(discriminator_loss(
            *d.jax_closures()[:2],
            d.jax_closures()[2] if uncond else None,
            _nhwc(reals[0]), _nhwc(fakes[0]), jnp.asarray(sent.numpy())))
        np.testing.assert_allclose(got, ref, rtol=1e-5, err_msg=f"uncond={uncond}")


def test_generator_loss_parity(ref_losses):
    """Primary BCEWithLogits G loss incl. DAMSM word/sent terms."""
    _, fakes = _imgs(20, 2)
    sent, words, cap_lens, class_ids = _text(21)
    enc = _StubEncoder(22)
    ds = [_StubD(seed=23 + i, sigmoid=False) for i in range(2)]
    labels = torch.arange(B)
    ref, _ = ref_losses.generator_loss(
        ds, enc, fakes, torch.ones(B), words, sent, labels, cap_lens,
        class_ids)
    got, _ = generator_loss(
        [d.jax_closures() for d in ds], enc.jax_apply(),
        [_nhwc(f) for f in fakes], jnp.asarray(sent.numpy()),
        jnp.asarray(words.numpy().transpose(0, 2, 1)),
        jnp.asarray(cap_lens.numpy()), jnp.asarray(class_ids),
        gammas=(5.0, 5.0, 10.0), smooth_lambda=1.0)
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-4)


def test_or_family_parity(ref_losses):
    """discriminator_lossor / generator_lossor: sigmoid-terminated torch Ds,
    plain BCELoss == our BCEWithLogits on the underlying logits."""
    reals, fakes = _imgs(30, 2)
    sent, words, cap_lens, class_ids = _text(31)
    ones, zeros = torch.ones(B), torch.zeros(B)
    labels = torch.arange(B)
    ds = [_StubD(seed=32 + i, sigmoid=True) for i in range(2)]
    enc = _StubEncoder(34)

    ref_d = ref_losses.discriminator_lossor(
        ds[0], reals[0], fakes[0], sent, ones, zeros).item()
    got_d = float(discriminator_loss(
        *ds[0].jax_closures(), _nhwc(reals[0]), _nhwc(fakes[0]),
        jnp.asarray(sent.numpy())))
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-5)

    ref_g, _ = ref_losses.generator_lossor(
        ds, enc, fakes, ones, words, sent, labels, cap_lens, class_ids,
        w=1, s=1, g=1)
    got_g, _ = generator_loss_sigmoid(
        [d.jax_closures() for d in ds], enc.jax_apply(),
        [_nhwc(f) for f in fakes], jnp.asarray(sent.numpy()),
        jnp.asarray(words.numpy().transpose(0, 2, 1)),
        jnp.asarray(cap_lens.numpy()), jnp.asarray(class_ids),
        gammas=(5.0, 5.0, 10.0), smooth_lambda=1.0)
    np.testing.assert_allclose(float(got_g), ref_g.item(), rtol=1e-4)

    # w=0/s=0 must skip the DAMSM terms exactly like the reference gate
    ref_g0, _ = ref_losses.generator_lossor(
        ds, enc, fakes, ones, words, sent, labels, cap_lens, class_ids,
        w=0, s=1, g=1)
    got_g0, _ = generator_loss_sigmoid(
        [d.jax_closures() for d in ds], enc.jax_apply(),
        [_nhwc(f) for f in fakes], jnp.asarray(sent.numpy()),
        jnp.asarray(words.numpy().transpose(0, 2, 1)),
        jnp.asarray(cap_lens.numpy()), jnp.asarray(class_ids),
        gammas=(5.0, 5.0, 10.0), smooth_lambda=1.0, w=0, s=1)
    np.testing.assert_allclose(float(got_g0), ref_g0.item(), rtol=1e-4)


def test_face_family_parity(ref_losses):
    """generator_lossorface: per-D g weights."""
    _, fakes = _imgs(40, 3)
    sent, words, cap_lens, class_ids = _text(41)
    ds = [_StubD(seed=42 + i, sigmoid=True) for i in range(3)]
    enc = _StubEncoder(45)
    labels = torch.arange(B)
    g_weights = [0.5, 1.0, 2.0]  # plain list: the reference's `if g == 1`
    # check is ambiguous on an ndarray

    ref_g, _ = ref_losses.generator_lossorface(
        ds, enc, fakes, torch.ones(B), words, sent, labels, cap_lens,
        class_ids, w=1, s=1, g=g_weights)
    got_g, _ = generator_loss_face(
        [d.jax_closures() for d in ds], enc.jax_apply(),
        [_nhwc(f) for f in fakes], jnp.asarray(sent.numpy()),
        jnp.asarray(words.numpy().transpose(0, 2, 1)),
        jnp.asarray(cap_lens.numpy()), jnp.asarray(class_ids),
        gammas=(5.0, 5.0, 10.0), smooth_lambda=1.0, g=list(g_weights))
    np.testing.assert_allclose(float(got_g), ref_g.item(), rtol=1e-4)


def test_nowordsent_parity(ref_losses):
    _, fakes = _imgs(50, 2)
    sent, _, _, _ = _text(51)
    ds = [_StubD(seed=52 + i, sigmoid=True) for i in range(2)]
    ref_g, _ = ref_losses.generator_lossor_nowordsent(
        ds, fakes, torch.ones(B), sent, g=1)
    got_g, _ = generator_loss_no_wordsent(
        [d.jax_closures() for d in ds], [_nhwc(f) for f in fakes],
        jnp.asarray(sent.numpy()), g=1.0)
    np.testing.assert_allclose(float(got_g), ref_g.item(), rtol=1e-5)


def test_uncond_family_parity(ref_losses):
    reals, fakes = _imgs(60, 2)
    ds = [_StubD(seed=62 + i, sigmoid=True) for i in range(2)]
    ones, zeros = torch.ones(B), torch.zeros(B)

    ref_g, _ = ref_losses.generator_lossor_Uncond(ds, fakes, ones)
    got_g, _ = generator_loss_uncond(
        [d.jax_closures() for d in ds], [_nhwc(f) for f in fakes])
    np.testing.assert_allclose(float(got_g), ref_g.item(), rtol=1e-5)

    ref_d = ref_losses.discriminator_lossor_Uncond(
        ds[0], reals[0], fakes[0], ones, zeros).item()
    feat, _, unc = ds[0].jax_closures()
    got_d = float(discriminator_loss_uncond(
        feat, unc, _nhwc(reals[0]), _nhwc(fakes[0])))
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-5)


class _StubPlainD:
    """netD(img) -> raw logits directly (the ESRGAN D contract)."""

    def __init__(self, seed):
        g = torch.Generator().manual_seed(seed)
        self.W = 0.1 * torch.randn(PX, 1, generator=g)

    def __call__(self, img):
        return (img.reshape(img.shape[0], -1) @ self.W).squeeze(1)

    def jax_apply(self):
        W = jnp.asarray(self.W.numpy())

        def apply(img):
            return (
                img.transpose(0, 3, 1, 2).reshape(img.shape[0], -1) @ W
            ).reshape(-1)

        return apply


def test_esrgan_parity(ref_losses):
    """ESRGAN_loss / ESRGAND_loss incl. the operand-swap quirk
    (pred_real = D(fake.detach()), pred_fake = D(real), losses.py:820-821)."""
    reals, fakes = _imgs(70, 1)
    d = _StubPlainD(71)
    ones, zeros = torch.ones(B), torch.zeros(B)

    ref_g, _ = ref_losses.ESRGAN_loss(d, fakes[0], reals[0], ones)
    got_g = float(esrgan_g_loss(d.jax_apply(), _nhwc(fakes[0]),
                                _nhwc(reals[0])))
    np.testing.assert_allclose(got_g, ref_g.item(), rtol=1e-5)

    ref_d = ref_losses.ESRGAND_loss(d, reals[0], fakes[0], ones, zeros).item()
    got_d = float(esrgan_d_loss(d.jax_apply(), _nhwc(reals[0]),
                                _nhwc(fakes[0])))
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-5)


class _EgankD:
    """Sigmoid-terminated D for the EGAN family: features = identity,
    UNCOND_DNET = sigmoid(mean(img))."""

    def __call__(self, img):
        return img.reshape(img.shape[0], -1)

    def UNCOND_DNET(self, h):
        return torch.sigmoid(h.mean(dim=1))

    @staticmethod
    def jax_closures():
        def d_feat(img):
            return img.transpose(0, 3, 1, 2).reshape(img.shape[0], -1)

        def d_uncond(h):  # logits; relativistic_* applies the sigmoid
            return h.mean(axis=1)

        return d_feat, d_uncond


def test_egan_generator_parity(ref_losses):
    """generator_EGAN_loss: valid only where p_fake > p_real elementwise.
    Engineered regime: bright fakes vs dark reals."""
    g = torch.Generator().manual_seed(80)
    fake = 3.0 + 0.1 * torch.randn(B, *IMG, generator=g)
    real = -3.0 + 0.1 * torch.randn(B, *IMG, generator=g)
    d = _EgankD()
    ref_g, _ = ref_losses.generator_EGAN_loss(d, fake, real, torch.ones(B))
    got_g = float(relativistic_g_loss(*_EgankD.jax_closures(), _nhwc(fake),
                                      _nhwc(real)))
    np.testing.assert_allclose(got_g, ref_g.item(), rtol=1e-5)


def test_egan_discriminator_domain_pathology(ref_losses):
    """discriminator_EGAND_loss is domain-invalid for any non-degenerate
    predictions (some BCE input is < 0 -> torch raises); our port yields NaN
    in the same regime and matches in the sole valid (degenerate) one."""
    g = torch.Generator().manual_seed(81)
    real = 3.0 + 0.1 * torch.randn(B, *IMG, generator=g)
    fake = -3.0 + 0.1 * torch.randn(B, *IMG, generator=g)
    d = _EgankD()
    with pytest.raises(RuntimeError):
        ref_losses.discriminator_EGAND_loss(d, real, fake, torch.ones(B),
                                            torch.zeros(B))
    got = float(relativistic_d_loss(*_EgankD.jax_closures(), _nhwc(real),
                                    _nhwc(fake)))
    assert np.isnan(got)

    # degenerate-but-valid point: identical images -> all diffs exactly 0
    same = torch.zeros(B, *IMG)
    ref_d = ref_losses.discriminator_EGAND_loss(
        d, same, same.clone(), torch.ones(B), torch.zeros(B)).item()
    got_d = float(relativistic_d_loss(*_EgankD.jax_closures(), _nhwc(same),
                                      _nhwc(same)))
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-5)


def test_words_reweight_parity(ref_losses):
    """words_reweight_loss: attention-confidence word scaling."""
    T = 7
    g = torch.Generator().manual_seed(90)
    img = torch.randn(B, E, 3, 3, generator=g)  # R=9 regions
    words = torch.randn(B, E, T, generator=g)
    cap_lens = torch.tensor(sorted([T, T - 1, T - 2, 4, 3, 2], reverse=True))
    class_ids = np.array([1, 2, 2, 3, 4, 1])
    labels = torch.arange(B)
    attn_map = torch.rand(B, T, 4, 4, generator=g)
    attn_map = attn_map / attn_map.sum(dim=1, keepdim=True)  # softmax-like

    l0, l1, _ = ref_losses.words_reweight_loss(
        img, words, labels, cap_lens, class_ids, B, attn_map)

    scale = word_confidence_scores(jnp.asarray(attn_map.numpy()),
                                   jnp.asarray(cap_lens.numpy()))
    j0, j1, _ = words_loss(
        jnp.asarray(img.numpy().reshape(B, E, -1).transpose(0, 2, 1)),
        jnp.asarray(words.numpy().transpose(0, 2, 1)),
        jnp.asarray(cap_lens.numpy()), jnp.asarray(class_ids),
        gamma1=5.0, gamma2=5.0, gamma3=10.0, word_scale=scale)
    np.testing.assert_allclose(float(j0), l0.item(), rtol=1e-4)
    np.testing.assert_allclose(float(j1), l1.item(), rtol=1e-4)


@pytest.mark.slow
def test_esrgan_dnet_with_relativistic_losses():
    """ESRGANDNet (models/discriminator.py): logits contract + one D/G
    gradient step through the ESRGAN loss pair stays finite."""
    import optax

    from tgsr_tpu.models.discriminator import ESRGANDNet

    d = ESRGANDNet(ndf=16)
    k = jax.random.PRNGKey(0)
    img = 0.3 * jax.random.normal(k, (4, 64, 64, 3))
    v = d.init(k, img, train=True)
    logits = d.apply(v, img, train=False)
    assert logits.shape == (4,)

    def d_apply_train(params, x):
        out, _ = d.apply({"params": params,
                          "batch_stats": v["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        return out

    real = img
    fake = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))

    def d_loss(params):
        return esrgan_d_loss(lambda x: d_apply_train(params, x), real, fake)

    loss, grads = jax.value_and_grad(d_loss)(v["params"])
    assert np.isfinite(float(loss))
    tx = optax.adam(1e-4)
    updates, _ = tx.update(grads, tx.init(v["params"]), v["params"])
    new_params = optax.apply_updates(v["params"], updates)
    g_loss = esrgan_g_loss(lambda x: d_apply_train(new_params, x), fake, real)
    assert np.isfinite(float(g_loss))


class _StubVGG:
    """img -> list of 2 feature maps (the VGG16 tower contract)."""

    def __init__(self, seed):
        g = torch.Generator().manual_seed(seed)
        self.W1 = 0.1 * torch.randn(PX, 24, generator=g)
        self.W2 = 0.1 * torch.randn(PX, 8, generator=g)

    def __call__(self, img):
        flat = img.reshape(img.shape[0], -1)
        return [(flat @ self.W1).reshape(-1, 2, 3, 4),
                (flat @ self.W2).reshape(-1, 2, 2, 2)]

    def jax_apply(self):
        def apply(img):
            flat = img.transpose(0, 3, 1, 2).reshape(img.shape[0], -1)
            return [(flat @ jnp.asarray(self.W1.numpy())).reshape(-1, 2, 3, 4),
                    (flat @ jnp.asarray(self.W2.numpy())).reshape(-1, 2, 2, 2)]

        return apply


def test_mani_family_parity(ref_losses):
    """discriminator_lossMani / generator_lossMani / DCM_generator_loss
    (losses.py:583-704) vs stub-D/encoder/VGG oracles."""
    from tgsr_tpu.losses.mani import (
        dcm_generator_loss,
        discriminator_loss_mani,
        generator_loss_mani,
    )

    reals, fakes = _imgs(90, 2)
    sent, words, cap_lens, class_ids = _text(91)
    ones, zeros = torch.ones(B), torch.zeros(B)
    labels = torch.arange(B)
    enc = _StubEncoder(92)
    vgg = _StubVGG(93)
    d = _StubD(seed=94, sigmoid=True)
    ds = [_StubD(seed=94 + i, sigmoid=True) for i in range(2)]

    words_j = jnp.asarray(words.numpy().transpose(0, 2, 1))
    lens_j = jnp.asarray(cap_lens.numpy())

    ref_d = ref_losses.discriminator_lossMani(
        d, reals[0], fakes[0], sent, ones, zeros, words, cap_lens, enc,
        class_ids).item()
    got_d = float(discriminator_loss_mani(
        *d.jax_closures(), _nhwc(reals[0]), _nhwc(fakes[0]),
        jnp.asarray(sent.numpy()), enc.jax_apply(), words_j, lens_j,
        gamma1=5.0, gamma2=5.0))
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-4)

    ref_g, _ = ref_losses.generator_lossMani(
        ds, enc, fakes, ones, words, sent, labels, cap_lens, class_ids,
        vgg, reals)
    got_g, _ = generator_loss_mani(
        [dd.jax_closures() for dd in ds], enc.jax_apply(), vgg.jax_apply(),
        [_nhwc(f) for f in fakes], [_nhwc(r) for r in reals],
        jnp.asarray(sent.numpy()), words_j, lens_j, jnp.asarray(class_ids),
        gammas=(5.0, 5.0, 10.0), smooth_lambda=1.0)
    np.testing.assert_allclose(float(got_g), ref_g.item(), rtol=1e-4)

    ref_c, _ = ref_losses.DCM_generator_loss(
        d, enc, fakes[0], ones, words, sent, labels, cap_lens, class_ids,
        vgg, reals[0])
    got_c, _ = dcm_generator_loss(
        *d.jax_closures(), enc.jax_apply(), _nhwc(fakes[0]),
        jnp.asarray(sent.numpy()), words_j, lens_j, jnp.asarray(class_ids),
        gammas=(5.0, 5.0, 10.0), smooth_lambda=1.0)
    np.testing.assert_allclose(float(got_c), ref_c.item(), rtol=1e-4)
