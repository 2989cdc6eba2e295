"""Smoke + shape tests for the generator variant zoo, VGG16, Mani losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.models.variants import (
    EDCoder,
    IAWD,
    IAWDSpatial,
    IAWDWord,
    InitStageG,
    InitStageGfc,
    InitStageGim,
    InitStageGImg,
    InitStageGup4,
    NextStageGLR,
    NextStageGNoAttn,
    WordAtten,
)

K = jax.random.PRNGKey(0)


def test_init_stage_g_family_shapes():
    z = jnp.zeros((2, 100))
    c = jnp.zeros((2, 100))
    m = InitStageG(ngf=64)  # reference passes ngf*16; use 64 for speed
    v = m.init(K, z, c)
    out = m.apply(v, z, c)
    assert out.shape == (2, 64, 64, 4)  # 4 upsamples from 4x4, ngf/16 ch

    m4 = InitStageGup4(ngf=64)
    out4 = m4.apply(m4.init(K, z, c), z, c)
    assert out4.shape == (2, 16, 16, 16)

    mfc = InitStageGfc(ngf=32, scale=8)
    outfc = mfc.apply(mfc.init(K, c), c)
    assert outfc.shape == (2, 32, 32, 4)


def test_init_stage_gim_and_gimg():
    lr = jnp.zeros((2, 32, 32, 3))
    c = jnp.zeros((2, 100))
    m = InitStageGim(ngf=32, scale=8)
    out = m.apply(m.init(K, lr, c), lr, c)
    assert out.shape == (2, 32, 32, 32)

    words = jnp.zeros((2, 6, 256))
    mask = jnp.zeros((2, 6), bool)
    mi = InitStageGImg(ngf=32)
    out = mi.apply(mi.init(K, lr, words, mask), lr, words, mask)
    assert out.shape == (2, 32, 32, 32)

    miw = InitStageGImg(ngf=32, weightatten=True)
    out = miw.apply(miw.init(K, lr, words, mask), lr, words, mask)
    assert out.shape == (2, 32, 32, 32)


def test_next_stage_variants():
    h = jnp.zeros((2, 16, 16, 32))
    m = NextStageGNoAttn(ngf=32)
    out = m.apply(m.init(K, h), h)
    assert out.shape == (2, 32, 32, 32)

    words = jnp.zeros((2, 6, 256))
    mask = jnp.zeros((2, 6), bool)
    mlr = NextStageGLR(ngf=32)
    out, att = mlr.apply(mlr.init(K, h, words, mask), h, words, mask)
    assert out.shape == (2, 16, 16, 32)  # no upsample
    assert att.shape == (2, 6, 16, 16)


def test_edcoder():
    x = jnp.zeros((1, 32, 32, 3))
    m = EDCoder(ngf=16)
    out = m.apply(m.init(K, x), x)
    assert out.shape == (1, 32, 32, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_iawd_family():
    imf = jax.random.normal(K, (2, 8, 8, 32))
    words = jax.random.normal(jax.random.fold_in(K, 1), (2, 6, 256))
    m = IAWD()
    out = m.apply(m.init(K, imf, words), imf, words)
    assert out.shape == words.shape
    mw = WordAtten()
    out = mw.apply(mw.init(K, imf, words), imf, words)
    assert out.shape == words.shape
    ms = IAWDSpatial()
    out = ms.apply(ms.init(K, imf, words), imf, words)
    assert out.shape == words.shape


def test_vgg16_features():
    from tgsr_tpu.models.vgg import VGG16Features

    x = jnp.zeros((1, 64, 64, 3))
    m = VGG16Features()
    v = m.init(K, x)
    taps = m.apply(v, x)
    assert [t.shape[1] for t in taps] == [64, 32, 16, 8, 4]
    assert [t.shape[-1] for t in taps] == [64, 128, 256, 512, 512]
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert 14.0e6 < n < 15.0e6  # vgg16 conv tower ~14.7M


def test_word_level_correlation_and_mani():
    from tgsr_tpu.losses.mani import word_level_correlation

    regions = jax.random.normal(K, (3, 9, 16))
    words = jax.random.normal(jax.random.fold_in(K, 2), (3, 5, 16))
    lens = jnp.array([5, 3, 2])
    loss = word_level_correlation(regions, words, lens, jnp.ones((3,)))
    assert np.isfinite(float(loss))
    # stop-gradient semantics: no grad through words (reference
    # requires_grad=False quirk, losses.py:745)
    g = jax.grad(lambda w: word_level_correlation(
        regions, w, lens, jnp.ones((3,))))(words)
    assert float(jnp.abs(g).max()) == 0.0
