"""GAN training for the x16 (models16) family.

The reference ships no trainer at all (SURVEY.md 2.9) and its x16 models
(models16.py:5-179) were therefore never trainable in the snapshot either;
GANTrainer extends the reconstructed protocol to them via the same family
switch the inference engine uses (BRANCH_NUM==4 -> model.py family, else
models16 with its weight-tying quirks).

Checks: a fused D+G step runs at BRANCH_NUM=5 geometry with finite metrics,
the pyramid/D stack really has 4 scales, the tied parameters stay tied
(single h_net2 / img_net1 in the tree), and remat='all' reproduces the
remat=False step bit-for-bit in f32 (memory-only transform).
"""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.config import Config
from tgsr_tpu.engine.gan_trainer import GANTrainer
from tgsr_tpu.models.text_encoder import TextEncoder


def _setup(remat=False, base=4):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=5, BASE_SIZE=base),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=8, DF_DIM=8),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=2),
    )
    B, T, vocab = 2, cfg.TEXT.WORDS_NUM, 17
    k = jax.random.PRNGKey(0)
    caps = jnp.ones((B, T), jnp.int32).at[:, 6:].set(0)
    lens = jnp.full((B,), 6, jnp.int32)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    text_vars = enc.init(k, caps, lens)
    trainer = GANTrainer(cfg, vocab, text_vars, remat=remat)
    rngs = jax.random.split(jax.random.PRNGKey(3), 6)
    batch = {
        "lr": jax.random.normal(rngs[0], (B, base, base, 3)) * 0.3,
        "real_pyramid": [
            jax.random.normal(kk, (B, s, s, 3)) * 0.3
            for kk, s in zip(rngs[1:], cfg.pyramid_sizes())
        ],
        "captions": caps,
        "cap_lens": lens,
        "class_ids": jnp.arange(B, dtype=jnp.int32),
    }
    return trainer, batch


@pytest.mark.slow
def test_x16_step_runs_and_is_finite():
    trainer, batch = _setup()
    assert len(trainer.sizes) == 4  # 8/16/32/64 at BASE_SIZE=4
    state = trainer.init_state(jax.random.PRNGKey(1))
    # the x16 weight tying: ONE next-stage module and ONE image head
    netg = state.g_params["netg"]
    assert "h_net2" in netg and "h_net3" not in netg
    assert "img_net1" in netg and "img_net2" not in netg
    # the faithful NetGHighWeight16 param set (untied blocks, scalar a)
    netgh = state.g_params["netgh"]
    assert "upscale8x" in netgh and "a" in netgh
    assert len(state.d_params) == 4

    # train_step donates the state; snapshot a param leaf before stepping
    leaf_before = np.asarray(jax.tree.leaves(state.g_params)[0]).copy()
    state2, metrics, _ = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # the optimizer actually moved the params
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state2.g_params)[0]), leaf_before)


@pytest.mark.slow
def test_x16_remat_matches_baseline():
    t0, batch = _setup(remat=False)
    t1, _ = _setup(remat="all")
    s0 = t0.init_state(jax.random.PRNGKey(1))
    s1 = t1.init_state(jax.random.PRNGKey(1))
    # identical init trees (remat must not change param structure/values)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s0.g_params, s1.g_params)

    s0, m0, _ = t0.train_step(s0, batch, jax.random.PRNGKey(2))
    s1, m1, _ = t1.train_step(s1, batch, jax.random.PRNGKey(2))
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-5,
                                   err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s0.g_params, s1.g_params)


@pytest.mark.slow
def test_x16_dp_sharded_step_matches_single_device():
    """DP equivalence for the x16 family (the x8 version lives in
    test_gan_trainer_sharding.py): the mesh-sharded BRANCH_NUM=5 fused
    step must reproduce the single-device metrics — placement, not math."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert len(jax.devices()) >= 8
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=5, BASE_SIZE=4),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=8, DF_DIM=8),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=8),
    )
    B, T, vocab = 8, cfg.TEXT.WORDS_NUM, 17
    k = jax.random.PRNGKey(0)
    caps = jnp.ones((B, T), jnp.int32).at[:, 6:].set(0)
    lens = jnp.full((B,), 6, jnp.int32)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    text_vars = enc.init(k, caps, lens)
    rngs = jax.random.split(jax.random.PRNGKey(3), 6)
    batch = {
        "lr": jax.random.normal(rngs[0], (B, 4, 4, 3)) * 0.3,
        "real_pyramid": [
            jax.random.normal(kk, (B, s, s, 3)) * 0.3
            for kk, s in zip(rngs[1:], cfg.pyramid_sizes())
        ],
        "captions": caps,
        "cap_lens": lens,
        "class_ids": jnp.arange(B, dtype=jnp.int32),
    }
    step_rng = jax.random.PRNGKey(2)

    ref = GANTrainer(cfg, vocab, text_vars)
    ref_state = ref.init_state(k, batch_size=B)
    _, ref_metrics, _ = ref.train_step(ref_state, batch, step_rng)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))
    sh = GANTrainer(cfg, vocab, text_vars, mesh=mesh)
    sh_state = jax.device_put(sh.init_state(k, batch_size=B),
                              NamedSharding(mesh, P()))
    sh_batch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        batch)
    _, sh_metrics, _ = sh.train_step(sh_state, sh_batch, step_rng)

    for name in ref_metrics:
        np.testing.assert_allclose(
            float(sh_metrics[name]), float(ref_metrics[name]),
            rtol=2e-4, atol=2e-5, err_msg=name)
