"""Rematerialization (jax.checkpoint) correctness for the GAN trainer.

remat=True must change MEMORY behavior only: identical params after init,
identical step metrics and updated params vs the remat=False step (same
seeds, same batch). The B>=256 memory win itself is measured on the TPU
(docs/PERF.md "Training batch scaling").
"""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.config import Config
from tgsr_tpu.engine.gan_trainer import GANTrainer
from tgsr_tpu.models.text_encoder import TextEncoder


def _setup(remat, **kw):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16, DF_DIM=16),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=2),
    )
    B, T, vocab = 2, cfg.TEXT.WORDS_NUM, 17
    k = jax.random.PRNGKey(0)
    caps = jnp.ones((B, T), jnp.int32).at[:, 6:].set(0)
    lens = jnp.full((B,), 6, jnp.int32)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    text_vars = enc.init(k, caps, lens)
    trainer = GANTrainer(cfg, vocab, text_vars, remat=remat, **kw)
    rngs = jax.random.split(jax.random.PRNGKey(3), 5)
    batch = {
        "lr": jax.random.normal(rngs[0], (B, 8, 8, 3)) * 0.3,
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
def test_remat_step_matches_baseline():
    t0, batch = _setup(remat=False)
    t1, _ = _setup(remat=True)
    k = jax.random.PRNGKey(1)
    s0 = t0.init_state(k, batch_size=2)
    s1 = t1.init_state(k, batch_size=2)
    # identical init: remat must not alter parameter structure or values
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s0.g_params, s1.g_params)

    step_rng = jax.random.PRNGKey(2)
    s0, m0, _ = t0.train_step(s0, batch, step_rng)
    s1, m1, _ = t1.train_step(s1, batch, step_rng)
    for name in m0:
        np.testing.assert_allclose(float(m0[name]), float(m1[name]),
                                   rtol=2e-5, atol=2e-6, err_msg=name)
    flat0 = jax.tree_util.tree_leaves_with_path(s0.g_params)
    flat1 = jax.tree_util.tree_leaves_with_path(s1.g_params)
    for (p0, a), (p1, b) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=jax.tree_util.keystr(p0))


@pytest.mark.slow
def test_remat_granularity_matches_baseline():
    """'low'/'high' selective remat must also be numerics-preserving, and
    an unknown policy must be rejected eagerly."""
    t0, batch = _setup(remat=False)
    k, step_rng = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    s0 = t0.init_state(k, batch_size=2)
    _, m0, _ = t0.train_step(s0, batch, step_rng)
    for policy in ("low", "high"):
        t1, _ = _setup(remat=policy)
        s1 = t1.init_state(k, batch_size=2)
        _, m1, _ = t1.train_step(s1, batch, step_rng)
        for name in m0:
            np.testing.assert_allclose(
                float(m0[name]), float(m1[name]), rtol=2e-5, atol=2e-6,
                err_msg=f"{policy}:{name}")

    import pytest

    with pytest.raises(ValueError, match="remat"):
        _setup(remat="bogus")


@pytest.mark.slow
def test_reuse_g_forward_matches_baseline():
    """reuse_g_forward=True (single vjp'd G forward shared by the D and G
    updates) must be numerics-preserving vs the two-forward baseline: same
    step metrics, same updated params, same BN running stats. Also checks
    composition with remat (the vjp saves remat'd residuals)."""
    t0, batch = _setup(remat=False, reuse_g_forward=False)
    k, step_rng = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    s0 = t0.init_state(k, batch_size=2)
    s0, m0, _ = t0.train_step(s0, batch, step_rng)
    for remat in (False, "low"):
        t1, _ = _setup(remat=remat, reuse_g_forward=True)
        s1 = t1.init_state(k, batch_size=2)
        s1, m1, _ = t1.train_step(s1, batch, step_rng)
        for name in m0:
            np.testing.assert_allclose(
                float(m0[name]), float(m1[name]), rtol=2e-5, atol=2e-6,
                err_msg=f"remat={remat}:{name}")
        for tree0, tree1, what in (
            (s0.g_params, s1.g_params, "g_params"),
            (s0.d_params, s1.d_params, "d_params"),
            (s0.g_stats, s1.g_stats, "g_stats"),
        ):
            flat0 = jax.tree_util.tree_leaves_with_path(tree0)
            flat1 = jax.tree_util.tree_leaves_with_path(tree1)
            assert len(flat0) == len(flat1)
            for (p0, a), (p1, b) in zip(flat0, flat1):
                assert p0 == p1
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
                    err_msg=f"remat={remat}:{what}{jax.tree_util.keystr(p0)}")
