"""Checkpoint-resume equivalence: train k steps, checkpoint, restore into a
FRESH state, continue -- must match the uninterrupted run exactly.

This is the failure-recovery contract behind cli/train_gan --resume
(restart-resume per SURVEY.md section 5); the reference's only recovery
mechanism is a KeyboardInterrupt handler (pretrain_DAMSM.py:293-295).
"""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.config import Config
from tgsr_tpu.engine.gan_trainer import GANTrainer
from tgsr_tpu.models.text_encoder import TextEncoder


def _tiny_setup():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16, DF_DIM=16),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=2),
    )
    B, T, vocab = 2, cfg.TEXT.WORDS_NUM, 41
    rng = np.random.RandomState(0)
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.asarray(rng.randint(1, vocab, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    text_vars = enc.init(k, caps, lens)
    trainer = GANTrainer(cfg, vocab, text_vars)
    state = trainer.init_state(k, batch_size=B)
    batch = {
        "lr": jnp.asarray(rng.randn(B, 8, 8, 3) * 0.3, jnp.float32),
        "real_pyramid": [
            jnp.asarray(rng.randn(B, s, s, 3) * 0.3, jnp.float32)
            for s in cfg.pyramid_sizes()
        ],
        "captions": caps,
        "cap_lens": lens,
        "class_ids": jnp.arange(B, dtype=jnp.int32),
    }
    return trainer, state, batch


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path):
    from tgsr_tpu.checkpoints.orbax_io import (
        latest_step, restore_train_state, save_train_state)

    trainer, state0, batch = _tiny_setup()

    # uninterrupted: 4 steps
    rng = jax.random.PRNGKey(7)
    state = jax.tree.map(jnp.copy, state0)
    rngs = []
    for _ in range(4):
        rngs.append(rng)
        state, _, rng = trainer.train_step(state, batch, rng)
    ref_params = jax.device_get(state.g_params)
    ref_ema = jax.device_get(state.g_ema)

    # interrupted at step 2: checkpoint, restore into a FRESH init, resume
    rng = jax.random.PRNGKey(7)
    state = jax.tree.map(jnp.copy, state0)
    for _ in range(2):
        state, _, rng = trainer.train_step(state, batch, rng)
    save_train_state(str(tmp_path), 2, jax.device_get(state))
    assert latest_step(str(tmp_path)) == 2

    trainer2, fresh, _ = _tiny_setup()  # fresh trainer + state (new process)
    restored, step = restore_train_state(
        str(tmp_path), jax.tree.map(np.asarray, jax.device_get(fresh)))
    assert step == 2
    state2 = jax.tree.map(jnp.asarray, restored)
    rng2 = rngs[2]  # the rng the uninterrupted run used at step 3
    for _ in range(2):
        state2, _, rng2 = trainer2.train_step(state2, batch, rng2)

    got_params = jax.device_get(state2.g_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        ref_params, got_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        ref_ema, jax.device_get(state2.g_ema))
    assert int(state2.step) == 4
