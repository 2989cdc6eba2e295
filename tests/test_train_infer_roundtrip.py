"""Integration: GAN training -> EMA snapshot -> SRPipeline inference.

Validates the full production loop the reference implies but never ships:
train both generator branches adversarially, snapshot the EMA weights
(paired netG/netGH, trainer_objective.py:91-93 convention), reload them into
the inference engine, and super-resolve.
"""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.config import Config
from tgsr_tpu.engine.gan_trainer import GANTrainer
from tgsr_tpu.engine.inference import SRPipeline
from tgsr_tpu.models.text_encoder import TextEncoder


@pytest.mark.slow
def test_train_snapshot_infer_roundtrip(tmp_path):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16, DF_DIM=16),
    )
    vocab, B, T = 12, 4, 18
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.ones((B, T), jnp.int32).at[:, 6:].set(0)
    lens = jnp.full((B,), 6, jnp.int32)
    text_vars = enc.init(k, caps, lens)

    trainer = GANTrainer(cfg, vocab, text_vars)
    state = trainer.init_state(k, batch_size=B)

    rng = jax.random.PRNGKey(1)
    batch = {
        "lr": 0.2 * jax.random.normal(rng, (B, 8, 8, 3)),
        "real_pyramid": [
            0.2 * jax.random.normal(jax.random.fold_in(rng, s), (B, s, s, 3))
            for s in cfg.pyramid_sizes()
        ],
        "captions": caps,
        "cap_lens": lens,
        "class_ids": jnp.arange(B, dtype=jnp.int32),
    }
    losses = []
    for i in range(5):
        state, metrics, rng = trainer.train_step(state, batch, rng)
        losses.append(float(metrics["g_loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.step) == 5

    # EMA must differ from initial params but not explode
    ema_leaf = jax.tree.leaves(state.g_ema)[0]
    assert bool(jnp.isfinite(ema_leaf).all())

    # snapshot -> reload -> infer (the paired netG/netGH convention)
    from tgsr_tpu.checkpoints.io import load_variables, save_variables

    save_variables(str(tmp_path / "netG.msgpack"),
                   {"params": state.g_ema["netg"],
                    "batch_stats": state.g_stats["netg"]})
    save_variables(str(tmp_path / "netGH.msgpack"),
                   {"params": state.g_ema["netgh"],
                    "batch_stats": state.g_stats["netgh"]})

    netg_vars = load_variables(str(tmp_path / "netG.msgpack"))
    netgh_vars = load_variables(str(tmp_path / "netGH.msgpack"))
    pipe = SRPipeline(cfg, vocab, text_vars, netg_vars, netgh_vars)
    out = pipe(np.asarray(batch["lr"]), np.asarray(caps), np.asarray(lens))
    sr = np.asarray(out["sr"])
    assert sr.shape == (B, 64, 64, 3)
    assert np.isfinite(sr).all()
