"""Short-horizon learning proof for the DAMSM pretraining engine.

Loss-decrease runs (docs/PERF.md) show the step executes; this pins the
*system-level* claim that the contrastive objective learns what DAMSM
exists for — associating specific images with specific captions
(pretrain_DAMSM.py's purpose; losses = miscc/losses.py:25-105). On a tiny
fixed set of (augmented face crop, seeded caption) pairs, ~40 steps must
reproducibly lift DAMSM retrieval R@1 (engine.evaluator.rank_r_precision)
from chance to 1.0 and cut the train loss.

The full-scale evidence (TPU run with the frozen-Inception backbone, R@1
curve) lives in docs/PERF.md + examples/damsm_overfit_demo.py; this is
the CPU-runnable regression guard for it.
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.damsm_overfit_demo import build_pairs  # noqa: E402
from tgsr_tpu.config import Config  # noqa: E402
from tgsr_tpu.engine.damsm_trainer import DAMSMTrainer  # noqa: E402
from tgsr_tpu.engine.evaluator import rank_r_precision  # noqa: E402


@pytest.mark.slow
def test_short_horizon_damsm_retrieval_improves():
    cfg = Config()
    cfg.TRAIN.ENCODER_LR = 2e-3
    n, vocab, size = 8, 41, 64
    data = build_pairs(n, size, vocab, cfg.TEXT.WORDS_NUM)
    batch = {k: jnp.asarray(v) for k, v in data.items()}

    trainer = DAMSMTrainer(cfg, vocab_size=vocab, use_inception=False)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=size,
                               batch_size=2)
    gammas = (cfg.TRAIN.SMOOTH.GAMMA1, cfg.TRAIN.SMOOTH.GAMMA2,
              cfg.TRAIN.SMOOTH.GAMMA3)

    def r1(state):
        feat, code, words, sent = trainer.embed_step(state, batch)
        r = rank_r_precision(feat, code, words, sent, batch["cap_lens"],
                             gammas, top_k=1)
        return r["word_r@1"], r["sent_r@1"]

    w0, s0 = r1(state)
    assert w0 <= 0.5 and s0 <= 0.5, "random init should be near chance"

    rng = jax.random.PRNGKey(1)
    lr = trainer.epoch_lr(0)
    first_loss = last_loss = None
    for _ in range(45):
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, lr, sub)
        last_loss = float(metrics["loss"])
        if first_loss is None:
            first_loss = last_loss

    w1, s1 = r1(state)
    assert w1 == 1.0, f"word R@1 {w0:.2f} -> {w1:.2f}, expected 1.0"
    assert s1 == 1.0, f"sent R@1 {s0:.2f} -> {s1:.2f}, expected 1.0"
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)
