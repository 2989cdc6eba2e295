"""Short-horizon learning proof for the reconstructed GAN trainer.

The trainer has no reference implementation to oracle against (the GAN
training loop is ABSENT from the snapshot -- SURVEY.md 2.9); its loss
contract is pinned by tests/test_gan_losses_parity.py. This test pins the
*system-level* claim that the composite objective + fused D/G step descend
to better images: on a tiny fixed overfit set, ~30 steps must reproducibly
improve both the pixel loss and the raw generator's PSNR-Y vs GT.

The full-scale evidence (3000-step TPU run, PSNR curve rising above the
bicubic baseline) lives in docs/PERF.md + examples/overfit_demo.py; this is
the CPU-runnable regression guard for it.
"""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.overfit_demo import build_overfit_set  # noqa: E402
from tgsr_tpu.config import Config  # noqa: E402
from tgsr_tpu.engine.gan_trainer import GANTrainer  # noqa: E402
from tgsr_tpu.models.text_encoder import TextEncoder  # noqa: E402
from tgsr_tpu.ops.image import (  # noqa: E402
    denormalize_to_uint8,
    psnr_batch,
    rgb2y,
)


@pytest.mark.slow
def test_short_horizon_overfit_improves():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16, DF_DIM=16),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=4),
    )
    sizes = cfg.pyramid_sizes()
    B, T, vocab = 4, cfg.TEXT.WORDS_NUM, 41
    data = build_overfit_set(B, 8, sizes, vocab, T)
    batch = {
        "lr": jnp.asarray(data["lr"]),
        "real_pyramid": [jnp.asarray(x) for x in data["real_pyramid"]],
        "captions": jnp.asarray(data["captions"]),
        "cap_lens": jnp.asarray(data["cap_lens"]),
        "class_ids": jnp.asarray(data["class_ids"]),
    }
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    text_vars = enc.init(k, batch["captions"], batch["cap_lens"])
    trainer = GANTrainer(cfg, vocab, text_vars)
    state = trainer.init_state(k, batch_size=B)

    gt = denormalize_to_uint8(batch["real_pyramid"][-1])
    eval_key = jax.random.PRNGKey(42)

    @jax.jit
    def psnr_of(g_params, g_stats):
        words, sent = trainer.text_encoder.apply(
            text_vars, batch["captions"], batch["cap_lens"])
        mask = batch["captions"] == 0
        fake, _, _, _ = trainer.netg.apply(
            {"params": g_params["netg"], "batch_stats": g_stats["netg"]},
            batch["lr"], sent, words, mask, rng=eval_key, train=False)
        fine, _, _ = trainer.netgh.apply(
            {"params": g_params["netgh"], "batch_stats": g_stats["netgh"]},
            batch["lr"], fake, batch["lr"], train=False)
        y_sr = rgb2y(denormalize_to_uint8(fine[-1])).astype(
            jnp.float32)[..., None]
        y_gt = rgb2y(gt).astype(jnp.float32)[..., None]
        return jnp.mean(psnr_batch(y_sr, y_gt))

    psnr0 = float(psnr_of(state.g_params, state.g_stats))

    rng = jax.random.PRNGKey(1)
    first_pixel = None
    for i in range(30):
        state, metrics, rng = trainer.train_step(state, batch, rng)
        if i == 0:
            first_pixel = float(metrics["pixel"])
    last = {kk: float(v) for kk, v in metrics.items()}
    psnr1 = float(psnr_of(state.g_params, state.g_stats))

    assert np.isfinite(last["g_loss"]) and np.isfinite(last["d_loss"])
    # pixel term must drop markedly (smoke-measured: 2.76 -> ~2.3)
    assert last["pixel"] < 0.92 * first_pixel, (first_pixel, last["pixel"])
    # the raw generator's images must be measurably closer to GT
    assert psnr1 > psnr0 + 0.25, (psnr0, psnr1)


def test_overfit_set_repeat_class_ids():
    """Repeated crops must SHARE a class id: the DAMSM losses' class mask
    treats same-class pairs as non-negatives (reference losses.py:49-55);
    with per-copy ids the contrastive terms would push identical
    (image, caption) pairs apart."""
    cfg = Config()
    sizes = [16, 32, 64]
    data = build_overfit_set(8, 8, sizes, 41, cfg.TEXT.WORDS_NUM,
                             n_unique=2)
    np.testing.assert_array_equal(data["class_ids"],
                                  np.arange(8, dtype=np.int32) % 2)
    # content actually repeats with the ids
    np.testing.assert_array_equal(data["lr"][2], data["lr"][0])
    np.testing.assert_array_equal(data["captions"][3], data["captions"][1])
    # the default (all-unique) keeps distinct ids
    data_u = build_overfit_set(4, 8, sizes, 41, cfg.TEXT.WORDS_NUM)
    np.testing.assert_array_equal(data_u["class_ids"], np.arange(4))
