"""Distributed training LEARNS, not just "the step is equal for one step"
(VERDICT r4 #4).

Part 1: the FSDP+DP trajectory (8-device CPU mesh, ZeRO-3 storage) matches
the single-device trajectory metric-for-metric over the first K steps —
sharding is a layout choice, not a math change, even ACCUMULATED over
steps (optimizer state, BN stats, EMA all thread through).

Part 2: continuing under the sharded configuration with the run-4 pixel
recipe (adv x0 — the overfit study's unambiguous-descent configuration,
docs/PERF.md), the pixel loss keeps falling and the generator's PSNR-Y
vs GT improves through the run, evaluated on the sharded state directly.
"""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

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
from tgsr_tpu.parallel.mesh import fsdp_state, make_mesh, shard_batch  # noqa: E402


def _setup(pixel_only: bool):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16, DF_DIM=16),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=8),
    )
    sizes = cfg.pyramid_sizes()
    B, T, vocab = 8, cfg.TEXT.WORDS_NUM, 41
    data = build_overfit_set(B, 8, sizes, vocab, T, n_unique=4)
    host_batch = {
        "lr": data["lr"],
        "real_pyramid": list(data["real_pyramid"]),
        "captions": data["captions"],
        "cap_lens": data["cap_lens"],
        "class_ids": data["class_ids"],
    }
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    text_vars = enc.init(k, jnp.asarray(data["captions"]),
                         jnp.asarray(data["cap_lens"]))
    weights = {"adv": 0.0} if pixel_only else None
    return cfg, vocab, text_vars, host_batch, weights, k


def _psnr_fn(trainer, text_vars, batch):
    gt = denormalize_to_uint8(jnp.asarray(batch["real_pyramid"][-1]))
    eval_key = jax.random.PRNGKey(42)

    @jax.jit
    def psnr_of(g_params, g_stats):
        words, sent = trainer.text_encoder.apply(
            text_vars, jnp.asarray(batch["captions"]),
            jnp.asarray(batch["cap_lens"]))
        mask = jnp.asarray(batch["captions"]) == 0
        fake, _, _, _ = trainer.netg.apply(
            {"params": g_params["netg"], "batch_stats": g_stats["netg"]},
            jnp.asarray(batch["lr"]), sent, words, mask, rng=eval_key,
            train=False)
        fine, _, _ = trainer.netgh.apply(
            {"params": g_params["netgh"], "batch_stats": g_stats["netgh"]},
            jnp.asarray(batch["lr"]), fake, jnp.asarray(batch["lr"]),
            train=False)
        y_sr = rgb2y(denormalize_to_uint8(fine[-1])).astype(
            jnp.float32)[..., None]
        y_gt = rgb2y(gt).astype(jnp.float32)[..., None]
        return jnp.mean(psnr_batch(y_sr, y_gt))

    return psnr_of


@pytest.mark.slow
def test_fsdp_dp_trajectory_matches_and_learns():
    cfg, vocab, text_vars, host_batch, weights, k = _setup(pixel_only=True)
    K_EQ, K_LEARN, EVERY = 8, 48, 12

    # --- single-device trajectory (first K_EQ steps) ---
    t1 = GANTrainer(cfg, vocab, text_vars, loss_weights=weights)
    s1 = t1.init_state(k, batch_size=8)
    b1 = jax.tree.map(jnp.asarray, host_batch)
    rng = jax.random.PRNGKey(1)
    traj1 = []
    for _ in range(K_EQ):
        s1, m, rng = t1.train_step(s1, b1, rng)
        traj1.append({kk: float(v) for kk, v in m.items()})

    # --- FSDP+DP trajectory on the 8-device mesh ---
    mesh = make_mesh(n_data=8, n_model=1)
    t2 = GANTrainer(cfg, vocab, text_vars, mesh=mesh, fsdp=True,
                    loss_weights=weights)
    s2 = fsdp_state(t2.init_state(k, batch_size=8), mesh)
    b2 = shard_batch(host_batch, mesh)
    rng = jax.device_put(jax.random.PRNGKey(1), NamedSharding(mesh, P()))
    traj2 = []
    for _ in range(K_EQ):
        s2, m, rng = t2.train_step(s2, b2, rng)
        traj2.append({kk: float(v) for kk, v in m.items()})

    # trajectories equal step by step (accumulated optimizer/BN/EMA state
    # included — step k's metrics depend on all k-1 prior updates)
    for i, (a, b) in enumerate(zip(traj1, traj2)):
        assert set(a) == set(b)
        for kk in a:
            tol = 5e-3 * max(1.0, abs(a[kk]))
            assert abs(a[kk] - b[kk]) <= tol, (i, kk, a[kk], b[kk])

    # --- keep training SHARDED: pixel falls, PSNR-Y rises ---
    psnr_of = _psnr_fn(t2, text_vars, host_batch)
    psnr_start = float(psnr_of(s2.g_params, s2.g_stats))
    checkpoints = [psnr_start]
    pixels = [traj2[-1]["pixel"]]
    for i in range(K_LEARN):
        s2, m, rng = t2.train_step(s2, b2, rng)
        if (i + 1) % EVERY == 0:
            checkpoints.append(float(psnr_of(s2.g_params, s2.g_stats)))
            pixels.append(float(m["pixel"]))

    assert all(np.isfinite(checkpoints)), checkpoints
    # near-monotone improvement: each eval >= previous - small slack, and
    # the run ends clearly better than it started
    for prev, cur in zip(checkpoints, checkpoints[1:]):
        assert cur >= prev - 0.15, checkpoints
    assert checkpoints[-1] > checkpoints[0] + 0.4, checkpoints
    assert pixels[-1] < 0.9 * pixels[0], pixels
    # the state stayed in the FSDP layout through the whole run
    from tgsr_tpu.parallel.mesh import fsdp_spec

    n_sharded = 0
    for x in jax.tree.leaves(s2.g_params):
        spec = fsdp_spec(x.shape, 8)
        assert x.sharding.is_equivalent_to(NamedSharding(mesh, spec),
                                           x.ndim), x.shape
        n_sharded += spec != P()
    assert n_sharded > 0
