"""FSDP (ZeRO-3) training: params/optimizer/EMA stored sharded over 'data'.

Contracts: (1) the FSDP step computes the same math as the unsharded step
(XLA all-gathers params before use and reduce-scatters grads — storage
layout only); (2) the layout is real (big leaves genuinely sharded, the
per-device resident param bytes drop ~n_data-fold) and STABLE across
donated steps. The reference has no parallelism at all (SURVEY.md 2.11);
this is the memory-side scaling axis DP alone lacks.
"""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgsr_tpu.config import Config
from tgsr_tpu.engine.gan_trainer import GANTrainer
from tgsr_tpu.models.text_encoder import TextEncoder
from tgsr_tpu.parallel.mesh import fsdp_spec, fsdp_shardings, fsdp_state


def _setup(B=8):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16, DF_DIM=16),
    )
    vocab, T = 12, 18
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.ones((B, T), jnp.int32).at[:, 6:].set(0)
    lens = jnp.full((B,), 6, jnp.int32)
    text_vars = enc.init(k, caps, lens)
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
    return cfg, vocab, text_vars, batch


def test_fsdp_spec():
    # largest divisible dim sharded; small/indivisible leaves replicated
    assert fsdp_spec((3, 3, 64, 128), 8) == P(None, None, None, "data")
    assert fsdp_spec((3, 3, 128, 64), 8) == P(None, None, "data", None)
    assert fsdp_spec((7, 9, 11), 8) == P()          # nothing divisible
    assert fsdp_spec((256,), 8, min_elements=1024) == P()  # too small
    assert fsdp_spec((4096,), 8) == P("data")
    assert fsdp_spec((4096,), 1) == P()             # single shard


@pytest.mark.slow
def test_fsdp_step_matches_unsharded():
    cfg, vocab, text_vars, batch = _setup(B=8)
    k = jax.random.PRNGKey(0)
    step_rng = jax.random.PRNGKey(2)

    ref_trainer = GANTrainer(cfg, vocab, text_vars)
    ref_state = ref_trainer.init_state(k, batch_size=8)
    ref_new, ref_metrics, _ = ref_trainer.train_step(ref_state, batch,
                                                     step_rng)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))
    tr = GANTrainer(cfg, vocab, text_vars, mesh=mesh, fsdp=True)
    state = fsdp_state(tr.init_state(k, batch_size=8), mesh)
    sh_batch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        batch,
    )
    new, metrics, _ = tr.train_step(state, sh_batch, step_rng)

    for name in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[name]), float(ref_metrics[name]),
            rtol=2e-4, atol=2e-5, err_msg=name)
    # same Adam-near-zero tolerance rationale as the DP-equivalence test
    one_step = 2 * max(cfg.TRAIN.GENERATOR_LR, cfg.TRAIN.DISCRIMINATOR_LR)
    for ref_leaf, leaf in zip(jax.tree.leaves(ref_new.g_params),
                              jax.tree.leaves(new.g_params)):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref_leaf),
                                   rtol=2e-3, atol=one_step)
    for ref_leaf, leaf in zip(jax.tree.leaves(ref_new.d_params),
                              jax.tree.leaves(new.d_params)):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref_leaf),
                                   rtol=2e-3, atol=one_step)


@pytest.mark.slow
def test_fsdp_layout_real_and_stable():
    cfg, vocab, text_vars, batch = _setup(B=8)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))
    tr = GANTrainer(cfg, vocab, text_vars, mesh=mesh, fsdp=True)
    state = fsdp_state(tr.init_state(jax.random.PRNGKey(0), batch_size=8),
                       mesh)
    sh_batch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        batch,
    )

    def resident_param_bytes(tree):
        # bytes actually resident on device 0 for the param leaves
        total = 0
        for x in jax.tree.leaves(tree):
            for s in x.addressable_shards:
                if s.device == jax.devices()[0]:
                    total += s.data.nbytes
        return total

    repl = jax.device_put(jax.tree.map(np.asarray, state.g_params),
                          NamedSharding(mesh, P()))
    assert (resident_param_bytes(state.g_params)
            < 0.3 * resident_param_bytes(repl))

    # two donated steps: layout must hold (big leaves stay 'data'-sharded)
    s = state
    for i in range(2):
        s, metrics, _ = tr.train_step(s, sh_batch, jax.random.fold_in(
            jax.random.PRNGKey(7), i))
        # per-step sync: overlapping sharded programs intermittently
        # deadlock XLA:CPU's in-process collective rendezvous (see
        # test_distributed_checkpoint.py for the full note)
        jax.block_until_ready(s)
    assert np.isfinite(float(metrics["g_loss"]))
    n_sharded = 0
    for x in jax.tree.leaves(s.g_params):
        expect = fsdp_spec(x.shape, 8)
        # is_equivalent_to: XLA normalizes away trailing-None spec dims
        assert x.sharding.is_equivalent_to(NamedSharding(mesh, expect),
                                           x.ndim), x.shape
        if expect != P():
            n_sharded += 1
    assert n_sharded >= 10  # the layout is not vacuously replicated
    # optimizer state (the ZeRO win) is sharded too
    opt_specs = {tuple(np.shape(x)): fsdp_spec(np.shape(x), 8)
                 for x in jax.tree.leaves(s.g_opt)}
    assert any(sp != P() for sp in opt_specs.values())
    shardings = fsdp_shardings(s.g_opt, mesh)
    for x, sh in zip(jax.tree.leaves(s.g_opt), jax.tree.leaves(shardings)):
        assert x.sharding.is_equivalent_to(sh, np.ndim(x)), np.shape(x)


def test_fsdp_requires_mesh():
    cfg, vocab, text_vars, _ = _setup(B=2)
    try:
        GANTrainer(cfg, vocab, text_vars, fsdp=True)
    except ValueError as e:
        assert "mesh" in str(e)
    else:
        raise AssertionError("fsdp without mesh must raise")
