"""DAMSMTrainer DP (mesh) correctness: the sharded train/eval/embed steps
must compute the same values as the single-device steps — the DAMSM losses
compare every caption against every image (B x B score matrices,
miscc/losses.py:21-136), so under DP the step is only correct if XLA's
inserted collectives reproduce the GLOBAL-batch semantics exactly.
"""

import dataclasses

import pytest

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgsr_tpu.config import Config
from tgsr_tpu.engine.damsm_trainer import DAMSMTrainer


def _setup(B=8, S=64):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=1, BASE_SIZE=S))
    vocab, T = 12, cfg.TEXT.WORDS_NUM
    rng = jax.random.PRNGKey(3)
    caps = jnp.ones((B, T), jnp.int32).at[:, 6:].set(0)
    batch = {
        "imgs": 0.3 * jax.random.normal(rng, (B, S, S, 3)),
        "captions": caps,
        "cap_lens": jnp.full((B,), 6, jnp.int32),
        "class_ids": jnp.arange(B, dtype=jnp.int32),
    }
    return cfg, vocab, batch


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))


@pytest.mark.slow
def test_damsm_sharded_step_matches_single_device():
    cfg, vocab, batch = _setup()
    k = jax.random.PRNGKey(0)
    step_rng = jax.random.PRNGKey(2)

    ref = DAMSMTrainer(cfg, vocab, use_inception=False)
    ref_state = ref.init_state(k, image_size=64, batch_size=8)
    ref_new, ref_metrics = ref.train_step(ref_state, batch, 2e-4, step_rng)

    mesh = _mesh()
    sh = DAMSMTrainer(cfg, vocab, use_inception=False, mesh=mesh)
    sh_state = sh.init_state(k, image_size=64, batch_size=8)
    sh_state = jax.device_put(sh_state, NamedSharding(mesh, P()))
    sh_batch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        batch)
    sh_new, sh_metrics = sh.train_step(sh_state, sh_batch, 2e-4, step_rng)

    for name in ref_metrics:
        np.testing.assert_allclose(
            float(sh_metrics[name]), float(ref_metrics[name]),
            rtol=2e-4, atol=2e-5, err_msg=name)
    # text params after one step agree (Adam near-zero-grad caveat as in
    # test_gan_trainer_sharding.py: metrics are the tight functional check)
    one_step = 2 * 2e-4
    for a, b in zip(jax.tree.leaves(ref_new.text_params),
                    jax.tree.leaves(sh_new.text_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=one_step)


def test_damsm_sharded_eval_and_embed_match():
    cfg, vocab, batch = _setup()
    k = jax.random.PRNGKey(0)

    ref = DAMSMTrainer(cfg, vocab, use_inception=False)
    state = ref.init_state(k, image_size=64, batch_size=8)
    ref_metrics, ref_attn = ref.eval_step(state, batch)
    ref_emb = ref.embed_step(state, batch)

    mesh = _mesh()
    sh = DAMSMTrainer(cfg, vocab, use_inception=False, mesh=mesh)
    sh_state = jax.device_put(state, NamedSharding(mesh, P()))
    sh_batch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        batch)
    sh_metrics, sh_attn = sh.eval_step(sh_state, sh_batch)
    sh_emb = sh.embed_step(sh_state, sh_batch)

    for name in ref_metrics:
        np.testing.assert_allclose(
            float(sh_metrics[name]), float(ref_metrics[name]),
            rtol=2e-4, atol=2e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(sh_attn), np.asarray(ref_attn),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(ref_emb, sh_emb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_damsm_indivisible_host_batch_raises_early():
    """A host batch whose leading dim does not divide the mesh data axis
    must fail at batching time with an actionable message (the reference
    trains with drop_last=True, pretrain_DAMSM.py:248), not deep inside
    jax.device_put."""
    import pytest

    cfg, vocab, _ = _setup()
    sh = DAMSMTrainer(cfg, vocab, use_inception=False, mesh=_mesh())
    bad = {
        "hr": np.zeros((6, 64, 64, 3), np.uint8),
        "captions": np.zeros((6, cfg.TEXT.WORDS_NUM), np.int32),
        "cap_lens": np.full((6,), 3, np.int32),
        "class_ids": np.arange(6, dtype=np.int32),
    }
    with pytest.raises(ValueError, match="drop_last"):
        sh._device_batch(bad, None)
