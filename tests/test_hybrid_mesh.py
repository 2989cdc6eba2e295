"""Hybrid DCN x ICI mesh (parallel.mesh.make_hybrid_mesh): a simulated
two-slice 2x4 topology on the CPU x8 backend.

Multi-slice semantics under test: DP spans ('dcn', 'data') so the batch
shards across slices AND intra-slice chips; 'model' (TP) stays strictly
intra-slice; sharded compute equals unsharded compute (GSPMD partitions
one global program — the DCN axis only changes which links the gradient
all-reduce crosses, never the math). Completes SURVEY.md 2.11's "DCN for
multi-slice later" line (VERDICT r4 #8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tgsr_tpu.parallel.mesh import (
    hybrid_data_spec, hybrid_shard_batch, make_hybrid_mesh)


def test_hybrid_mesh_topology():
    mesh = make_hybrid_mesh(n_slices=2, n_model=1)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.devices.shape == (2, 4, 1)
    # every device appears exactly once
    ids = sorted(d.id for d in mesh.devices.flatten())
    assert ids == sorted(d.id for d in jax.devices())

    # a TP variant: 'model' pairs live INSIDE one slice (never cross DCN)
    mesh_tp = make_hybrid_mesh(n_slices=2, n_data=2, n_model=2)
    assert mesh_tp.devices.shape == (2, 2, 2)
    slice_sets = [set(d.id for d in mesh_tp.devices[s].flatten())
                  for s in range(2)]
    assert slice_sets[0].isdisjoint(slice_sets[1])
    for s in range(2):
        for row in mesh_tp.devices[s]:
            assert all(d.id in slice_sets[s] for d in row)

    with pytest.raises(ValueError, match="needs"):
        make_hybrid_mesh(n_slices=4, n_data=4, n_model=1)


def test_hybrid_data_spec():
    assert hybrid_data_spec(1) == P(("dcn", "data"))
    assert hybrid_data_spec(4) == P(("dcn", "data"), None, None, None)


def test_batch_axes_and_shards():
    from tgsr_tpu.parallel.mesh import (batch_axes, batch_shards,
                                        batch_spec, make_mesh)

    flat = make_mesh(n_data=4, n_model=2)
    assert batch_axes(flat) == ("data",)
    assert batch_spec(flat, 4) == P("data", None, None, None)  # plain name
    assert batch_shards(flat) == 4

    hybrid = make_hybrid_mesh(n_slices=2, n_data=2, n_model=2)
    assert batch_axes(hybrid) == ("dcn", "data")
    assert batch_spec(hybrid, 2) == P(("dcn", "data"), None)
    assert batch_shards(hybrid) == 4  # 2 slices x 2 intra-slice


def test_hybrid_dp_equals_unsharded():
    """A conv+reduce 'training-like' computation sharded over the hybrid
    DP axes equals the unsharded run; grads psum across slices."""
    mesh = make_hybrid_mesh(n_slices=2, n_model=1)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (16, 8, 8, 3)).astype(np.float32)
    y = rng.normal(0, 1, (16, 8, 8, 4)).astype(np.float32)
    w = rng.normal(0, 0.1, (3, 3, 3, 4)).astype(np.float32)

    def loss(w, x, y):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.mean((out - y) ** 2)

    grad = jax.jit(jax.value_and_grad(loss))
    l_ref, g_ref = grad(w, x, y)

    batch = hybrid_shard_batch({"x": x, "y": y, "n": np.int32(16)}, mesh)
    assert batch["x"].sharding.spec == hybrid_data_spec(4)
    assert batch["n"].sharding.is_fully_replicated  # scalar leaf replicates
    w_repl = jax.device_put(w, NamedSharding(mesh, P()))
    l_sh, g_sh = grad(w_repl, batch["x"], batch["y"])
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_hybrid_trainer_step_matches_flat_mesh():
    """One GANTrainer DP step on the hybrid ('dcn','data','model') mesh
    equals the same step on the flat ('data','model') mesh: the slice
    split is a pure communication-topology choice."""
    import dataclasses

    from tgsr_tpu.config import Config
    from tgsr_tpu.engine.gan_trainer import GANTrainer
    from tgsr_tpu.models.text_encoder import TextEncoder
    from tgsr_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, METHOD="S8",
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=1))
    B, T, vocab = 8, cfg.TEXT.WORDS_NUM, 23
    rng = np.random.default_rng(1)
    host_batch = {
        "lr": rng.normal(0, 0.1, (B, 8, 8, 3)).astype(np.float32),
        "real_pyramid": [
            rng.normal(0, 0.1, (B, s, s, 3)).astype(np.float32)
            for s in cfg.pyramid_sizes()],
        "captions": np.ones((B, T), np.int32),
        "cap_lens": np.full((B,), T, np.int32),
        "class_ids": np.arange(B, dtype=np.int32),
    }
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    text_vars = enc.init(k, jnp.ones((2, T), jnp.int32),
                         jnp.full((2,), T, jnp.int32))

    def one_step(mesh, batch):
        trainer = GANTrainer(cfg, vocab, text_vars, mesh=mesh)
        state = trainer.init_state(k, batch_size=2)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        _, metrics, _ = trainer.train_step(
            state, batch, jax.device_put(jax.random.PRNGKey(2),
                                         NamedSharding(mesh, P())))
        return {k2: float(v) for k2, v in metrics.items()}

    flat = make_mesh(n_data=8, n_model=1)
    m_flat = one_step(flat, shard_batch(host_batch, flat))

    hybrid = make_hybrid_mesh(n_slices=2, n_model=1)
    m_hyb = one_step(hybrid, hybrid_shard_batch(host_batch, hybrid))

    assert set(m_flat) == set(m_hyb)
    for name in m_flat:
        np.testing.assert_allclose(
            m_hyb[name], m_flat[name], rtol=2e-5, atol=1e-6,
            err_msg=name)
