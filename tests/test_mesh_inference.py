"""Data-parallel mesh inference: sharded batch == unsharded results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.config import Config
from tgsr_tpu.engine.inference import SRPipeline
from tgsr_tpu.models.generator import GSRNetLow
from tgsr_tpu.models.generator_hf import NetGHighWeight
from tgsr_tpu.models.text_encoder import TextEncoder
from tgsr_tpu.parallel.mesh import make_mesh, shard_batch


def _build(cfg, mesh=None):
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=16),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=32),
    )
    vocab, T, B = 41, 18, 8
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.ones((B, T), jnp.int32)
    lens = jnp.full((B,), 5, jnp.int32)
    tv = enc.init(k, caps, lens)
    words, sent = enc.apply(tv, caps, lens)
    lr = jax.random.normal(k, (B, 16, 16, 3)) * 0.3
    netg = GSRNetLow(ngf=32, n_stages=3)
    gv = netg.init(k, lr, sent, words, caps == 0)
    fake, *_ = netg.apply(gv, lr, sent, words, caps == 0)
    netgh = NetGHighWeight(ngf=32, low="lr", sizes=(32, 64, 128))
    ghv = netgh.init(k, lr, fake, lr)
    pipe = SRPipeline(cfg, vocab, tv, gv, ghv, mesh=mesh)
    return pipe, np.asarray(lr), np.asarray(caps), np.asarray(lens)


@pytest.mark.slow
def test_mesh_sharded_equals_single():
    assert len(jax.devices()) >= 8, "conftest forces 8 CPU devices"
    cfg = Config()
    pipe_single, lr, caps, lens = _build(cfg, mesh=None)
    out_single = np.asarray(pipe_single(lr, caps, lens)["sr"])

    mesh = make_mesh(n_data=8)
    pipe_mesh, _, _, _ = _build(cfg, mesh=mesh)
    # same variables for apples-to-apples
    pipe_mesh.variables = pipe_single.variables
    batch = shard_batch({"lr": lr, "captions": caps, "cap_lens": lens}, mesh)
    out_mesh = np.asarray(
        pipe_mesh(batch["lr"], batch["captions"], batch["cap_lens"])["sr"])
    np.testing.assert_allclose(out_single, out_mesh, rtol=2e-4, atol=2e-4)


def test_forward_scan_under_mesh_sharding():
    """The high-throughput scan path with batch-sharded inputs must equal
    the unsharded result (DP serving on the hot path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = Config()
    pipe, lr, caps, lens = _build(cfg, mesh=None)
    M = 2
    lrM = np.broadcast_to(lr, (M,) + lr.shape).copy()
    capsM = np.broadcast_to(caps, (M,) + caps.shape).copy()
    lensM = np.broadcast_to(lens, (M,) + lens.shape).copy()
    out_ref = np.asarray(pipe.forward_scan(lrM, capsM, lensM))

    mesh = make_mesh(n_data=8)
    pipe2, _, _, _ = _build(cfg, mesh=None)
    pipe2.variables = pipe.variables
    dsh = lambda nd: NamedSharding(mesh, P(None, "data", *([None] * (nd - 2))))
    out_mesh = np.asarray(pipe2.forward_scan(
        jax.device_put(lrM, dsh(5)), jax.device_put(capsM, dsh(3)),
        jax.device_put(lensM, dsh(2))))
    np.testing.assert_array_equal(out_ref, out_mesh)


@pytest.mark.slow
def test_int8_quant_under_mesh_sharding():
    """The int8 interceptor composes with DP mesh sharding: sharded
    quantized inference == unsharded quantized inference (and differs from
    the full-precision path only by quantization noise)."""
    cfg = Config()
    pipe, lr, caps, lens = _build(cfg, mesh=None)
    scales = pipe.calibrate_quant(lr, caps, lens)
    assert scales["netg"] and scales["netgh"]

    qpipe = SRPipeline(pipe.cfg, 41, pipe.variables["text"],
                       pipe.variables["netg"], pipe.variables["netgh"],
                       quant_scales=scales)
    out_q = np.asarray(qpipe(lr, caps, lens)["sr"])

    mesh = make_mesh(n_data=8)
    qpipe_mesh = SRPipeline(pipe.cfg, 41, pipe.variables["text"],
                            pipe.variables["netg"], pipe.variables["netgh"],
                            mesh=mesh, quant_scales=scales)
    batch = shard_batch({"lr": lr, "captions": caps, "cap_lens": lens}, mesh)
    out_q_mesh = np.asarray(
        qpipe_mesh(batch["lr"], batch["captions"], batch["cap_lens"])["sr"])
    # sharded/unsharded programs tile convs differently; ulp-level f32
    # differences BEFORE round() flip occasional values by one int8 level,
    # so quantized equality is one-quant-step, not float-exact
    assert np.abs(out_q - out_q_mesh).max() < 0.02
    assert np.abs(out_q - out_q_mesh).mean() < 1e-3

    # quantization actually engaged (outputs differ from full precision)
    out_f = np.asarray(pipe(lr, caps, lens)["sr"])
    assert np.abs(out_q - out_f).max() > 1e-5
    # ... but only by quantization noise
    assert np.abs(out_q - out_f).max() < 0.15
