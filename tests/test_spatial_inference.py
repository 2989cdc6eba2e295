"""Spatial partitioning (SP): image rows sharded over the mesh == unsharded.

DP shards the batch axis and scales throughput; `SRPipeline.sr_spatial`
shards the image HEIGHT axis so ONE image's latency scales across chips —
XLA's SPMD partitioner inserts the halo exchanges for the 3x3 convs.
The reference has no multi-device path at all (SURVEY.md 2.11).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.config import Config
from tgsr_tpu.engine.inference import SRPipeline
from tgsr_tpu.models.generator import GSRNetLow
from tgsr_tpu.models.generator_hf import NetGHighWeight
from tgsr_tpu.models.text_encoder import TextEncoder
from tgsr_tpu.parallel.mesh import make_mesh


def _build(cfg, B=1):
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=16),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=32),
    )
    vocab, T = 41, 18
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
    pipe = SRPipeline(cfg, vocab, tv, gv, ghv)
    return pipe, np.asarray(lr), np.asarray(caps), np.asarray(lens)


def test_spatial_sharded_equals_single():
    """B=1, 16 input rows over 8 devices (2 rows/shard, 1-row conv halos):
    the SP result must match the unsharded forward."""
    assert len(jax.devices()) >= 8, "conftest forces 8 CPU devices"
    cfg = Config()
    pipe, lr, caps, lens = _build(cfg, B=1)
    out_single = np.asarray(pipe(lr, caps, lens)["sr"])

    mesh = make_mesh(n_data=8)
    out_sp = np.asarray(pipe.sr_spatial(lr, caps, lens, mesh=mesh)["sr"])
    assert out_sp.shape == out_single.shape
    np.testing.assert_allclose(out_single, out_sp, rtol=2e-4, atol=2e-4)


def test_spatial_batch_and_pyramid():
    """SP composes with a small batch; every pyramid level matches."""
    cfg = Config()
    pipe, lr, caps, lens = _build(cfg, B=2)
    ref = pipe(lr, caps, lens)
    mesh = make_mesh(n_data=8)
    sp = pipe.sr_spatial(lr, caps, lens, mesh=mesh)
    for a, b in zip(ref["pyramid"], sp["pyramid"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_spatial_int8_quant():
    """The int8 interceptor composes with row sharding. Sharded/unsharded
    programs tile convs differently, so (as in the DP test) quantized
    equality is one-quant-step, not float-exact."""
    cfg = Config()
    pipe, lr, caps, lens = _build(cfg, B=1)
    scales = pipe.calibrate_quant(lr, caps, lens)
    qpipe = SRPipeline(pipe.cfg, 41, pipe.variables["text"],
                       pipe.variables["netg"], pipe.variables["netgh"],
                       quant_scales=scales)
    out_q = np.asarray(qpipe(lr, caps, lens)["sr"])
    mesh = make_mesh(n_data=8)
    out_q_sp = np.asarray(qpipe.sr_spatial(lr, caps, lens, mesh=mesh)["sr"])
    assert np.abs(out_q - out_q_sp).max() < 0.02
    assert np.abs(out_q - out_q_sp).mean() < 1e-3


def test_spatial_requires_mesh():
    cfg = Config()
    pipe, lr, caps, lens = _build(cfg, B=1)
    with pytest.raises(ValueError, match="mesh"):
        pipe.sr_spatial(lr, caps, lens)
