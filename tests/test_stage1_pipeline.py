"""EVAL.STAGE1 ablation path through SRPipeline (= trainer_objective.py:56
stage1 flag -> G_SR_NET_low_stage1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.config import Config
from tgsr_tpu.engine.inference import SRPipeline
from tgsr_tpu.models.generator import GSRNetLowStage1
from tgsr_tpu.models.generator_hf import NetGHighWeight
from tgsr_tpu.models.text_encoder import TextEncoder


def test_stage1_pipeline_runs():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=16),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=32),
        EVAL=dataclasses.replace(cfg.EVAL, STAGE1=True),
    )
    vocab, B, T = 41, 2, 18
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.ones((B, T), jnp.int32)
    lens = jnp.full((B,), 6, jnp.int32)
    tv = enc.init(k, caps, lens)
    words, sent = enc.apply(tv, caps, lens)
    lr = jax.random.normal(k, (B, 16, 16, 3)) * 0.3

    netg = GSRNetLowStage1(ngf=32)
    gv = netg.init(k, lr, sent, words, caps == 0)
    fake, atts, mu, logvar = netg.apply(gv, lr, sent, words, caps == 0)
    assert [f.shape[1] for f in fake] == [32, 64, 128]
    # stage1 attn maps are nearest-upsampled copies (model.py:120,127)
    assert [a.shape[-1] for a in atts] == [16, 32, 64]

    netgh = NetGHighWeight(ngf=32, low="lr", sizes=(32, 64, 128))
    ghv = netgh.init(k, lr, fake, lr)
    pipe = SRPipeline(cfg, vocab, tv, gv, ghv)
    assert isinstance(pipe.netg, GSRNetLowStage1)
    out = pipe(np.asarray(lr), np.asarray(caps), np.asarray(lens))
    assert out["sr"].shape == (B, 128, 128, 3)
    assert np.isfinite(np.asarray(out["sr"])).all()


def test_forward_scan_uint8_ingress():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16),
    )
    from tgsr_tpu.models.generator import GSRNetLow
    from tgsr_tpu.models.generator_hf import NetGHighWeight

    vocab, B, M, T = 12, 2, 2, 18
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.ones((B, T), jnp.int32)
    lens = jnp.full((B,), 4, jnp.int32)
    tv = enc.init(k, caps, lens)
    words, sent = enc.apply(tv, caps, lens)
    lr_f = jax.random.uniform(k, (B, 8, 8, 3), jnp.float32, -1, 1)
    netg = GSRNetLow(ngf=16, n_stages=3)
    gv = netg.init(k, lr_f, sent, words, caps == 0)
    fake, *_ = netg.apply(gv, lr_f, sent, words, caps == 0)
    netgh = NetGHighWeight(ngf=16, low="lr", sizes=(16, 32, 64))
    ghv = netgh.init(k, lr_f, fake, lr_f)
    pipe = SRPipeline(cfg, vocab, tv, gv, ghv)

    lr_u8 = np.round((np.asarray(lr_f) + 1) * 127.5).astype(np.uint8)
    lr_f_rt = lr_u8.astype(np.float32) / 127.5 - 1.0  # quantized roundtrip
    capsM = np.broadcast_to(np.asarray(caps), (M, B, T)).copy()
    lensM = np.broadcast_to(np.asarray(lens), (M, B)).copy()

    out_u8 = np.asarray(pipe.forward_scan(
        np.broadcast_to(lr_u8, (M, B, 8, 8, 3)).copy(), capsM, lensM))
    pipe2 = SRPipeline(cfg, vocab, tv, gv, ghv)
    out_f = np.asarray(pipe2.forward_scan(
        np.broadcast_to(lr_f_rt, (M, B, 8, 8, 3)).copy(), capsM, lensM))
    np.testing.assert_array_equal(out_u8, out_f)
