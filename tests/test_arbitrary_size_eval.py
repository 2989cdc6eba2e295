"""Arbitrary-size eval path (= get_imgsexampletest, datasets.py:200-278,
coco scale-4 variant at :1548): dynamic input geometry under XLA's
static-shape compilation model.

Checks:
  * load_arbitrary_eval_image crops to scale multiples and downsamples
    (scale 4 and 8 -- the coco and face protocols)
  * SRPipeline.sr_arbitrary produces exactly (h*scale, w*scale) output for
    non-square, non-256 inputs
  * bucketed mode bounds the compile count (distinct padded shapes), native
    mode compiles per distinct shape
  * bucketed output agrees with native-shape output away from the padded
    border (word-pixel attention is per-pixel, so only the conv halo leaks)
"""

import dataclasses
import io

import jax
import numpy as np
import pytest
from PIL import Image

from tgsr_tpu.config import Config
from tgsr_tpu.data.datasets import load_arbitrary_eval_image
from tgsr_tpu.engine.inference import SRPipeline
from tgsr_tpu.models.generator import GSRNetLow
from tgsr_tpu.models.generator_hf import NetGHighWeight
from tgsr_tpu.models.text_encoder import TextEncoder


@pytest.fixture(scope="module")
def pipe():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=32),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16),
    )
    vocab, T = 12, cfg.TEXT.WORDS_NUM
    import jax.numpy as jnp

    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.ones((1, T), jnp.int32).at[:, 5:].set(0)
    lens = jnp.full((1,), 5, jnp.int32)
    text_vars = enc.init(k, caps, lens)
    lr = jnp.zeros((1, 32, 32, 3))
    netg = GSRNetLow(ngf=cfg.GAN.GF_DIM, n_stages=cfg.n_stages)
    words, sent = enc.apply(text_vars, caps, lens)
    gv = netg.init(k, lr, sent, words, caps == 0)
    fake = netg.apply(gv, lr, sent, words, caps == 0)[0]
    netgh = NetGHighWeight(ngf=cfg.GAN.GF_DIM, low="lr")
    ghv = netgh.init(k, lr, fake, lr)
    p = SRPipeline(cfg, vocab, text_vars, gv, ghv)
    return p, np.asarray(caps), np.asarray(lens)


def test_loader_scale_semantics():
    img = Image.fromarray(
        (np.random.default_rng(0).random((218, 178, 3)) * 255).astype(np.uint8))
    # coco scale-4 protocol
    lr4, gt4 = load_arbitrary_eval_image(img, scale=4)
    assert gt4.shape == (216, 176, 3)  # cropped down to multiples of 4
    assert lr4.shape == (1, 54, 44, 3)
    # face scale-8 protocol
    lr8, gt8 = load_arbitrary_eval_image(img, scale=8)
    assert gt8.shape == (216, 176, 3)
    assert lr8.shape == (1, 27, 22, 3)
    assert lr4.min() >= -1.0 and lr4.max() <= 1.0
    # buffer path too
    buf = io.BytesIO()
    img.save(buf, "PNG")
    buf.seek(0)
    lr_f, _ = load_arbitrary_eval_image(buf, scale=4)
    np.testing.assert_allclose(lr_f, lr4)


def test_sr_arbitrary_native_shapes(pipe):
    p, caps, lens = pipe
    rng = np.random.default_rng(1)
    for h, w in [(36, 52), (40, 40)]:
        lr = (rng.random((1, h, w, 3), np.float32) * 2 - 1) * 0.5
        sr = p.sr_arbitrary(lr, caps, lens, bucket=None)
        assert sr.shape == (1, h * 8, w * 8, 3)
        assert sr.dtype == np.uint8


def test_sr_arbitrary_bucketed_compile_count(pipe):
    p, caps, lens = pipe
    rng = np.random.default_rng(2)
    base = p._forward._cache_size()
    # 4 distinct sizes, all bucketing to (48, 64) or (64, 64)
    sizes = [(37, 53), (45, 59), (33, 49), (50, 56)]
    for h, w in sizes:
        lr = (rng.random((1, h, w, 3), np.float32) * 2 - 1) * 0.5
        sr = p.sr_arbitrary(lr, caps, lens, bucket=16)
        assert sr.shape == (1, h * 8, w * 8, 3)
    grown = p._forward._cache_size() - base
    assert grown == 2, f"expected 2 bucketed compiles, got {grown}"


def test_sr_arbitrary_bucket_interior_agreement(pipe):
    p, caps, lens = pipe
    rng = np.random.default_rng(3)
    h, w = 40, 56
    lr = (rng.random((1, h, w, 3), np.float32) * 2 - 1) * 0.5
    native = p.sr_arbitrary(lr, caps, lens, bucket=None).astype(np.int16)
    bucketed = p.sr_arbitrary(lr, caps, lens, bucket=16).astype(np.int16)
    assert native.shape == bucketed.shape
    # padding is bottom/right only; exclude the conv halo there
    m = 24 * 8  # 24 LR px of halo, in SR units
    a = native[:, : h * 8 - m, : w * 8 - m]
    b = bucketed[:, : h * 8 - m, : w * 8 - m]
    assert np.abs(a - b).max() <= 1, (
        f"interior mismatch up to {np.abs(a - b).max()} uint8 levels")


def test_sr_batched_memory_planned(pipe):
    """sr_batched: any N decomposes into scan microbatches; rows must match
    the direct forward bit-for-bit (same ops, same weights)."""
    p, caps, lens = pipe
    rng = np.random.default_rng(4)
    n = 10
    lr = (rng.random((n, 32, 32, 3), np.float32) * 2 - 1) * 0.5
    capsN = np.repeat(caps, n, axis=0)
    lensN = np.repeat(lens, n, axis=0)
    out = p.sr_batched(lr, capsN, lensN, microbatch=4)  # m=3, tail pad 2
    assert out.shape == (n, 256, 256, 3) and out.dtype == np.uint8
    direct = p.sr_uint8(lr[:3], capsN[:3], lensN[:3])
    np.testing.assert_array_equal(out[:3], direct)

    # degenerate N=0: an empty result, not a ZeroDivisionError in the
    # microbatch plan
    empty = p.sr_batched(lr[:0], capsN[:0], lensN[:0])
    assert empty.shape == (0, 256, 256, 3) and empty.dtype == np.uint8


def test_bench_forward_tracks_pipeline_dtype(pipe):
    """bench_forward is plan_microbatch's memory model: it must run at the
    pipeline's own compute dtype (a hardcoded bf16 would make the planner
    bisect ~half the activation bytes of an f32 pipeline's real forward)."""
    import jax

    p, caps, lens = pipe
    lr = np.zeros((1, 32, 32, 3), np.float32)
    out32 = jax.eval_shape(p.bench_forward, p.variables, lr, caps, lens)
    assert out32.dtype == np.float32  # f32 pipeline -> f32 forward
    import jax.numpy as jnp

    from tgsr_tpu.engine.inference import SRPipeline

    pb = SRPipeline(p.cfg, p.text_encoder.vocab_size, p.variables["text"],
                    p.variables["netg"], p.variables["netgh"],
                    compute_dtype=jnp.bfloat16)
    outb = jax.eval_shape(pb.bench_forward, pb.variables, lr, caps, lens)
    assert outb.dtype == jnp.bfloat16
