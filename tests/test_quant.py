"""Int8 quantized inference (engine/quant.py) — correctness tests.

The quantized conv path must be INTEGER-EXACT (int8 x int8 -> int32 on a
zero-padded grid is exact arithmetic; only the de/re-quantization rounds),
so the strongest test builds inputs/weights already on the quantization
grid, where the quantized pipeline must reproduce the float pipeline
bit-for-bit in f32. Fidelity of the real calibrated pipeline is then a
measured PSNR floor, not an assumption.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgsr_tpu.engine.quant import (
    calibrate, merge_scales, quant_conv, quant_interceptor, quantize_act,
    quantize_kernel)
from tgsr_tpu.ops.blocks import UpBlock, glu, upsample_nearest2x

RNG = np.random.RandomState(7)


def _grid_tensor(shape, step, lo=-127, hi=127):
    """A tensor exactly representable at quantization step `step`."""
    return (RNG.randint(lo, hi + 1, shape) * step).astype(np.float32)


def test_quant_conv_exact_on_grid():
    """Inputs/weights on the quant grid -> int8 conv == f32 conv exactly."""
    cin, cout = 16, 8
    x_step, w_step = 0.02, 0.005
    x = _grid_tensor((2, 10, 10, cin), x_step)
    # per-channel steps: use one step but force the absmax to hit 127*step
    w = _grid_tensor((3, 3, cin, cout), w_step)
    w[0, 0, 0, :] = 127 * w_step  # pin each channel's absmax
    y_ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_q = quant_conv(jnp.asarray(x), jnp.asarray(w), scale=127 * x_step,
                     out_dtype=jnp.float32)
    # the int8 path is exact integer arithmetic; the f32 oracle conv itself
    # reassociates, so the tolerance covers ITS rounding
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_quantize_roundtrip_and_clip():
    x = jnp.asarray(RNG.randn(4, 4).astype(np.float32)) * 3.0
    xq, step = quantize_act(x, scale=2.0)
    assert xq.dtype == jnp.int8
    # values beyond +-scale clip to +-127
    np.testing.assert_array_equal(
        np.asarray(xq)[np.asarray(x) > 2.0], 127)
    # in-range values round-trip within half a step
    inr = np.abs(np.asarray(x)) <= 2.0
    err = np.abs(np.asarray(xq, np.float32) * float(step) - np.asarray(x))
    assert err[inr].max() <= float(step) / 2 + 1e-6

    w = jnp.asarray(RNG.randn(3, 3, 4, 5).astype(np.float32))
    wq, wstep = quantize_kernel(w)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(wstep) -
                 np.asarray(w))
    assert err.max() <= np.asarray(wstep).max() / 2 + 1e-6


class _Tower(nn.Module):
    """conv -> UpBlock -> head conv, mirroring the generator tail shape."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), use_bias=False, padding="SAME",
                    name="stem")(x)
        x = UpBlock(8, use_bn=True, name="up")(x)
        return nn.Conv(3, (3, 3), use_bias=False, padding="SAME",
                       name="head")(x)


def test_calibrate_covers_all_convs_and_quant_runs():
    m = _Tower()
    x = jnp.asarray(RNG.randn(2, 8, 8, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)

    scales = calibrate(lambda a: m.apply(v, a), x, margin=1.1)
    assert set(scales) == {"stem", "up/conv", "head"}
    assert all(s > 0 for s in scales.values())

    y_ref = m.apply(v, x)
    with nn.intercept_methods(quant_interceptor(scales)):
        y_q = m.apply(v, x)
    assert y_q.shape == y_ref.shape
    # random init, tiny tensors: quantization error stays small
    rel = np.abs(np.asarray(y_q) - np.asarray(y_ref)).max() / \
        (np.abs(np.asarray(y_ref)).max() + 1e-9)
    assert rel < 0.08, rel

    # dropping a path from the scales leaves that conv unquantized
    part = {k: v2 for k, v2 in scales.items() if k != "head"}
    with nn.intercept_methods(quant_interceptor(part)):
        y_part = m.apply(v, x)
    assert np.isfinite(np.asarray(y_part)).all()


def test_upblock_interceptor_matches_float_on_grid():
    """UpBlock's quantized path (quantize BEFORE upsample) is exact when
    inputs/kernel sit on the quant grid and BN is identity."""
    blk = UpBlock(4, use_bn=True)
    x_step, w_step = 0.01, 0.004
    x = _grid_tensor((1, 6, 6, 8), x_step)
    v = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kern = _grid_tensor((3, 3, 8, 8), w_step)
    kern[0, 0, 0, :] = 127 * w_step
    v = jax.tree_util.tree_map(lambda a: a, v)
    v = {"params": {"conv": {"kernel": jnp.asarray(kern)},
                    "bn": v["params"]["bn"]},
         "batch_stats": v["batch_stats"]}

    y_ref = blk.apply(v, jnp.asarray(x))
    with nn.intercept_methods(
            quant_interceptor({"conv": 127 * x_step})):
        y_q = blk.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-6)


def test_split_glu_upblock_bitexact():
    """The selective value/gate conv split (SPLIT_GLU_INT8_CONSUMERS) is a
    pure layout change: weight quantization and the conv are both
    output-channel-separable, so split and unsplit int8 UpBlock paths must
    agree BIT-FOR-BIT (same per-element scalar ops in the same dtype)."""
    blk = UpBlock(8, use_bn=True)
    x = jnp.asarray(RNG.randn(2, 6, 6, 8).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(3), x)
    # non-trivial BN stats so the affine epilogue is exercised per half
    v = jax.tree_util.tree_map(lambda a: a, v)
    v["batch_stats"]["bn"]["mean"] = jnp.asarray(
        RNG.randn(16).astype(np.float32) * 0.1)
    v["batch_stats"]["bn"]["var"] = jnp.asarray(
        RNG.rand(16).astype(np.float32) + 0.5)

    scale = float(np.abs(np.asarray(x)).max())
    with nn.intercept_methods(quant_interceptor({"conv": scale})):
        y_plain = blk.apply(v, x)
    with nn.intercept_methods(quant_interceptor(
            {"conv": scale}, split_glu=frozenset({"conv"}))):
        y_split = blk.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_split))

    # keys not in split_glu are unaffected (inert-entry contract)
    with nn.intercept_methods(quant_interceptor(
            {"conv": scale}, split_glu=frozenset({"other/conv"}))):
        y_other = blk.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_other))


def test_fused_up_int8_matches_float():
    """The algebraic int8 upsample-conv fusion (FUSED_UP_SITES, opt-in; a
    measured e2e NEGATIVE kept as infrastructure — docs/PERF.md "Int8
    fused upsample-conv") approximates the f32 UpBlock with the same
    error magnitude as the unfused int8 path, and its pre-quantized
    depth_to_space variant produces BIT-IDENTICAL int8 codes at the
    consumer's quantization."""
    from tgsr_tpu.engine import quant as quant_mod

    blk = UpBlock(8, use_bn=True)
    x = jnp.asarray(RNG.randn(2, 6, 6, 8).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(5), x)
    v = jax.tree_util.tree_map(lambda a: a, v)
    v["batch_stats"]["bn"]["mean"] = jnp.asarray(
        RNG.randn(16).astype(np.float32) * 0.1)
    v["batch_stats"]["bn"]["var"] = jnp.asarray(
        RNG.rand(16).astype(np.float32) + 0.5)

    y_ref = blk.apply(v, x)
    scale = float(np.abs(np.asarray(x)).max())
    with nn.intercept_methods(quant_interceptor({"conv": scale})):
        y_unfused = blk.apply(v, x)
    with nn.intercept_methods(quant_interceptor(
            {"conv": scale}, fused_up=frozenset({"conv"}))):
        y_fused = blk.apply(v, x)
    assert y_fused.shape == y_ref.shape

    def rel(a):
        return np.abs(np.asarray(a, np.float32) - np.asarray(y_ref)).max() \
            / (np.abs(np.asarray(y_ref)).max() + 1e-9)

    # fused quantizes the TRANSFORMED kernel (per phase x channel): same
    # error magnitude as the unfused int8 path, not bit-equality
    assert rel(y_fused) < max(2.5 * rel(y_unfused), 0.05), \
        (rel(y_fused), rel(y_unfused))

    # pre-quantized int8 depth_to_space: consumer requantization of the
    # (dequantized) output is an exact round trip
    out_scale = float(np.abs(np.asarray(y_fused)).max()) * 1.05
    quant_mod.FUSED_UP_OUT_CONSUMER["conv"] = "consumer"
    try:
        with nn.intercept_methods(quant_interceptor(
                {"conv": scale, "consumer": out_scale},
                fused_up=frozenset({"conv"}))):
            y_fq = blk.apply(v, x)
    finally:
        del quant_mod.FUSED_UP_OUT_CONSUMER["conv"]
    q1, _ = quant_mod.quantize_act(y_fq.astype(jnp.float32), out_scale)
    q2, _ = quant_mod.quantize_act(y_fused.astype(jnp.float32), out_scale)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


def test_merge_scales():
    assert merge_scales({"a": 1.0, "b": 3.0}, {"a": 2.0, "c": 1.0}) == \
        {"a": 2.0, "b": 3.0, "c": 1.0}


@pytest.mark.slow
def test_quantized_pipeline_fidelity_real_checkpoints():
    """Full SR pipeline with the reference face_S8 weights: the int8 path
    must stay within a measured PSNR floor of the f32 path and produce a
    visually identical uint8 image distribution."""
    import os
    import pickle

    from PIL import Image

    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.engine.inference import SRPipeline

    ref = "/root/reference"
    if not os.path.exists(ref):
        pytest.skip("reference checkpoints unavailable")
    cfg = config_from_file(os.path.join(ref, "cfg/eval_faceSR_attn2.yml"))
    with open(os.path.join(ref, "data/face/testset.pickle"), "rb") as f:
        caps, ixtoword, _ = pickle.load(f)
    vocab = len(ixtoword)
    img = Image.open(os.path.join(ref, "data/face/000155.png")).convert("RGB")
    lr = np.asarray(img.resize((32, 32), Image.BICUBIC),
                    np.float32)[None] / 127.5 - 1.0
    T = cfg.TEXT.WORDS_NUM
    tok = np.zeros((1, T), np.int32)
    L = min(len(caps[0]), T)
    tok[0, :L] = caps[0][:L]
    lens = np.asarray([L], np.int32)

    pipe = SRPipeline.from_reference_checkpoints(
        cfg, vocab, os.path.join(ref, "Checkpoint/face_S8/netG_epoch_7.pth"))
    sr_f32 = pipe.sr_uint8(lr, tok, lens)

    scales = pipe.calibrate_quant(lr, tok, lens, margin=1.1)
    assert scales["netg"] and scales["netgh"]
    qpipe = SRPipeline(cfg, vocab, pipe.variables["text"],
                       pipe.variables["netg"], pipe.variables["netgh"],
                       quant_scales=scales)
    sr_q = qpipe.sr_uint8(lr, tok, lens)

    mse = np.mean((sr_q.astype(np.float64) - sr_f32.astype(np.float64)) ** 2)
    psnr = 20 * np.log10(255.0 / np.sqrt(max(mse, 1e-12)))
    # measured ~40+ dB; 30 dB is the regression floor (visually identical)
    assert psnr > 30.0, f"int8-vs-f32 PSNR {psnr:.2f} dB"


def test_split_res_glu_matches_unsplit():
    """SPLIT_RES_GLU_SITES: the whole-block value/gate split for
    ResBlock/_ResidualSeq is the same int8 arithmetic as the per-conv
    path; only the BN evaluation order differs (folded f32 affine in the
    split handler vs flax eval BN), so the two agree to f32 roundoff.
    The identity skip (ResBlock) / no-skip (_ResidualSeq) semantics and
    the inert-entry contract are pinned exactly."""
    from tgsr_tpu.models.generator_hf import _ResidualSeq
    from tgsr_tpu.ops.blocks import ResBlock

    for cls, kw in ((ResBlock, dict(features=8)),
                    (ResBlock, dict(features=8, use_bn=False)),
                    (_ResidualSeq, dict(ngf=8))):
        blk = cls(**kw)
        x = jnp.asarray(RNG.randn(2, 6, 6, 8).astype(np.float32))
        v = blk.init(jax.random.PRNGKey(5), x)
        if "batch_stats" in v:
            for bn in v["batch_stats"]:
                v["batch_stats"][bn]["mean"] = jnp.asarray(
                    RNG.randn(*v["batch_stats"][bn]["mean"].shape)
                    .astype(np.float32) * 0.1)
                v["batch_stats"][bn]["var"] = jnp.asarray(
                    RNG.rand(*v["batch_stats"][bn]["var"].shape)
                    .astype(np.float32) + 0.5)
        scales = {"conv1": float(np.abs(np.asarray(x)).max())}
        # conv2's input scale: run the unsplit path once to calibrate
        with nn.intercept_methods(quant_interceptor(scales)):
            mid = blk.apply(v, x)
        scales["conv2"] = float(np.abs(np.asarray(mid)).max()) + 1.0

        with nn.intercept_methods(quant_interceptor(scales)):
            y_plain = blk.apply(v, x)
        with nn.intercept_methods(quant_interceptor(
                scales, split_res=frozenset({""}))):
            y_split = blk.apply(v, x)
        np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_plain),
                                   rtol=2e-5, atol=2e-5)

        # sites not opted in are bit-identical to the per-conv path
        with nn.intercept_methods(quant_interceptor(
                scales, split_res=frozenset({"not/this/block"}))):
            y_other = blk.apply(v, x)
        np.testing.assert_array_equal(np.asarray(y_other),
                                      np.asarray(y_plain))

        # train=True bypasses the split handler (and quantization stays
        # per-conv semantics untouched by split_res)
        out_t1 = blk.apply(v, x, True, mutable=["batch_stats"])
        with nn.intercept_methods(quant_interceptor(
                {}, split_res=frozenset({""}))):
            out_t2 = blk.apply(v, x, True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(out_t1[0]),
                                      np.asarray(out_t2[0]))


def test_check_scales_keys_and_fingerprint():
    """check_scales refuses artifacts whose keys match no conv in the
    loaded family and artifacts fingerprinted on different weights
    (ADVICE r4 #5 + VERDICT r4 weak #4: no silent mis-application)."""
    from tgsr_tpu.engine.quant import (
        check_scales, conv_kernel_sites, split_scales_meta,
        weights_fingerprint)

    kg = RNG.randn(3, 3, 4, 8).astype(np.float32)
    netg_vars = {"params": {"h_net1": {"conv1": {"kernel": kg}},
                            "dense": {"kernel": np.zeros((4, 4),
                                                         np.float32)}}}
    netgh_vars = {"params": {"convin": {"conv": {"kernel": kg + 1.0}}}}

    # site enumeration: only 4-D kernels, path-joined names
    assert set(conv_kernel_sites(netg_vars["params"])) == {"h_net1/conv1"}

    ok = {"netg": {"h_net1/conv1": 1.0}, "netgh": {"convin/conv": 1.0}}
    check_scales(ok, netg_vars, netgh_vars)  # passes

    with pytest.raises(ValueError, match="different family"):
        check_scales({"netg": {"bogus/conv": 1.0}}, netg_vars, netgh_vars)
    with pytest.raises(ValueError, match="no conv"):
        check_scales({"netg": {"h_net1/conv1": 1.0, "stale/conv": 2.0}},
                     netg_vars, netgh_vars)
    with pytest.raises(ValueError, match="unknown scales group"):
        check_scales({"vgg": {"conv": 1.0}}, netg_vars, netgh_vars)

    # fingerprint: matching passes, perturbed weights refuse
    fp = weights_fingerprint(netg_vars, netgh_vars)
    check_scales(ok, netg_vars, netgh_vars,
                 meta={"weights_fingerprint": fp})
    other = {"params": {"h_net1": {"conv1": {"kernel": kg + 0.5}},
                        "dense": netg_vars["params"]["dense"]}}
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        check_scales(ok, other, netgh_vars,
                     meta={"weights_fingerprint": fp})
    # non-kernel leaves (dense 2-D) do NOT contribute to the fingerprint
    netg_b = {"params": {"h_net1": netg_vars["params"]["h_net1"],
                         "dense": {"kernel": np.ones((4, 4), np.float32)}}}
    assert weights_fingerprint(netg_b, netgh_vars) == fp

    # split_scales_meta separates provenance without mutating groups
    with_meta = {**ok, "_meta": {"weights_fingerprint": fp}}
    groups, meta = split_scales_meta(with_meta)
    assert groups == ok and meta["weights_fingerprint"] == fp


def test_shipped_face_scales_bound_to_reference_checkpoint():
    """The shipped face_S8 artifact carries a fingerprint that matches the
    reference checkpoints (SRPipeline construction verifies it), and a
    perturbed checkpoint refuses the same artifact."""
    import os

    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.engine.inference import SRPipeline
    from tgsr_tpu.engine.quant import face_s8_scales

    ref = "/root/reference"
    if not os.path.exists(ref):
        pytest.skip("reference checkpoints unavailable")
    cfg = config_from_file(os.path.join(ref, "cfg/eval_faceSR_attn2.yml"))
    scales = face_s8_scales()
    assert scales["_meta"]["weights_fingerprint"]
    pipe = SRPipeline.from_reference_checkpoints(
        cfg, 41, os.path.join(ref, "Checkpoint/face_S8/netG_epoch_7.pth"),
        quant_scales=scales)
    assert pipe.quant_meta["weights_fingerprint"] == \
        scales["_meta"]["weights_fingerprint"]
    assert "_meta" not in pipe.quant_scales

    tampered = jax.tree.map(lambda x: x, pipe.variables["netg"])
    k = tampered["params"]["h_net1"]["im2f_conv"]["kernel"]
    tampered["params"]["h_net1"]["im2f_conv"]["kernel"] = k + 1e-3
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        SRPipeline(cfg, 41, pipe.variables["text"], tampered,
                   pipe.variables["netgh"], quant_scales=scales)
