"""AOT serving artifacts (engine/aot.py): the exported StableHLO forward
— weights baked in, no model code at load time — must reproduce the live
pipeline bit-for-bit, for symbolic and pinned batch dims, float and uint8
postprocess, and the int8-quantized graph."""

import numpy as np
import pytest

from tests.test_serving import build_small_pipe
from tgsr_tpu.engine.aot import export_serving, load_serving


def _inputs(n, seed=0):
    rng = np.random.default_rng(seed)
    lr = rng.normal(0, 0.3, (n, 16, 16, 3)).astype(np.float32)
    caps = np.zeros((n, 18), np.int32)
    caps[:, :4] = rng.integers(1, 41, (n, 4))
    lens = np.full((n,), 4, np.int32)
    return lr, caps, lens


@pytest.mark.slow
def test_aot_roundtrip_symbolic_batch(tmp_path):
    pipe = build_small_pipe()
    out = export_serving(pipe, str(tmp_path / "aot"))
    call, meta = load_serving(out)
    assert meta["batch"] == "symbolic" and meta["uint8"]
    assert meta["sr_size"] == 128 and meta["lr_size"] == 16
    # the baked embedding table's vocab — cli.serve --aot refuses a
    # mismatched --vocab_pickle against this
    assert meta["n_words"] == 41

    # one artifact serves MULTIPLE batch sizes, each bit-equal to the
    # live pipeline's save-path output
    for n in (1, 2, 5):
        lr, caps, lens = _inputs(n, seed=n)
        got = np.asarray(call(lr, caps, lens))
        assert got.dtype == np.uint8 and got.shape == (n, 128, 128, 3)
        np.testing.assert_array_equal(got, pipe.sr_uint8(lr, caps, lens))


def test_aot_pinned_batch_and_float(tmp_path):
    pipe = build_small_pipe()
    out = export_serving(pipe, str(tmp_path / "aot"), batch_size=2,
                         uint8=False)
    call, meta = load_serving(out)
    assert meta["batch"] == 2 and not meta["uint8"]

    lr, caps, lens = _inputs(2)
    got = np.asarray(call(lr, caps, lens))
    ref = np.asarray(pipe(lr, caps, lens)["sr"])
    # the deserialized module recompiles and may fuse differently:
    # ulp-level float agreement is the contract (engine/aot.py docstring)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # a pinned artifact rejects other batch sizes loudly
    lr3, caps3, lens3 = _inputs(3)
    with pytest.raises(Exception):
        call(lr3, caps3, lens3)

    # ...but AOTPipeline pads smaller batches up to the pin and strips,
    # so the serving stack's planned sizes keep working
    from tgsr_tpu.engine.aot import AOTPipeline

    aot = AOTPipeline(str(tmp_path / "aot"))
    one = aot.sr_uint8(lr[:1], caps[:1], lens[:1])
    assert one.shape == (1, 128, 128, 3)
    np.testing.assert_array_equal(
        one[0], aot.sr_uint8(lr, caps, lens)[0])
    with pytest.raises(ValueError, match="pinned"):
        aot.sr_uint8(lr3, caps3, lens3)


def test_aot_lr_size_override_meta(tmp_path):
    """--lr_size overrides the traced LR geometry: the recorded sr_size
    must scale with the ACTUAL lr_size (32 -> 256 at x8), not echo the
    config's pyramid (previously always 128 here)."""
    pipe = build_small_pipe()
    out = export_serving(pipe, str(tmp_path / "aot32"), batch_size=1,
                         lr_size=32)
    call, meta = load_serving(out)
    assert meta["lr_size"] == 32 and meta["sr_size"] == 256

    rng = np.random.default_rng(4)
    lr = rng.normal(0, 0.3, (1, 32, 32, 3)).astype(np.float32)
    caps = np.zeros((1, 18), np.int32)
    caps[:, :3] = rng.integers(1, 41, (1, 3))
    lens = np.full((1,), 3, np.int32)
    got = np.asarray(call(lr, caps, lens))
    assert got.shape == (1, 256, 256, 3)  # meta matches the real output

    from tgsr_tpu.engine.aot import AOTPipeline

    assert AOTPipeline(str(tmp_path / "aot32")).cfg.scale == 8


def test_aot_multiplatform_lowering(tmp_path):
    """platforms=["cpu","tpu"]: one artifact lowered for both targets
    (no TPU needed at export time); the CPU leg still runs and matches."""
    pipe = build_small_pipe()
    out = export_serving(pipe, str(tmp_path / "aot_mp"), batch_size=1,
                         platforms=["cpu", "tpu"])
    call, meta = load_serving(out)
    assert set(meta["platforms"]) == {"cpu", "tpu"}
    lr, caps, lens = _inputs(1, seed=9)
    np.testing.assert_array_equal(np.asarray(call(lr, caps, lens)),
                                  pipe.sr_uint8(lr, caps, lens))


def test_export_aot_cli_from_bundle(tmp_path):
    """cli.export_aot consumes a save_artifact bundle and produces a
    loadable artifact with the requested knobs."""
    from tgsr_tpu.cli.export_aot import main

    pipe = build_small_pipe()
    bundle = pipe.save_artifact(str(tmp_path / "bundle"))
    main(["--artifact", bundle, "--out", str(tmp_path / "aot"),
          "--batch", "2"])

    call, meta = load_serving(str(tmp_path / "aot"))
    assert meta["batch"] == 2 and meta["uint8"]
    lr, caps, lens = _inputs(2, seed=5)
    got = np.asarray(call(lr, caps, lens))
    assert got.shape == (2, 128, 128, 3) and got.dtype == np.uint8

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="artifact OR"):
        main(["--out", str(tmp_path / "x")])


@pytest.mark.slow
def test_aot_quantized_graph(tmp_path):
    """The int8 interceptor graph exports too: the artifact reproduces the
    QUANTIZED pipeline's output, not the float one's."""
    import jax.numpy as jnp

    from tgsr_tpu.engine.inference import SRPipeline

    pipe = build_small_pipe()
    lr, caps, lens = _inputs(2, seed=7)
    scales = pipe.calibrate_quant(lr, caps, lens)
    qpipe = SRPipeline(pipe.cfg, 41, pipe.variables["text"],
                       pipe.variables["netg"], pipe.variables["netgh"],
                       compute_dtype=jnp.bfloat16, quant_scales=scales)

    out = export_serving(qpipe, str(tmp_path / "aot_q"))
    call, meta = load_serving(out)
    assert meta["quantized"] and meta["compute_dtype"] == "bfloat16"

    got = np.asarray(call(lr, caps, lens))
    ref = qpipe.sr_uint8(lr, caps, lens)
    # bf16+int8 recompile tolerance: off-by-1 uint8 pixels at round
    # boundaries only, on a small fraction (0.18% measured)
    diff = np.abs(got.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 0.01, (diff != 0).mean()
    # and the artifact tracks the QUANTIZED pipeline, not the float one:
    # far fewer mismatches vs qpipe than vs the f32 output
    vs_float = (got != pipe.sr_uint8(lr, caps, lens)).mean()
    assert vs_float > 5 * max((diff != 0).mean(), 1e-6), (
        vs_float, (diff != 0).mean())
