"""Serving-artifact bundle (SRPipeline.save_artifact/load_artifact):
single-directory deployment round-trip."""

import numpy as np
import pytest

from tests.test_serving import build_small_pipe
from tgsr_tpu.data.tokenizer import Vocab
from tgsr_tpu.engine.inference import SRPipeline


def test_artifact_roundtrip_bitexact(tmp_path):
    pipe = build_small_pipe()
    words = ["<end>", "a", "big", "nose"]
    vocab = Vocab(dict(enumerate(words)), {w: i for i, w in enumerate(words)})
    out_dir = pipe.save_artifact(str(tmp_path / "bundle"), vocab=vocab)

    pipe2, vocab2 = SRPipeline.load_artifact(out_dir)
    assert vocab2.wordtoix == vocab.wordtoix
    assert pipe2.cfg == pipe.cfg
    assert pipe2.compute_dtype == pipe.compute_dtype

    rng = np.random.default_rng(0)
    lr = rng.normal(0, 0.3, (2, 16, 16, 3)).astype(np.float32)
    caps = np.zeros((2, 18), np.int32)
    caps[:, :3] = [[1, 2, 3], [3, 2, 1]]
    lens = np.asarray([3, 3], np.int32)
    np.testing.assert_array_equal(pipe.sr_uint8(lr, caps, lens),
                                  pipe2.sr_uint8(lr, caps, lens))


@pytest.mark.slow
def test_artifact_quant_and_overrides(tmp_path):
    import jax.numpy as jnp

    pipe = build_small_pipe()
    # calibrate a real int8 config so the scales ride the bundle
    rng = np.random.default_rng(1)
    lr = rng.normal(0, 0.3, (2, 16, 16, 3)).astype(np.float32)
    caps = np.ones((2, 18), np.int32)
    lens = np.full((2,), 4, np.int32)
    scales = pipe.calibrate_quant(lr, caps, lens)
    qpipe = SRPipeline(pipe.cfg, 41, pipe.variables["text"],
                       pipe.variables["netg"], pipe.variables["netgh"],
                       compute_dtype=jnp.bfloat16, quant_scales=scales)
    out_dir = qpipe.save_artifact(str(tmp_path / "q"))

    loaded, vocab = SRPipeline.load_artifact(out_dir)
    assert vocab is None  # not bundled
    assert loaded.quant_scales and loaded.compute_dtype == jnp.bfloat16
    np.testing.assert_array_equal(qpipe.sr_uint8(lr, caps, lens),
                                  loaded.sr_uint8(lr, caps, lens))

    # dtype override at load
    f32, _ = SRPipeline.load_artifact(out_dir, compute_dtype=jnp.float32)
    assert f32.compute_dtype == jnp.float32


def test_serve_cli_consumes_artifact(tmp_path):
    """The HTTP CLI boots from --artifact alone (no .pth / YAML /
    pickle)."""
    import io
    import threading
    import urllib.request

    from PIL import Image

    from tgsr_tpu.cli.serve import make_server
    from tgsr_tpu.engine.inference import SRPipeline as SP

    pipe = build_small_pipe()
    words = ["<end>", "a", "big", "nose"]
    vocab = Vocab(dict(enumerate(words)), {w: i for i, w in enumerate(words)})
    out_dir = pipe.save_artifact(str(tmp_path / "bundle"), vocab=vocab)
    pipe2, vocab2 = SP.load_artifact(out_dir)

    httpd = make_server(pipe2, vocab2, port=0, max_batch=2, max_delay_ms=5,
                        lr_size=16)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        img = Image.fromarray(np.full((40, 40, 3), 128, np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/sr",
            data=buf.getvalue(), headers={"X-Caption": "a big nose"},
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            out = np.asarray(Image.open(io.BytesIO(r.read())))
        assert out.shape == (128, 128, 3)
    finally:
        httpd.shutdown()
        httpd.batcher.close()
        t.join(timeout=10)


def test_load_artifact_use_quant_contract(tmp_path):
    pipe = build_small_pipe()
    out = pipe.save_artifact(str(tmp_path / "plain"))
    # requiring quant from a scale-less bundle is an error
    with pytest.raises(ValueError, match="quant_scales"):
        SRPipeline.load_artifact(out, use_quant=True)
    p, _ = SRPipeline.load_artifact(out, use_quant=False)
    assert not p.quant_scales


def test_eval_cli_artifact_drops_return_attn(tmp_path):
    """cli.test saves serving bundles without return_attn (attention maps
    are wasted compute on the serving hot path)."""
    import json

    pipe = build_small_pipe()
    # mimic the eval CLI's attention-enabled pipeline
    attn_pipe = SRPipeline(pipe.cfg, 41, pipe.variables["text"],
                           pipe.variables["netg"], pipe.variables["netgh"],
                           return_attn=True)
    out = attn_pipe.save_artifact(str(tmp_path / "b"), return_attn=False)
    assert json.load(open(f"{out}/meta.json"))["return_attn"] is False
    loaded, _ = SRPipeline.load_artifact(out)
    assert loaded.return_attn is False
