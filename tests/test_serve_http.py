"""HTTP serving CLI (cli/serve.py): concurrent POSTs batch through
BatchingServer and return PNGs matching the direct pipeline path."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from tgsr_tpu.cli.serve import encode_caption_text, make_server
from tgsr_tpu.data.tokenizer import Vocab

from tests.test_serving import small_pipe  # noqa: F401  (fixture reuse)


@pytest.fixture
def http_srv(small_pipe):  # noqa: F811
    words = ["<end>", "a", "big", "nose", "smiling"]
    vocab = Vocab(dict(enumerate(words)), {w: i for i, w in enumerate(words)})
    httpd = make_server(small_pipe, vocab, port=0, max_batch=4,
                        max_delay_ms=10, lr_size=16)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd, vocab
    httpd.shutdown()
    httpd.batcher.close()
    t.join(timeout=10)


def _post_sr(port, img_bytes, caption):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sr", data=img_bytes,
        headers={"X-Caption": caption}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, r.read()


def test_http_sr_roundtrip_matches_direct(http_srv):
    httpd, vocab = http_srv
    port = httpd.server_address[1]
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (40, 40, 3)).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")

    caption = "a big nose"
    results = {}

    def worker(i):
        results[i] = _post_sr(port, buf.getvalue(), caption)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # direct path with the same preprocessing
    lr = np.asarray(img.resize((16, 16), Image.BICUBIC),
                    np.float32) / 127.5 - 1.0
    cap, length = encode_caption_text(caption, vocab, 18)
    direct = httpd.batcher.pipeline.sr_uint8(
        lr[None], cap[None], np.asarray([length], np.int32))[0]

    for i in range(5):
        status, body = results[i]
        assert status == 200
        out = np.asarray(Image.open(io.BytesIO(body)))
        assert out.shape == (128, 128, 3)
        np.testing.assert_array_equal(out, direct)

    # healthz reflects the served requests
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["requests"] == 5
    assert h["p50_ms"] > 0


def test_http_bad_requests(http_srv):
    httpd, _ = http_srv
    port = httpd.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sr", data=b"not an image",
        headers={"X-Caption": "a"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
    assert e.value.code == 404


def test_encode_caption_text():
    words = ["<end>", "a", "big", "nose"]
    vocab = Vocab(dict(enumerate(words)), {w: i for i, w in enumerate(words)})
    cap, n = encode_caption_text("A big UNKNOWN nose", vocab, 6)
    # tokenizer lowercases; unknown words drop (datasets.py:355-367)
    assert cap.tolist() == [1, 2, 3, 0, 0, 0] and n == 3
    cap, n = encode_caption_text("", vocab, 6)
    assert n == 1 and cap.tolist() == [0] * 6


def test_http_native_mode(http_srv):
    """?mode=native: the body IS the native-size LR; output is input*scale
    (cropped to a multiple of the scale), equal to sr_arbitrary."""
    httpd, vocab = http_srv
    port = httpd.server_address[1]
    rng = np.random.default_rng(5)
    img = Image.fromarray(
        rng.integers(0, 256, (43, 26, 3)).astype(np.uint8))  # crops to 40x24
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sr?mode=native", data=buf.getvalue(),
        headers={"X-Caption": "a big nose"}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        out = np.asarray(Image.open(io.BytesIO(r.read())))
    assert out.shape == (40 * 8, 24 * 8, 3)

    from tgsr_tpu.cli.serve import encode_caption_text
    cap, n = encode_caption_text("a big nose", vocab, 18)
    a = np.asarray(img.crop((0, 0, 24, 40)), np.float32) / 127.5 - 1.0
    direct = httpd.batcher.pipeline.sr_arbitrary(
        a[None], cap[None], np.asarray([n], np.int32), bucket=64)[0]
    np.testing.assert_array_equal(out, direct)

    # bad mode and below-one-tile image
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sr?mode=wat", data=buf.getvalue(),
        headers={"X-Caption": "a"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    tiny = io.BytesIO()
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(tiny, format="PNG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sr?mode=native", data=tiny.getvalue(),
        headers={"X-Caption": "a"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_serve_main_arg_validation():
    from tgsr_tpu.cli.serve import main

    with pytest.raises(SystemExit, match="artifact OR"):
        main(["--cfg", "x.yml"])  # incomplete non-artifact spec
    with pytest.raises(SystemExit, match="vocab_pickle"):
        main(["--aot", "/tmp/nowhere"])
    with pytest.raises(SystemExit, match="export time"):
        main(["--aot", "/tmp/nowhere", "--vocab_pickle", "v.pickle",
              "--int8"])
    # --scales (tgsr-calibrate JSON) is the --cfg/--netg boot path's knob
    with pytest.raises(SystemExit, match="scales selects int8"):
        main(["--cfg", "x.yml", "--scales", "s.json", "--int8"])
    with pytest.raises(SystemExit, match="scales selects int8"):
        main(["--artifact", "/tmp/nowhere", "--scales", "s.json"])


def test_serve_aot_vocab_mismatch_refused(small_pipe, tmp_path):  # noqa: F811
    """The AOT artifact bakes a 41-word embedding table; serving it with a
    different vocab would gather out-of-bounds with no runtime error —
    cli.serve must refuse the pickle up front."""
    import pickle

    from tgsr_tpu.cli.serve import main
    from tgsr_tpu.engine.aot import export_serving

    export_serving(small_pipe, str(tmp_path / "aot"))
    words = ["<end>", "a", "bird"]  # 3 words != the baked 41
    with open(tmp_path / "v.pickle", "wb") as f:
        pickle.dump([[], dict(enumerate(words)),
                     {w: i for i, w in enumerate(words)}], f)
    with pytest.raises(SystemExit, match="vocabulary"):
        main(["--aot", str(tmp_path / "aot"),
              "--vocab_pickle", str(tmp_path / "v.pickle")])


def test_aot_pinned_batch_serving_clamped(small_pipe, tmp_path):  # noqa: F811
    """A pinned-batch AOT artifact must clamp the serving batch plan:
    previously serve --aot with --max_batch above the pin crashed at
    warmup (planned size > pin) and 500'd any larger coalesced batch."""
    from tgsr_tpu.cli.serve import aot_max_batch
    from tgsr_tpu.engine.aot import AOTPipeline, export_serving

    export_serving(small_pipe, str(tmp_path / "aot"), batch_size=2)
    aot = AOTPipeline(str(tmp_path / "aot"))
    assert aot_max_batch(aot.meta, 32) == 2      # pinned: clamp
    assert aot_max_batch(aot.meta, 1) == 1       # below the pin: keep
    sym = {"batch": "symbolic"}
    assert aot_max_batch(sym, 32) == 32          # symbolic: pass through

    words = ["<end>", "a", "big", "nose", "smiling"]
    vocab = Vocab(dict(enumerate(words)), {w: i for i, w in enumerate(words)})
    httpd = make_server(aot, vocab, port=0,
                        max_batch=aot_max_batch(aot.meta, 32),
                        max_delay_ms=10, lr_size=16)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        httpd.batcher.warmup()  # crashed before the clamp (planned 4 > pin 2)
        port = httpd.server_address[1]
        rng = np.random.default_rng(11)
        img = Image.fromarray(
            rng.integers(0, 256, (40, 40, 3)).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        results = {}

        def worker(i):  # 3 concurrent > pin 2: must coalesce into <=2s
            results[i] = _post_sr(port, buf.getvalue(), "a big nose")

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        lr = np.asarray(img.resize((16, 16), Image.BICUBIC),
                        np.float32) / 127.5 - 1.0
        cap, n = encode_caption_text("a big nose", vocab, 18)
        direct = small_pipe.sr_uint8(lr[None], cap[None],
                                     np.asarray([n], np.int32))[0]
        for i in range(3):
            status, body = results[i]
            assert status == 200
            np.testing.assert_array_equal(
                np.asarray(Image.open(io.BytesIO(body))), direct)
    finally:
        httpd.shutdown()
        httpd.batcher.close()
        t.join(timeout=10)


def test_http_serving_from_aot_artifact(small_pipe, tmp_path):  # noqa: F811
    """cli.serve over an engine.aot artifact: the HTTP result equals the
    live pipeline's, and native mode is cleanly rejected (fixed shapes)."""
    from tgsr_tpu.engine.aot import AOTPipeline, export_serving

    export_serving(small_pipe, str(tmp_path / "aot"))
    aot = AOTPipeline(str(tmp_path / "aot"))
    assert aot.cfg.scale == 8 and aot.cfg.TREE.BASE_SIZE == 16

    words = ["<end>", "a", "big", "nose", "smiling"]
    vocab = Vocab(dict(enumerate(words)), {w: i for i, w in enumerate(words)})
    httpd = make_server(aot, vocab, port=0, max_batch=4, max_delay_ms=10,
                        lr_size=16)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        rng = np.random.default_rng(3)
        img = Image.fromarray(
            rng.integers(0, 256, (40, 40, 3)).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        status, body = _post_sr(port, buf.getvalue(), "a big nose")
        assert status == 200
        out = np.asarray(Image.open(io.BytesIO(body)))

        lr = np.asarray(img.resize((16, 16), Image.BICUBIC),
                        np.float32) / 127.5 - 1.0
        cap, n = encode_caption_text("a big nose", vocab, 18)
        direct = small_pipe.sr_uint8(lr[None], cap[None],
                                     np.asarray([n], np.int32))[0]
        np.testing.assert_array_equal(out, direct)

        # native mode: explicit 400, not a crash
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sr?mode=native", data=buf.getvalue(),
            headers={"X-Caption": "a"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400 and b"AOT" in e.value.read()
    finally:
        httpd.shutdown()
        httpd.batcher.close()
        t.join(timeout=10)
