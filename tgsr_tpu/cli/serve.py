"""HTTP serving entry point: text-guided SR as a network service.

The reference has no serving story at all (its eval driver writes PNGs to
disk, trainer_objective.py:55-165). This CLI turns the framework into a
deployable service: an HTTP front door feeding engine.serving's
BatchingServer, so concurrent clients are coalesced into MXU-filling
batches on the device.

  python -m tgsr_tpu.cli.serve --cfg cfg/eval_faceSR_attn2.yml \
      --netg <Checkpoint/face_S8/netG_epoch_7.pth> \
      --vocab_pickle <data/face/testset.pickle> [--port 8718] [--int8]

Protocol (deliberately dependency-free — stdlib http.server + PIL):
  POST /sr     body = any image (PNG/JPEG); it is bicubic-resized to the
               model's LR size. Caption via the `X-Caption` header (or
               `?caption=`). Response: image/png, the SR result.
  POST /sr?mode=native
               arbitrary-geometry SR: the body IS the low-res input at
               its native size (cropped down to a multiple of the scale,
               = get_imgsexampletest, datasets.py:200-233); runs through
               SRPipeline.sr_arbitrary with bucket=64 to bound compile
               counts. Not batched across requests (shapes vary);
               native requests serialize against each other.
  GET /healthz JSON: server stats + latency percentiles.

The HTTP layer is ThreadingHTTPServer: each request thread blocks on its
Future while the collector thread owns the device for the batched path —
the batching behavior under concurrency is exactly tests/test_serving.py's
(native-mode dispatches are serialized against EACH OTHER by their own
lock and may legitimately overlap collector batches: jax dispatch is
thread-safe, the two paths share no python state).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


def aot_max_batch(meta, requested: int) -> int:
    """A pinned-batch AOT export (export_serving batch_size=N) can only
    run batches <= N: clamp the serving batch plan so warmup and coalesced
    batches never exceed the pin (AOTPipeline pads short batches up to it).
    Symbolic-batch artifacts pass `requested` through."""
    pin = meta.get("batch")
    if isinstance(pin, int) and requested > pin:
        return pin
    return requested


def encode_caption_text(text: str, vocab, words_num: int):
    """Caption string -> ([T] int32 ids, length) with the training-side
    tokenizer + encoder (RegexpTokenizer semantics datasets.py:355-360;
    encode_caption keeps the reference's long-caption random sorted
    subsample, datasets.py:459-477)."""
    from tgsr_tpu.data.tokenizer import encode_caption, tokenize_caption

    ids = vocab.encode_tokens(tokenize_caption(text))
    cap, n = encode_caption(ids, words_num)
    return cap.astype(np.int32), n


def make_server(pipeline, vocab, host: str = "127.0.0.1", port: int = 8718,
                max_batch: int = 32, max_delay_ms: float = 5.0,
                lr_size: Optional[int] = None) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server around a BatchingServer. Returns
    the ThreadingHTTPServer; call .serve_forever() (blocking) or drive it
    from a thread (tests). server.batcher is the BatchingServer."""
    from PIL import Image

    from tgsr_tpu.engine.serving import BatchingServer

    T = pipeline.cfg.TEXT.WORDS_NUM
    size = lr_size or pipeline.cfg.TREE.BASE_SIZE
    scale = pipeline.cfg.scale
    batcher = BatchingServer(pipeline, max_batch=max_batch,
                             max_delay_ms=max_delay_ms,
                             lr_shape=(size, size, 3))
    native_lock = threading.Lock()  # one native dispatch at a time

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            st = batcher.stats_snapshot()  # locked copy: the collector
            self._json(200, {               # mutates concurrently
                "status": "ok",
                "requests": st["requests"],
                "batches": st["batches"],
                "batch_hist": {str(k): v
                               for k, v in st["batch_hist"].items()},
                **batcher.latency_percentiles(),
            })

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/sr":
                return self._json(404, {"error": "unknown path"})
            caption = self.headers.get("X-Caption", "")
            if not caption:
                q = parse_qs(url.query).get("caption", [])
                caption = q[0] if q else ""
            try:
                n = int(self.headers.get("Content-Length", "0"))
                img = Image.open(io.BytesIO(self.rfile.read(n))).convert(
                    "RGB")
            except Exception as e:
                return self._json(400, {"error": f"bad image: {e}"})
            cap, length = encode_caption_text(caption, vocab, T)
            mode = parse_qs(url.query).get("mode", ["fixed"])[0]
            try:
                if mode == "native":
                    if not hasattr(pipeline, "sr_arbitrary"):
                        return self._json(400, {
                            "error": "native mode unavailable: this server "
                                     "runs an AOT artifact with fixed "
                                     "shapes (export_serving)"})
                    # crop down to a multiple of the scale (the reference
                    # example-test contract, datasets.py:206-210)
                    w0, h0 = (img.width // scale) * scale, \
                        (img.height // scale) * scale
                    if w0 < scale or h0 < scale:
                        return self._json(400, {
                            "error": f"image below one {scale}px tile"})
                    a = np.asarray(img.crop((0, 0, w0, h0)),
                                   np.float32) / 127.5 - 1.0
                    with native_lock:
                        sr = pipeline.sr_arbitrary(
                            a[None], np.asarray(cap)[None],
                            np.asarray([length], np.int32), bucket=64)[0]
                elif mode == "fixed":
                    lr = np.asarray(img.resize((size, size), Image.BICUBIC),
                                    np.float32) / 127.5 - 1.0
                    sr = batcher.submit(lr, cap, length).result(timeout=600)
                else:
                    return self._json(400, {"error": f"bad mode {mode!r}"})
            except Exception as e:
                return self._json(500, {"error": str(e)})
            buf = io.BytesIO()
            Image.fromarray(sr).save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer((host, port), Handler)
    httpd.batcher = batcher  # exposed for tests / shutdown
    return httpd


def main(argv=None):
    parser = argparse.ArgumentParser(description="TGSR-TPU SR service")
    parser.add_argument("--artifact", default="",
                        help="serving-artifact dir (SRPipeline."
                             "save_artifact) — replaces --cfg/--netg/"
                             "--vocab_pickle")
    parser.add_argument("--aot", default="",
                        help="AOT artifact dir (engine.aot.export_serving): "
                             "serve the baked StableHLO forward — no model "
                             "code or checkpoints load; precision/quant are "
                             "fixed at export, so --int8/--f32 are invalid "
                             "here. Needs --vocab_pickle. Native mode is "
                             "disabled (fixed shapes)")
    parser.add_argument("--cfg", dest="cfg_file", default="")
    parser.add_argument("--netg", default="",
                        help="reference netG_epoch_*.pth (netGH resolved "
                             "alongside)")
    parser.add_argument("--vocab_pickle", default="")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8718)
    parser.add_argument("--max_batch", type=int, default=32)
    parser.add_argument("--max_delay_ms", type=float, default=5.0)
    parser.add_argument("--int8", action="store_true",
                        help="int8 serving with the shipped face_S8 scales")
    parser.add_argument("--scales", default="",
                        help="int8 serving with a calibrated scales JSON "
                             "(tgsr-calibrate output) — for checkpoints "
                             "the shipped face_S8 scales don't describe")
    parser.add_argument("--f32", action="store_true",
                        help="full f32 (default bf16)")
    parser.add_argument("--text_encoder", default="",
                        help="trained text-encoder weights (.pth or "
                             ".msgpack) for the --cfg/--netg boot path")
    parser.add_argument("--seeded-text", action="store_true",
                        help="force the seeded-init text encoder instead "
                             "of resolving cfg NET_E / the shipped "
                             "trained NET_E")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from tgsr_tpu.cli.eval_rank import load_vocab
    from tgsr_tpu.config import config_from_file, enable_compile_cache

    enable_compile_cache()
    from tgsr_tpu.engine.inference import SRPipeline

    if args.scales and (args.int8 or args.f32 or args.artifact or args.aot):
        raise SystemExit("--scales selects int8 for the --cfg/--netg boot "
                         "path; drop --int8/--f32 (and use the bundle's "
                         "own scales with --artifact/--aot)")
    if args.aot:
        if args.int8 or args.f32:
            raise SystemExit("--aot artifacts bake precision/quantization "
                             "at export time; drop --int8/--f32")
        if not args.vocab_pickle:
            raise SystemExit("--aot needs --vocab_pickle (caption encoding "
                             "stays host-side)")
        from tgsr_tpu.engine.aot import AOTPipeline

        pipe = AOTPipeline(args.aot)
        vocab = load_vocab(args.vocab_pickle)
        # the embedding table is baked into the StableHLO: ids from a
        # mismatched vocab gather out-of-bounds with NO runtime error
        # (XLA clamps), silently producing garbage — refuse up front
        n_words = pipe.meta.get("n_words")
        if n_words is not None and vocab.n_words != n_words:
            raise SystemExit(
                f"--vocab_pickle has {vocab.n_words} words but the AOT "
                f"artifact was exported with a {n_words}-word vocabulary; "
                f"serve the pickle the model was trained with")
        clamped = aot_max_batch(pipe.meta, args.max_batch)
        if clamped != args.max_batch:
            print(f"[serve] artifact pins batch {clamped}: clamping "
                  f"--max_batch {args.max_batch} -> {clamped}", flush=True)
            args.max_batch = clamped
    elif args.artifact:
        pipe, vocab = SRPipeline.load_artifact(
            args.artifact,
            compute_dtype=jnp.float32 if args.f32 else None,
            # --int8 = require bundled scales; --f32 = full precision
            use_quant=True if args.int8 else False if args.f32 else None)
        if vocab is None:
            if not args.vocab_pickle:
                raise SystemExit("artifact has no vocab.json: pass "
                                 "--vocab_pickle")
            vocab = load_vocab(args.vocab_pickle)
    else:
        if not (args.cfg_file and args.netg and args.vocab_pickle):
            raise SystemExit("pass --artifact OR --cfg + --netg + "
                             "--vocab_pickle")
        cfg = config_from_file(args.cfg_file)
        vocab = load_vocab(args.vocab_pickle)
        quant = None
        if args.scales:
            with open(args.scales) as f:
                quant = json.load(f)
        elif args.int8:
            from tgsr_tpu.engine.quant import face_s8_scales

            quant = face_s8_scales()
        # NET_E resolution: flag > cfg NET_E > shipped trained NET_E >
        # seeded (same contract as cli.test)
        from tgsr_tpu.checkpoints.shipped import resolve_net_e

        net_e_path, net_e_src = resolve_net_e(
            cfg, args.text_encoder, vocab.n_words,
            seeded=args.seeded_text)
        print(f"[serve] text encoder: {net_e_src}", flush=True)
        pipe = SRPipeline.from_reference_checkpoints(
            cfg, vocab.n_words, args.netg,
            text_encoder_path=net_e_path,
            compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            quant_scales=quant)
    httpd = make_server(pipe, vocab, host=args.host, port=args.port,
                        max_batch=args.max_batch,
                        max_delay_ms=args.max_delay_ms)
    print("warming up (compiling every planned batch size)...", flush=True)
    httpd.batcher.warmup()
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(max_batch {args.max_batch}, delay {args.max_delay_ms} ms, "
          f"{'aot' if args.aot else 'int8' if getattr(pipe, 'quant_scales', None) else 'f32' if args.f32 else 'bf16'})",
          flush=True)
    from tgsr_tpu.utils.preemption import graceful_sigterm

    try:
        # SIGTERM (container stop, TPU-VM preemption) drains like Ctrl-C:
        # stop accepting, then batcher.close() finishes in-flight batches
        with graceful_sigterm():
            httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        httpd.batcher.close()


if __name__ == "__main__":
    main()
