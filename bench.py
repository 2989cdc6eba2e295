#!/usr/bin/env python
"""Benchmark: images/sec/chip for the full x8 face-SR inference pipeline
(bi-LSTM text encode -> attentive low-freq generator -> high-freq refiner,
32x32 -> 256x256) with the reference face_S8 checkpoints.

Baseline: the unmodified PyTorch reference runs this pipeline at ~2.7
images/sec at batch 1 (BASELINE.md, measured on this machine's CPU; the
repo publishes no numbers). Prints ONE JSON line.

Methodology notes (this axon TPU stack):
  * jax.block_until_ready does NOT reliably synchronize here, and the
    host<->device tunnel moves ~19 MB/s -- so timings use a scalar checksum
    computed IN-GRAPH and fetched per iteration (forces full execution,
    4-byte transfer), with device-resident inputs (a production TPU host
    feeds inputs over PCIe/ICI, not this dev tunnel).
  * a fresh `salt` operand per iteration defeats any result caching.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 2.7


def _init_watchdog(seconds: float = 300.0):
    """Backend init on the axon stack hangs FOREVER when the tunnel/relay
    is down (observed round 3: make_c_api_client blocks with no listener
    on the relay port). A healthy init takes seconds; if jax.devices()
    hasn't returned within `seconds`, print a diagnosable failure line
    and exit instead of hanging the driver. Returns a cancel() fn."""
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "BENCH FAILED: jax backend init timed out "
                          f"after {seconds:.0f}s (axon tunnel down?)",
                "value": 0, "unit": "img/s", "vs_baseline": 0,
            }), flush=True)
            os._exit(17)

    threading.Thread(target=watch, daemon=True).start()
    return done.set


def _deadline_watchdog(best_box, seconds: float = 2100.0):
    """The remote-compile service on this stack occasionally wedges
    mid-compile (observed round 3 and round 5: ~18 min with zero host CPU
    progress). If the full bench hasn't finished within `seconds`, print
    the best result collected so far (or a diagnosable failure line) and
    exit 0 so the driver records SOMETHING instead of timing out with an
    empty artifact. Returns a cancel() fn."""
    import threading

    done = threading.Event()

    def watch():
        if done.wait(seconds):
            return
        if best_box.get("value"):
            line = dict(best_box)
            line["metric"] = ("PARTIAL (bench deadline %ds hit — remote-"
                              "compile wedge?): " % seconds) + line["metric"]
            print(json.dumps(line), flush=True)
            os._exit(0)  # a real measured number — usable artifact
        print(json.dumps({
            "metric": f"BENCH FAILED: no result within {seconds:.0f}s "
                      "(remote-compile service wedged?)",
            "value": 0, "unit": "img/s", "vs_baseline": 0,
        }), flush=True)
        os._exit(18)

    threading.Thread(target=watch, daemon=True).start()
    return done.set


def main():
    import pickle

    cancel_watchdog = _init_watchdog()
    import jax

    dev = jax.devices()[0]
    cancel_watchdog()
    best_box = {}
    cancel_deadline = _deadline_watchdog(
        best_box, float(os.environ.get("TGSR_BENCH_DEADLINE", 2100)))

    import jax.numpy as jnp
    from PIL import Image

    from tgsr_tpu.config import config_from_file, default_config
    from tgsr_tpu.engine.inference import SRPipeline

    print(f"[bench] device: {dev}", file=sys.stderr)

    ref = "/root/reference"
    cfg_path = os.path.join(ref, "cfg/eval_faceSR_attn2.yml")
    if os.path.exists(cfg_path):
        cfg = config_from_file(cfg_path)
    else:
        import dataclasses

        cfg = default_config()
        cfg = dataclasses.replace(
            cfg, TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=32),
            GAN=dataclasses.replace(cfg.GAN, GF_DIM=32))

    # --- real data ---
    with open(os.path.join(ref, "data/face/testset.pickle"), "rb") as f:
        caps, ixtoword, wordtoix = pickle.load(f)
    vocab = len(ixtoword)
    img = Image.open(os.path.join(ref, "data/face/000155.png")).convert("RGB")
    lr1 = np.asarray(img.resize((32, 32), Image.BICUBIC), np.float32) / 127.5 - 1.0

    T = cfg.TEXT.WORDS_NUM
    n_caps = len(caps)
    tok = np.zeros((n_caps, T), np.int32)
    lens = np.zeros((n_caps,), np.int32)
    for i, c in enumerate(caps):
        L = min(len(c), T)
        tok[i, :L] = c[:L]
        lens[i] = L

    # serve with the shipped trained NET_E when present (the product
    # configuration: cli.test/serve auto-load it; the shipped int8 scales
    # are calibrated under it) — seeded fallback keeps the bench running
    # on a checkout without the artifact
    from tgsr_tpu.checkpoints.shipped import shipped_net_e

    net_e = shipped_net_e(vocab)
    print(f"[bench] text encoder: "
          f"{'shipped trained NET_E' if net_e else 'seeded init'}",
          file=sys.stderr)

    pipe = SRPipeline.from_reference_checkpoints(
        cfg, vocab,
        os.path.join(ref, "Checkpoint/face_S8/netG_epoch_7.pth"),
        text_encoder_path=net_e,
        compute_dtype=jnp.bfloat16,
    )

    # honest-timing probes live on the pipeline (shared with the example
    # probes): jitted scan + single-batch checksum fns, quant-aware
    scan_checksum, one_checksum = pipe.checksum_fns()

    rng = np.random.default_rng(0)
    best, best_cfg = 0.0, ""
    # round-2 sweep (docs/PERF.md): longer scans amortize the ~170 ms
    # per-dispatch overhead; 768 is the per-step memory sweet spot
    for B, M in ((768, 16), (768, 64)):
        reps = int(np.ceil(B * M / n_caps))
        tokB = jax.device_put(np.tile(tok, (reps, 1))[: B * M].reshape(M, B, T))
        lensB = jax.device_put(np.tile(lens, reps)[: B * M].reshape(M, B))
        lrB = jax.device_put(
            (np.broadcast_to(lr1, (M, B, 32, 32, 3))
             + rng.normal(0, 0.01, (M, B, 32, 32, 3))).astype(np.float32))
        try:
            float(scan_checksum(pipe.variables, lrB, tokB, lensB, 0.0))
            iters = 5
            t0 = time.perf_counter()
            for i in range(iters):
                float(scan_checksum(pipe.variables, lrB, tokB, lensB,
                                    float(i + 1)))
            dt = time.perf_counter() - t0
            ips = B * M * iters / dt
            print(f"[bench] B={B} x M={M}: {ips:.0f} img/s "
                  f"({dt/iters*1e3:.0f} ms/iter, forced sync)",
                  file=sys.stderr)
            if ips > best:
                best, best_cfg = ips, f"batch {B}x{M} microbatch-scan"
                best_box.update({
                    "metric": "images/sec/chip at x8 face SR "
                              f"({best_cfg}, bf16, forced-sync)",
                    "value": round(best, 1), "unit": "img/s",
                    "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 1)})
        except Exception as e:
            print(f"[bench] B={B}xM={M} failed: {type(e).__name__}",
                  file=sys.stderr)
            break

    # p50 single-image latency (checksum-forced)
    lr_d = jax.device_put(lr1[None])
    tok_d = jax.device_put(tok[:1])
    len_d = jax.device_put(lens[:1])
    float(one_checksum(pipe.variables, lr_d, tok_d, len_d, 0.0))
    lats = []
    for i in range(20):
        t0 = time.perf_counter()
        float(one_checksum(pipe.variables, lr_d, tok_d, len_d, float(i + 1)))
        lats.append(time.perf_counter() - t0)
    p50 = float(np.median(lats)) * 1e3
    print(f"[bench] p50 single-image latency: {p50:.2f} ms (forced sync; "
          "includes per-dispatch tunnel overhead on this dev stack)",
          file=sys.stderr)

    # decompose: chain K dependent forwards in ONE dispatch so
    #   t(K) = dispatch_overhead + K * device_time_per_image
    # (examples/latency_probe.py method). The raw p50 above is dominated
    # by the axon tunnel's ~180 ms per-dispatch overhead; the device
    # number is what a production host would see (docs/PERF.md).
    p50_device_ms = p50_overhead_ms = None
    try:
        import functools

        sr_one = pipe.bench_forward

        @functools.partial(jax.jit, static_argnums=(4,))
        def chain(variables, lr_b, cap_b, len_b, k, salt0):
            def body(carry, _):
                sr = sr_one(variables, lr_b + carry * 1e-12, cap_b, len_b)
                return carry + jnp.sum(sr.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, salt0, None, length=k)
            return c

        def timed(k, iters=9):
            float(chain(pipe.variables, lr_d, tok_d, len_d, k, 0.0))
            ts = []
            for i in range(iters):
                t0 = time.perf_counter()
                float(chain(pipe.variables, lr_d, tok_d, len_d, k,
                            float(i + 1)))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t1, t32 = timed(1), timed(32)
        p50_device_ms = (t32 - t1) / 31 * 1e3
        p50_overhead_ms = t1 * 1e3 - p50_device_ms
        print(f"[bench] latency decomposition (chained-K): device "
              f"{p50_device_ms:.2f} ms/image + dispatch overhead "
              f"{p50_overhead_ms:.1f} ms", file=sys.stderr)
    except Exception as e:  # decomposition must never break the bench
        print(f"[bench] latency decomposition failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    # bf16-vs-f32 fidelity guard on one image (full output fetch, small)
    pipe_f32 = SRPipeline.from_reference_checkpoints(
        cfg, vocab,
        os.path.join(ref, "Checkpoint/face_S8/netG_epoch_7.pth"),
        text_encoder_path=net_e,
        compute_dtype=jnp.float32,
    )
    o16 = np.asarray(pipe(lr1[None], tok[:1], lens[:1])["sr"])
    o32 = np.asarray(pipe_f32(lr1[None], tok[:1], lens[:1])["sr"])
    d16 = np.abs(
        np.clip((o16 + 1) * 127.5, 0, 255) - np.clip((o32 + 1) * 127.5, 0, 255))
    rmse = float(np.sqrt((d16**2).mean()))
    psnr_vs_f32 = 20 * np.log10(255.0 / max(rmse, 1e-6))
    print(f"[bench] bf16 vs f32: rmse={rmse:.3f}/255, psnr={psnr_vs_f32:.1f} dB",
          file=sys.stderr)

    # --- int8 quantized serving mode (engine/quant.py, shipped calibration)
    # headline only if it both beats bf16 AND stays >= 35 dB of the f32
    # output (measured protocol delta at 40.8 dB PSNR-Y: +0.046 dB on the
    # e2e PSNR-Y-vs-GT metric -- within the 0.1 dB north-star bar)
    dtype_used = "bf16"
    try:
        from tgsr_tpu.engine.quant import face_s8_scales

        qpipe = SRPipeline(
            cfg, vocab, pipe.variables["text"], pipe.variables["netg"],
            pipe.variables["netgh"], compute_dtype=jnp.bfloat16,
            quant_scales=face_s8_scales())
        scan_q, _ = qpipe.checksum_fns()
        B, M = 768, 64
        reps = int(np.ceil(B * M / n_caps))
        tokB = jax.device_put(np.tile(tok, (reps, 1))[: B * M].reshape(M, B, T))
        lensB = jax.device_put(np.tile(lens, reps)[: B * M].reshape(M, B))
        lrB = jax.device_put(
            (np.broadcast_to(lr1, (M, B, 32, 32, 3))
             + rng.normal(0, 0.01, (M, B, 32, 32, 3))).astype(np.float32))
        float(scan_q(pipe.variables, lrB, tokB, lensB, 0.0))
        iters = 3
        t0 = time.perf_counter()
        for i in range(iters):
            float(scan_q(pipe.variables, lrB, tokB, lensB, float(i + 1)))
        ips_q = B * M * iters / (time.perf_counter() - t0)

        oq = np.asarray(qpipe(lr1[None], tok[:1], lens[:1])["sr"])
        dq = np.abs(np.clip((oq + 1) * 127.5, 0, 255)
                    - np.clip((o32 + 1) * 127.5, 0, 255))
        psnr_q = 20 * np.log10(255.0 / max(float(np.sqrt((dq**2).mean())),
                                           1e-6))
        print(f"[bench] int8 B={B} x M={M}: {ips_q:.0f} img/s; "
              f"vs f32: {psnr_q:.1f} dB", file=sys.stderr)
        if ips_q > best and psnr_q >= 35.0:
            best = ips_q
            best_cfg = f"batch {B}x{M} microbatch-scan"
            dtype_used = ("int8 convs, %.0f dB vs f32, e2e PSNR-Y +0.05 dB"
                          % psnr_q)
            best_box.update({
                "metric": "images/sec/chip at x8 face SR "
                          f"({best_cfg}, {dtype_used}, forced-sync)",
                "value": round(best, 1), "unit": "img/s",
                "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 1)})
    except Exception as e:  # quantized path must never break the bench
        print(f"[bench] int8 path failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    cancel_deadline()
    line = {
        "metric": "images/sec/chip at x8 face SR (%s, %s, forced-sync)"
                  % (best_cfg, dtype_used),
        "value": round(best, 1),
        "unit": "img/s",
        "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 1),
        # single-image latency, decomposed (chained-K method): the raw
        # p50 on this dev stack is dominated by per-dispatch tunnel
        # overhead; 'latency_device_ms' is the production-host number
        "latency_p50_raw_ms": round(p50, 2),
    }
    if p50_device_ms is not None:
        line["latency_device_ms"] = round(p50_device_ms, 3)
        line["latency_dispatch_overhead_ms"] = round(p50_overhead_ms, 1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
