#!/usr/bin/env python
"""Benchmark: images/sec/chip for the full x8 face-SR inference pipeline
(bi-LSTM text encode -> attentive low-freq generator -> high-freq refiner,
32x32 -> 256x256) with the reference face_S8 checkpoints.

Baseline: the unmodified PyTorch reference runs this pipeline at ~2.7
images/sec at batch 1 (BASELINE.md, measured on this machine's CPU; the
repo publishes no numbers). Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 2.7


def main():
    import pickle

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tgsr_tpu.config import config_from_file, default_config
    from tgsr_tpu.engine.inference import SRPipeline

    dev = jax.devices()[0]
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

    pipe = SRPipeline.from_reference_checkpoints(
        cfg, vocab,
        os.path.join(ref, "Checkpoint/face_S8/netG_epoch_7.pth"),
        compute_dtype=jnp.bfloat16,
    )
    pipe_f32 = SRPipeline.from_reference_checkpoints(
        cfg, vocab,
        os.path.join(ref, "Checkpoint/face_S8/netG_epoch_7.pth"),
        compute_dtype=jnp.float32,
    )

    # bf16-vs-f32 fidelity guard on one image
    o16 = np.asarray(pipe(lr1[None], tok[:1], lens[:1])["sr"])
    o32 = np.asarray(pipe_f32(lr1[None], tok[:1], lens[:1])["sr"])
    d16 = np.abs(
        np.clip((o16 + 1) * 127.5, 0, 255) - np.clip((o32 + 1) * 127.5, 0, 255)
    )
    rmse = float(np.sqrt((d16**2).mean()))
    psnr_vs_f32 = 20 * np.log10(255.0 / max(rmse, 1e-6))
    print(f"[bench] bf16 vs f32: rmse={rmse:.3f}/255, psnr={psnr_vs_f32:.1f} dB",
          file=sys.stderr)

    best = 0.0
    best_b = 0
    for B in (64, 128, 256, 512):
        reps = int(np.ceil(B / n_caps))
        tokB = np.tile(tok, (reps, 1))[:B]
        lensB = np.tile(lens, reps)[:B]
        lrB = np.tile(lr1[None], (B, 1, 1, 1))
        try:
            out = pipe(lrB, tokB, lensB)  # compile + warmup
            jax.block_until_ready(out["sr"])
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = pipe(lrB, tokB, lensB)
            jax.block_until_ready(out["sr"])
            dt = time.perf_counter() - t0
            ips = B * iters / dt
            print(f"[bench] B={B}: {ips:.1f} img/s ({dt/iters*1e3:.1f} ms/batch)",
                  file=sys.stderr)
            if ips > best:
                best, best_b = ips, B
        except Exception as e:  # OOM at large batch: keep best so far
            print(f"[bench] B={B} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            break

    # p50 single-image latency
    out = pipe(lr1[None], tok[:1], lens[:1])
    jax.block_until_ready(out["sr"])
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = pipe(lr1[None], tok[:1], lens[:1])
        jax.block_until_ready(out["sr"])
        lats.append(time.perf_counter() - t0)
    p50 = float(np.median(lats)) * 1e3
    print(f"[bench] p50 single-image latency: {p50:.2f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": "images/sec/chip at x8 face SR (batch %d, bf16)" % best_b,
        "value": round(best, 1),
        "unit": "img/s",
        "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
