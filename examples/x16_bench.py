#!/usr/bin/env python
"""x16 family serving: int8 calibration artifact + throughput sweep +
fidelity gate (VERDICT r2 item 6 -- give models16 the x8 treatment).

The reference ships NO x16 checkpoint (models16.py exists but face_S8 is
x8-only), so weights are a fixed-seed random init -- the same convention as
tests/test_models16_oracle.py and the round-2 bf16 sweep. The calibration
artifact (checkpoints/x16_int8_scales.json) is therefore tied to seed 0;
to regenerate for real weights, load them in place of the seeded init and
run this script (the artifact is rewritten only when the >=35 dB fidelity
gate passes; --no-save suppresses writing entirely, e.g. for probe runs).

Geometry: BRANCH_NUM=5, BASE_SIZE=32 -> pyramid 64/128/256/512 (x16 SR).

  python examples/x16_bench.py --sweep 128,8 192,16 256,16   (TPU)
  python examples/x16_bench.py --cpu --batch 2 --no-sweep     (smoke)
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES_PATH = os.path.join(REPO, "tgsr_tpu", "checkpoints",
                           "x16_int8_scales.json")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch", type=int, default=16,
                   help="calibration/fidelity batch")
    p.add_argument("--sweep", nargs="*", default=["192,16", "256,16"],
                   help="B,M pairs for the throughput sweep")
    p.add_argument("--no-sweep", action="store_true")
    p.add_argument("--no-save", action="store_true")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tgsr_tpu.config import Config
    from tgsr_tpu.engine.inference import SRPipeline
    from tgsr_tpu.engine.quant import merge_scales
    from tgsr_tpu.models.models16 import GSRNetLow16, NetGHighWeight16
    from tgsr_tpu.models.text_encoder import TextEncoder

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, METHOD="S16",
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=5, BASE_SIZE=32),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=32))
    sizes = cfg.pyramid_sizes()
    vocab, T, B = 41, cfg.TEXT.WORDS_NUM, args.batch
    print(f"x16 geometry: 32 -> {sizes}, device {jax.devices()[0]}",
          flush=True)

    # fixed-seed init (no upstream x16 checkpoint exists -- documented gap)
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps0 = jnp.ones((2, T), jnp.int32)
    lens0 = jnp.full((2,), 6, jnp.int32)
    tv = enc.init(k, caps0, lens0)
    words, sent = enc.apply(tv, caps0, lens0)
    lr0 = jnp.zeros((2, 32, 32, 3))
    netg = GSRNetLow16(ngf=32, c_dim=cfg.GAN.CONDITION_DIM)
    gv = netg.init(k, lr0, sent, words, caps0 == 0)
    fake, *_ = netg.apply(gv, lr0, sent, words, caps0 == 0)
    netgh = NetGHighWeight16(ngf=32, low="lr", sizes=tuple(sizes))
    ghv = netgh.init(k, lr0, fake, lr0)

    # --- calibration batches: noise-augmented face + varied crops/flips
    # (round-2 robustness recipe, docs/PERF.md "Calibration robustness") ---
    img = Image.open(os.path.join(REF, "data/face/000155.png")).convert("RGB")
    rng = np.random.default_rng(0)

    def make_batch(varied):
        lr = np.empty((B, 32, 32, 3), np.float32)
        for i in range(B):
            crop = img
            if varied:
                w, h = img.size
                cw = ch = int(min(w, h) * rng.uniform(0.6, 1.0))
                left = rng.integers(0, w - cw + 1)
                top = rng.integers(0, h - ch + 1)
                crop = img.crop((left, top, left + cw, top + ch))
                if rng.random() < 0.5:
                    crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
            a = np.asarray(crop.resize((32, 32), Image.BICUBIC),
                           np.float32) / 127.5 - 1.0
            lr[i] = a + rng.normal(0, 0.02, a.shape)
        caps = np.zeros((B, T), np.int32)
        lens = rng.integers(4, 15, B).astype(np.int32)
        for i in range(B):
            caps[i, : lens[i]] = rng.integers(1, vocab, lens[i])
        return lr, caps, lens

    pipe_f32 = SRPipeline(cfg, vocab, tv, gv, ghv)
    lr_a, caps_a, lens_a = make_batch(varied=False)
    lr_b, caps_b, lens_b = make_batch(varied=True)
    t0 = time.perf_counter()
    s1 = pipe_f32.calibrate_quant(lr_a, caps_a, lens_a)
    s2 = pipe_f32.calibrate_quant(lr_b, caps_b, lens_b)
    scales = {g: merge_scales(s1[g], s2[g]) for g in s1}
    print(f"calibrated {sum(len(v) for v in scales.values())} conv scales "
          f"in {time.perf_counter() - t0:.1f}s", flush=True)

    # --- fidelity gate: int8 (incl. heads — the shipped default) vs f32
    # on the real image (the artifact save below is CONDITIONED on it) ---
    pipe_int8 = SRPipeline(cfg, vocab, tv, gv, ghv,
                           compute_dtype=jnp.bfloat16,
                           quant_scales=scales)
    pipe_bf16 = SRPipeline(cfg, vocab, tv, gv, ghv,
                           compute_dtype=jnp.bfloat16)
    out_f32 = np.asarray(pipe_f32(lr_a[:2], caps_a[:2], lens_a[:2])["sr"],
                         np.float32)
    out_i8 = np.asarray(pipe_int8(lr_a[:2], caps_a[:2], lens_a[:2])["sr"],
                        np.float32)
    rmse = float(np.sqrt(np.mean((out_f32 - out_i8) ** 2))) * 127.5
    psnr = 20 * np.log10(255.0 / max(rmse, 1e-9))
    print(f"int8 vs f32 on x16 output: rmse {rmse:.3f}/255, "
          f"psnr {psnr:.1f} dB {'(PASS >=35)' if psnr >= 35 else '(FAIL)'}",
          flush=True)
    if not args.no_save:
        if psnr >= 35:
            with open(SCALES_PATH, "w") as f:
                json.dump(scales, f, indent=1, sort_keys=True)
            print(f"saved {SCALES_PATH}", flush=True)
        else:
            print(f"NOT saving {SCALES_PATH}: fidelity gate failed",
                  flush=True)

    if args.no_sweep:
        return

    # --- throughput sweep (forced-sync scan, docs/PERF.md methodology) ---
    for spec in args.sweep:
        Bs, M = (int(v) for v in spec.split(","))
        lr_m = np.repeat(lr_a[:1][None], M, 0).repeat(Bs, 1) \
            + rng.normal(0, 0.01, (M, Bs, 32, 32, 3)).astype(np.float32)
        cap_m = np.repeat(caps_a[:1][None], M, 0).repeat(Bs, 1)
        len_m = np.repeat(lens_a[:1][None], M, 0).repeat(Bs, 1)
        for name, pipe in (("bf16", pipe_bf16), ("int8", pipe_int8)):
            scan_fn, _ = pipe.checksum_fns()
            dev_args = (jax.device_put(pipe.variables),
                        jax.device_put(lr_m.astype(np.float32)),
                        jax.device_put(cap_m), jax.device_put(len_m))
            float(scan_fn(*dev_args, jnp.float32(0)))  # compile
            t0 = time.perf_counter()
            float(scan_fn(*dev_args, jnp.float32(1)))
            dt = time.perf_counter() - t0
            print(f"  B={Bs} x M={M} {name}: {Bs * M / dt:.0f} img/s "
                  f"({dt * 1e3:.0f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
