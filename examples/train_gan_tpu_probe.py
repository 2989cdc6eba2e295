#!/usr/bin/env python
"""Real-geometry GAN training probe on the TPU.

Runs the fused D+G train step (engine.gan_trainer) at the production face-SR
geometry -- 32x32 LR -> 64/128/256 pyramid, batch >= 16 -- for N steps on
noise-augmented real image data, then snapshots the EMA generator, reloads
it, and super-resolves (the full production loop).

Timing methodology (docs/PERF.md): steps chain through the donated state, so
fetching one scalar metric from the LAST step forces completion of the whole
chain; block_until_ready alone does NOT synchronize on this TPU stack.

  python examples/train_gan_tpu_probe.py [--steps 50] [--batch 16] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--gf", type=int, default=32)
    p.add_argument("--df", type=int, default=64)
    p.add_argument("--base", type=int, default=32)
    p.add_argument("--branch", type=int, default=4,
                   help="TREE.BRANCH_NUM: 4 = x8 family (model.py), "
                        "5 = x16 family (models16, 32->512)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--n-batches", type=int, default=4,
                   help="distinct device-resident batches cycled")
    p.add_argument("--scan", action="store_true",
                   help="run n-batches steps per dispatch via train_steps")
    p.add_argument("--bf16", action="store_true",
                   help="mixed precision (GANTrainer compute_dtype=bf16); "
                        "required for batch >= 128 on one v5e (docs/PERF.md)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize G stages (batch >= 256 on one v5e)")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tgsr_tpu.config import Config
    from tgsr_tpu.engine.gan_trainer import GANTrainer
    from tgsr_tpu.models.text_encoder import TextEncoder

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=args.branch,
                                 BASE_SIZE=args.base),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=args.gf, DF_DIM=args.df),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=args.batch),
    )
    B, T, vocab = args.batch, cfg.TEXT.WORDS_NUM, 41
    sizes = cfg.pyramid_sizes()
    print(f"geometry: LR {args.base} -> pyramid {sizes}, batch {B}, "
          f"gf {args.gf}, df {args.df}, platform "
          f"{jax.devices()[0].platform}")

    # --- noise-augmented real data: random crops/flips of the real test
    # image + per-batch gaussian noise (constant inputs NaN through BN) ---
    img = Image.open(os.path.join(REF, "data/face/000155.png")).convert("RGB")
    rng = np.random.default_rng(0)
    batches = []
    for bi in range(args.n_batches):
        hr = np.empty((B, sizes[-1], sizes[-1], 3), np.float32)
        lr = np.empty((B, args.base, args.base, 3), np.float32)
        pyr = [np.empty((B, s, s, 3), np.float32) for s in sizes]
        for i in range(B):
            w, h = img.size
            cw = ch = int(min(w, h) * rng.uniform(0.7, 1.0))
            left, top = rng.integers(0, w - cw + 1), rng.integers(0, h - ch + 1)
            crop = img.crop((left, top, left + cw, top + ch))
            if rng.random() < 0.5:
                crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
            for k, s in enumerate(sizes):
                a = np.asarray(crop.resize((s, s), Image.BILINEAR),
                               np.float32) / 127.5 - 1.0
                pyr[k][i] = a + rng.normal(0, 0.02, a.shape)
            a = np.asarray(crop.resize((args.base, args.base), Image.BILINEAR),
                           np.float32) / 127.5 - 1.0
            lr[i] = a + rng.normal(0, 0.02, a.shape)
        caps = np.zeros((B, T), np.int32)
        lens = rng.integers(4, 15, B).astype(np.int32)
        for i in range(B):
            caps[i, : lens[i]] = rng.integers(1, vocab, lens[i])
        batches.append({
            "lr": jax.device_put(lr),
            "real_pyramid": [jax.device_put(p_) for p_ in pyr],
            "captions": jax.device_put(caps),
            "cap_lens": jax.device_put(lens),
            "class_ids": jax.device_put(np.arange(B, dtype=np.int32)),
        })
    print(f"{args.n_batches} noise-augmented batches device-resident")

    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    text_vars = enc.init(k, jnp.asarray(batches[0]["captions"]),
                         jnp.asarray(batches[0]["cap_lens"]))
    trainer = GANTrainer(
        cfg, vocab, text_vars,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        remat=args.remat)

    t0 = time.perf_counter()
    state = trainer.init_state(k, batch_size=B)
    print(f"init_state: {time.perf_counter() - t0:.1f}s")

    step_rng = jax.random.PRNGKey(1)
    if not args.scan:
        t0 = time.perf_counter()
        state, metrics, step_rng = trainer.train_step(state, batches[0],
                                                      step_rng)
        first = {kk: float(v) for kk, v in metrics.items()}
        print(f"first step (compile): {time.perf_counter() - t0:.1f}s, "
              f"metrics {first}")

    if args.scan:
        # K steps per dispatch via lax.scan (GANTrainer.train_steps)
        K = args.n_batches
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        t0 = time.perf_counter()
        state, ms, step_rng = trainer.train_steps(state, stacked, step_rng)
        float(ms["g_loss"][-1])  # force the compile dispatch
        print(f"scan compile+first {K} steps: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        rounds = max(1, args.steps // K)
        for _ in range(rounds):
            state, ms, step_rng = trainer.train_steps(state, stacked, step_rng)
        last = {kk: float(v[-1]) for kk, v in ms.items()}
        dt = time.perf_counter() - t0
        args.steps = rounds * K
    else:
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics, step_rng = trainer.train_step(
                state, batches[i % args.n_batches], step_rng)
        # force the WHOLE chain by fetching a scalar from the last step
        last = {kk: float(v) for kk, v in metrics.items()}
        dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.2f}s = {args.steps / dt:.2f} steps/s "
          f"({args.steps * B / dt:.1f} img/s), last metrics {last}")
    bad = [kk for kk, v in last.items() if not np.isfinite(v)]
    assert not bad, f"non-finite metrics after {args.steps} steps: {bad}"
    warm = args.n_batches if args.scan else 1
    assert int(jax.device_get(state.step)) == args.steps + warm

    # --- EMA snapshot -> reload -> infer round-trip ---
    import tempfile

    from tgsr_tpu.checkpoints.io import load_variables, save_variables
    from tgsr_tpu.engine.inference import SRPipeline

    g_ema = jax.device_get(state.g_ema)
    g_stats = jax.device_get(state.g_stats)
    with tempfile.TemporaryDirectory() as td:
        save_variables(os.path.join(td, "netG.msgpack"),
                       {"params": g_ema["netg"],
                        "batch_stats": g_stats["netg"]})
        save_variables(os.path.join(td, "netGH.msgpack"),
                       {"params": g_ema["netgh"],
                        "batch_stats": g_stats["netgh"]})
        pipe = SRPipeline(
            cfg, vocab, text_vars,
            load_variables(os.path.join(td, "netG.msgpack")),
            load_variables(os.path.join(td, "netGH.msgpack")))
        lr_host = np.asarray(jax.device_get(batches[0]["lr"]))[:1]
        sr = pipe.sr_uint8(lr_host, np.asarray(batches[0]["captions"])[:1],
                           np.asarray(batches[0]["cap_lens"])[:1])
    assert sr.shape == (1, sizes[-1], sizes[-1], 3)
    print(f"EMA snapshot -> reload -> infer OK: SR {sr.shape}, "
          f"mean {sr.mean():.1f}")
    print("PROBE OK")


if __name__ == "__main__":
    main()
