#!/usr/bin/env python
"""Training batch-scaling probe: xprof device time per fused D+G step.

Extends docs/PERF.md "Training batch scaling" (round 2: B=16/64/128, OOM at
256) with the remat option (round 3): G-stage rematerialization trades ~1
extra forward for not holding the 2x-channel GLU temps live.

Wall time through this dev tunnel is dispatch-noise (see docs/PERF.md);
the number that matters is xprof device self time per step.

  python examples/train_scaling_probe.py --batch 256 --bf16 --remat
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--base", type=int, default=32)
    p.add_argument("--gf", type=int, default=32)
    p.add_argument("--df", type=int, default=64)
    p.add_argument("--steps", type=int, default=3, help="profiled steps")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", nargs="?", const=True, default=False,
                   choices=[True, False, "all", "low", "high"],
                   help="--remat (full) or --remat low|high|all")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    import dataclasses

    from tgsr_tpu.config import Config
    from tgsr_tpu.engine.gan_trainer import GANTrainer
    from tgsr_tpu.models.text_encoder import TextEncoder

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=args.base),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=args.gf, DF_DIM=args.df),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=args.batch),
    )
    B, T, vocab = args.batch, cfg.TEXT.WORDS_NUM, 41
    sizes = cfg.pyramid_sizes()
    print(f"batch {B}, LR {args.base} -> {sizes}, bf16={args.bf16}, "
          f"remat={args.remat}, device {jax.devices()[0]}", flush=True)

    # noise-augmented real-image batch (constant images NaN through BN)
    img = Image.open("/root/reference/data/face/000155.png").convert("RGB")
    rng = np.random.default_rng(0)
    hrs = {s: np.asarray(img.resize((s, s), Image.BILINEAR),
                         np.float32) / 127.5 - 1.0 for s in sizes + [args.base]}
    batch = {
        "lr": jax.device_put(
            np.broadcast_to(hrs[args.base], (B, args.base, args.base, 3))
            + rng.normal(0, 0.05, (B, args.base, args.base, 3)).astype(
                np.float32)),
        "real_pyramid": [
            jax.device_put(
                np.broadcast_to(hrs[s], (B, s, s, 3))
                + rng.normal(0, 0.05, (B, s, s, 3)).astype(np.float32))
            for s in sizes
        ],
        "captions": jax.device_put(
            rng.integers(1, vocab, (B, T)).astype(np.int32)),
        "cap_lens": jax.device_put(np.full((B,), T, np.int32)),
        "class_ids": jax.device_put(np.arange(B, dtype=np.int32)),
    }

    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    tv = enc.init(k, jnp.asarray(batch["captions"]),
                  jnp.asarray(batch["cap_lens"]))
    trainer = GANTrainer(
        cfg, vocab, tv,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        remat=args.remat)
    t0 = time.perf_counter()
    state = trainer.init_state(k, batch_size=B)
    print(f"init_state {time.perf_counter()-t0:.0f}s", flush=True)

    step_rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, metrics, step_rng = trainer.train_step(state, batch, step_rng)
    first = {kk: float(v) for kk, v in metrics.items()}
    print(f"compile+step {time.perf_counter()-t0:.0f}s, g_loss "
          f"{first['g_loss']:.2f} d_loss {first['d_loss']:.2f}", flush=True)
    assert all(np.isfinite(v) for v in first.values()), first

    logdir = tempfile.mkdtemp(prefix="train_prof_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        state, metrics, step_rng = trainer.train_step(state, batch, step_rng)
    last = {kk: float(v) for kk, v in metrics.items()}  # forces the chain
    jax.profiler.stop_trace()
    assert all(np.isfinite(v) for v in last.values()), last

    from profile_inference import print_op_table

    recs = print_op_table(logdir, n_images=B * args.steps, top=10)
    total_ms = sum(r["self_us"] for r in recs) / 1e3
    per_step = total_ms / args.steps
    print(f"\nRESULT batch={B} remat={args.remat}: {per_step:.1f} ms/step "
          f"device time = {per_step/B*1e3:.0f} us/img = "
          f"{B/per_step*1e3:.0f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
