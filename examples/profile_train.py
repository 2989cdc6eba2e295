#!/usr/bin/env python
"""Profile the fused D+G GAN train step on the TPU and print top HLO ops.

The serving path has an op-level endline profile (docs/PERF.md "Round-3
endline profile"); this gives the TRAINING step the same treatment at its
production geometry (B=128 bf16, docs/PERF.md "Training batch scaling").
Captures a jax.profiler trace of N chained train_step dispatches on
noise-augmented real-image batches and prints the xprof hlo_stats
self-time table via profile_inference.print_op_table.

Reference contract being trained: miscc/losses.py:290-424 +
trainer_objective.py:43-53 (the reconstructed trainer, engine/gan_trainer.py).

Usage: python examples/profile_train.py [--batch 128] [--steps 3]
       [--f32] [--remat] [--branch 4] [--damsm]
`--damsm` profiles the DAMSM encoder train step instead (full Inception
backbone, engine/damsm_trainer.py).
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_inference import print_op_table  # noqa: E402

REF = "/root/reference"


def make_batches(cfg, batch, n_batches, vocab, base):
    """Noise-augmented crops of the real face image (constant inputs NaN
    through train-mode BN — CLAUDE.md trap)."""
    import jax
    import numpy as np
    from PIL import Image

    sizes = cfg.pyramid_sizes()
    img = Image.open(os.path.join(REF, "data/face/000155.png")).convert("RGB")
    rng = np.random.default_rng(0)
    T = cfg.TEXT.WORDS_NUM
    batches = []
    for _ in range(n_batches):
        lr = np.empty((batch, base, base, 3), np.float32)
        pyr = [np.empty((batch, s, s, 3), np.float32) for s in sizes]
        for i in range(batch):
            w, h = img.size
            cw = ch = int(min(w, h) * rng.uniform(0.7, 1.0))
            left, top = rng.integers(0, w - cw + 1), rng.integers(0, h - ch + 1)
            crop = img.crop((left, top, left + cw, top + ch))
            for k, s in enumerate(sizes):
                a = np.asarray(crop.resize((s, s), Image.BILINEAR),
                               np.float32) / 127.5 - 1.0
                pyr[k][i] = a + rng.normal(0, 0.02, a.shape)
            a = np.asarray(crop.resize((base, base), Image.BILINEAR),
                           np.float32) / 127.5 - 1.0
            lr[i] = a + rng.normal(0, 0.02, a.shape)
        caps = np.zeros((batch, T), np.int32)
        lens = rng.integers(4, 15, batch).astype(np.int32)
        for i in range(batch):
            caps[i, : lens[i]] = rng.integers(1, vocab, lens[i])
        batches.append({
            "lr": jax.device_put(lr),
            "real_pyramid": [jax.device_put(p_) for p_ in pyr],
            "captions": jax.device_put(caps),
            "cap_lens": jax.device_put(lens),
            "class_ids": jax.device_put(np.arange(batch, dtype=np.int32)),
        })
    return batches


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--n-batches", type=int, default=2)
    p.add_argument("--branch", type=int, default=4)
    p.add_argument("--base", type=int, default=32)
    p.add_argument("--f32", action="store_true",
                   help="profile f32 instead of the bf16 production config")
    p.add_argument("--remat", choices=["low", "high", "all"], default=None)
    p.add_argument("--reuse", action="store_true",
                   help="reuse_g_forward: single vjp'd G forward per step")
    p.add_argument("--damsm", action="store_true",
                   help="profile the DAMSM encoder step instead")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--cpu", action="store_true",
                   help="CPU smoke (env var alone is re-forced to axon by "
                        "sitecustomize; see CLAUDE.md)")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tgsr_tpu.config import Config

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=args.branch,
                                 BASE_SIZE=args.base),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=32, DF_DIM=64),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=args.batch),
    )
    vocab = 41
    k = jax.random.PRNGKey(0)

    if args.damsm:
        import numpy as np
        from PIL import Image

        from tgsr_tpu.engine.damsm_trainer import DAMSMTrainer

        trainer = DAMSMTrainer(cfg, vocab_size=vocab, compute_dtype=dtype)
        img = Image.open(
            os.path.join(REF, "data/face/000155.png")).convert("RGB")
        rng = np.random.default_rng(0)
        a = np.asarray(img.resize((299, 299), Image.BILINEAR),
                       np.float32) / 127.5 - 1.0
        T = cfg.TEXT.WORDS_NUM
        dbatches = []
        for _ in range(args.n_batches):
            x = np.broadcast_to(a, (args.batch, 299, 299, 3)).copy()
            x += rng.normal(0, 0.05, x.shape)
            caps = np.zeros((args.batch, T), np.int32)
            lens = rng.integers(4, 15, args.batch).astype(np.int32)
            for i in range(args.batch):
                caps[i, : lens[i]] = rng.integers(1, vocab, lens[i])
            dbatches.append({
                "imgs": jax.device_put(x.astype(np.float32)),
                "captions": jax.device_put(caps),
                "cap_lens": jax.device_put(lens),
                "class_ids": jax.device_put(
                    np.arange(args.batch, dtype=np.int32)),
            })
        state = trainer.init_state(k, batch_size=min(args.batch, 2))
        lr = cfg.TRAIN.ENCODER_LR

        def one(state, i):
            return trainer.train_step(state, dbatches[i % args.n_batches],
                                      lr, jax.random.fold_in(k, i))

        t0 = time.perf_counter()
        state, metrics = one(state, 0)
        print(f"compile+first: {time.perf_counter() - t0:.1f}s "
              f"{ {kk: float(v) for kk, v in metrics.items()} }",
              file=sys.stderr)
        logdir = tempfile.mkdtemp(prefix="damsm_train_prof_")
        jax.profiler.start_trace(logdir)
        for i in range(1, args.steps + 1):
            state, metrics = one(state, i)
        print({kk: float(v) for kk, v in metrics.items()}, file=sys.stderr)
        jax.profiler.stop_trace()
        print_op_table(logdir, n_images=args.steps * args.batch, top=args.top)
        return

    from tgsr_tpu.engine.gan_trainer import GANTrainer
    from tgsr_tpu.models.text_encoder import TextEncoder

    batches = make_batches(cfg, args.batch, args.n_batches, vocab, args.base)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    text_vars = enc.init(k, jnp.asarray(batches[0]["captions"]),
                         jnp.asarray(batches[0]["cap_lens"]))
    trainer = GANTrainer(cfg, vocab, text_vars, compute_dtype=dtype,
                         remat=args.remat or False,
                         reuse_g_forward=args.reuse)
    t0 = time.perf_counter()
    state = trainer.init_state(k, batch_size=args.batch)
    print(f"init_state: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    step_rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, metrics, step_rng = trainer.train_step(state, batches[0], step_rng)
    first = {kk: float(v) for kk, v in metrics.items()}
    print(f"compile+first: {time.perf_counter() - t0:.1f}s {first}",
          file=sys.stderr)

    logdir = tempfile.mkdtemp(prefix="gan_train_prof_")
    jax.profiler.start_trace(logdir)
    for i in range(1, args.steps + 1):
        state, metrics, step_rng = trainer.train_step(
            state, batches[i % args.n_batches], step_rng)
    # force the chain with a scalar fetch (block_until_ready is a no-op here)
    print({kk: float(v) for kk, v in metrics.items()}, file=sys.stderr)
    jax.profiler.stop_trace()
    print(f"[profile] trace in {logdir}", file=sys.stderr)
    print_op_table(logdir, n_images=args.steps * args.batch, top=args.top)


if __name__ == "__main__":
    main()
