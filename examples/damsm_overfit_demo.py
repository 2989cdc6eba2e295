#!/usr/bin/env python
"""Learning-proof for the DAMSM pretraining engine: retrieval, not loss.

The DAMSM trainer (engine/damsm_trainer.py = pretrain_DAMSM.py protocol)
previously only demonstrated decreasing train losses (docs/PERF.md). This
script proves the system learns the thing DAMSM exists for: associating
specific images with specific captions. From random init, train on N
distinct (augmented face crop, seeded caption) pairs and record the
DAMSM retrieval ranking (engine.evaluator.rank_r_precision) every eval
interval: R@1 must rise from chance (1/N) to ~1.0 with the contrastive
losses in both directions falling.

  python examples/damsm_overfit_demo.py --steps 1200        # TPU, Inception
  python examples/damsm_overfit_demo.py --cpu --simple --steps 60 \
      --n 8 --size 64 --eval-every 20                       # CPU smoke

Outputs (under --out, default examples/artifacts/damsm_overfit):
  curve.jsonl   one record per eval: step, word/sent R@1+R@5, losses
  curve.png     R@1 + loss vs step, chance baseline marked
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def build_pairs(n, size, vocab, T, seed=0):
    """N visually-distinct augmented crops of the shipped face image
    (/root/reference/data/face/000155.png) + N distinct seeded captions.
    Distinct class_ids keep the DAMSM class mask from merging pairs."""
    import numpy as np
    from PIL import Image

    img = Image.open(os.path.join(REF, "data/face/000155.png")).convert("RGB")
    rng = np.random.default_rng(seed)
    w, h = img.size
    imgs = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        cw = ch = int(min(w, h) * rng.uniform(0.5, 1.0))
        left, top = rng.integers(0, w - cw + 1), rng.integers(0, h - ch + 1)
        crop = img.crop((left, top, left + cw, top + ch))
        if rng.random() < 0.5:
            crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
        a = np.asarray(crop.resize((size, size), Image.BILINEAR), np.float32)
        # per-image color jitter for extra separability of the frozen
        # backbone's features
        a = a * rng.uniform(0.7, 1.1, 3) + rng.uniform(-20, 20, 3)
        imgs[i] = np.clip(a, 0, 255) / 127.5 - 1.0
    caps = np.zeros((n, T), np.int32)
    lens = rng.integers(4, T - 2, n).astype(np.int32)
    for i in range(n):
        caps[i, : lens[i]] = rng.integers(1, vocab, lens[i])
    return {"imgs": imgs, "captions": caps, "cap_lens": lens,
            "class_ids": np.arange(n, dtype=np.int32)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--vocab", type=int, default=64)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--lr", type=float, default=2e-3,
                   help="overfit LR (reference pretrain default 2e-4)")
    p.add_argument("--simple", action="store_true",
                   help="SimpleCNN backbone instead of frozen Inception")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "artifacts", "damsm_overfit"))
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("TGSR_PLATFORM", "cpu")
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tgsr_tpu.config import Config
    from tgsr_tpu.engine.damsm_trainer import DAMSMTrainer
    from tgsr_tpu.engine.evaluator import rank_r_precision

    os.makedirs(args.out, exist_ok=True)
    cfg = Config()
    cfg.TRAIN.ENCODER_LR = args.lr
    T = cfg.TEXT.WORDS_NUM
    host = build_pairs(args.n, args.size, args.vocab, T)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    trainer = DAMSMTrainer(
        cfg, vocab_size=args.vocab, use_inception=not args.simple,
        freeze_backbone=True,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    print(f"init ({'SimpleCNN' if args.simple else 'Inception frozen'}, "
          f"{args.size}px, n={args.n})...", flush=True)
    t0 = time.time()
    state = trainer.init_state(init_rng, image_size=args.size, batch_size=2)
    print(f"init {time.time() - t0:.0f}s", flush=True)

    gammas = (cfg.TRAIN.SMOOTH.GAMMA1, cfg.TRAIN.SMOOTH.GAMMA2,
              cfg.TRAIN.SMOOTH.GAMMA3)

    def ranks(state):
        feat, code, words, sent = trainer.embed_step(state, batch)
        r1 = rank_r_precision(feat, code, words, sent, batch["cap_lens"],
                              gammas, top_k=1)
        r5 = rank_r_precision(feat, code, words, sent, batch["cap_lens"],
                              gammas, top_k=5)
        return {"word_r1": r1["word_r@1"], "sent_r1": r1["sent_r@1"],
                "word_r5": r5["word_r@5"], "sent_r5": r5["sent_r@5"]}

    curve_path = os.path.join(args.out, "curve.jsonl")
    curve = []

    def record(step, metrics):
        r = ranks(trainer_state_sink[0])
        m = {k: float(v) for k, v in metrics.items()} if metrics else {}
        rec = {"step": step, **r, **m}
        curve.append(rec)
        with open(curve_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"step {step:5d}  word R@1 {r['word_r1']:.2f} "
              f"sent R@1 {r['sent_r1']:.2f}"
              + (f"  loss {m.get('loss', float('nan')):.2f}" if m else ""),
              flush=True)

    open(curve_path, "w").close()
    trainer_state_sink = [state]
    record(0, None)
    lr = trainer.epoch_lr(0)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, lr, sub)
        trainer_state_sink[0] = state
        if step % args.eval_every == 0 or step == args.steps:
            record(step, metrics)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.0f}s "
          f"({args.steps / dt:.1f} steps/s wall)", flush=True)

    final = curve[-1]
    chance = 1.0 / args.n
    print(f"FINAL: word R@1 {final['word_r1']:.2f}, sent R@1 "
          f"{final['sent_r1']:.2f} (chance {chance:.3f})", flush=True)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = [c["step"] for c in curve]
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(steps, [c["word_r1"] for c in curve], label="word R@1")
        ax.plot(steps, [c["sent_r1"] for c in curve], label="sent R@1")
        ax.axhline(chance, ls="--", c="gray", label=f"chance 1/{args.n}")
        ax.set_xlabel("step")
        ax.set_ylabel("R@1")
        ax.set_ylim(0, 1.05)
        ax2 = ax.twinx()
        ax2.plot(steps[1:], [c.get("loss", float("nan"))
                             for c in curve[1:]], c="tab:red", alpha=0.4,
                 label="train loss")
        ax2.set_ylabel("DAMSM loss")
        ax.legend(loc="center right")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "curve.png"), dpi=120)
        print(f"curve written to {args.out}/curve.png", flush=True)
    except Exception as e:  # plotting is best-effort
        print(f"plot skipped: {e}", flush=True)


if __name__ == "__main__":
    main()
