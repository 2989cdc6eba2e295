#!/usr/bin/env python
"""Train the SHIPPED face NET_E (DAMSM text encoder) at the largest
in-environment scale, and write it under tgsr_tpu/checkpoints/.

The reference's eval contract loads a TRAINED NET_E
(trainer_objective.py:62-67; cfg/eval_faceSR_attn2.yml NET_E key) that is
absent from the snapshot — out of the box the rebuild conditioned its
attention on a seeded-random text encoder. This script runs the
pretrain_DAMSM.py protocol (engine/damsm_trainer.py: frozen Inception
backbone @299px, trainable emb heads + bi-LSTM, Adam(0.5,0.999),
RNN grad clip 0.25) on everything the environment has:

  * captions: the 21 REAL attribute captions of data/face/testset.txt,
    tokenized with the product vocabulary (testset.pickle, 41 tokens) —
    the exact captions cli.test conditions on;
  * images: K augmented crops of the one shipped face image per caption
    (class_ids group same-caption crops so the DAMSM class mask treats
    them as non-negatives — the reference's own semantics for repeated
    captions, losses.py:45-50);
  * trained to caption<->image retrieval R@1 1.00 over the 21 canonical
    pairs (the DAMSM learning-proof protocol, docs/PERF.md).

Output: tgsr_tpu/checkpoints/face_net_e_s8.msgpack (+ .json metadata).
cli.test / cli.serve auto-load it when no NET_E source is given
(--seeded-text restores the old parity behavior).

  python examples/train_shipped_net_e.py            # TPU, ~2000 steps
  python examples/train_shipped_net_e.py --cpu --steps 60 --size 64 \
      --crops 1 --out /tmp/net_e_smoke                # CPU smoke
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def build_pairs(crops_per_caption, size, T, seed=0):
    """(augmented crop, real caption) pairs: 21 captions x K crops."""
    import numpy as np
    from PIL import Image

    with open(os.path.join(REF, "data/face/testset.pickle"), "rb") as f:
        caps, ixtoword, wordtoix = pickle.load(f)
    n_caps, vocab = len(caps), len(ixtoword)

    img = Image.open(os.path.join(REF, "data/face/000155.png")).convert("RGB")
    rng = np.random.default_rng(seed)
    w, h = img.size
    n = n_caps * crops_per_caption
    imgs = np.empty((n, size, size, 3), np.float32)
    tok = np.zeros((n, T), np.int32)
    lens = np.zeros((n,), np.int32)
    cls = np.zeros((n,), np.int32)
    for i in range(n):
        ci = i % n_caps
        cw = ch = int(min(w, h) * rng.uniform(0.5, 1.0))
        left, top = rng.integers(0, w - cw + 1), rng.integers(0, h - ch + 1)
        crop = img.crop((left, top, left + cw, top + ch))
        if rng.random() < 0.5:
            crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
        a = np.asarray(crop.resize((size, size), Image.BILINEAR), np.float32)
        a = a * rng.uniform(0.7, 1.1, 3) + rng.uniform(-20, 20, 3)
        imgs[i] = np.clip(a, 0, 255) / 127.5 - 1.0
        L = min(len(caps[ci]), T)
        tok[i, :L] = caps[ci][:L]
        lens[i] = L
        cls[i] = ci  # same-caption crops share a class (mask semantics)
    return ({"imgs": imgs, "captions": tok, "cap_lens": lens,
             "class_ids": cls}, n_caps, vocab, ixtoword)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--crops", type=int, default=3,
                   help="augmented crops per caption (batch = 21*crops)")
    p.add_argument("--size", type=int, default=299)  # reference DAMSM res
    p.add_argument("--lr", type=float, default=2e-3,
                   help="overfit lr from the DAMSM retrieval proof")
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--simple", action="store_true",
                   help="SimpleCNN backbone (CPU smoke)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tgsr_tpu", "checkpoints"))
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tgsr_tpu.checkpoints.io import save_variables
    from tgsr_tpu.config import Config
    from tgsr_tpu.engine.damsm_trainer import DAMSMTrainer
    from tgsr_tpu.engine.evaluator import rank_r_precision

    cfg = Config()
    cfg.TRAIN.ENCODER_LR = args.lr
    T = cfg.TEXT.WORDS_NUM
    host, n_caps, vocab, ixtoword = build_pairs(args.crops, args.size, T)
    n = host["imgs"].shape[0]
    print(f"pairs: {n} ({n_caps} real captions x {args.crops} crops), "
          f"vocab {vocab}, {args.size}px, device "
          f"{jax.devices()[0].platform}", flush=True)
    batch = {k: jax.device_put(v) for k, v in host.items()}
    # retrieval eval over the canonical 21 distinct-class pairs
    ebatch = {k: v[:n_caps] for k, v in batch.items()}
    ebatch["class_ids"] = jnp.arange(n_caps, dtype=jnp.int32)

    trainer = DAMSMTrainer(cfg, vocab_size=vocab,
                           use_inception=not args.simple,
                           freeze_backbone=True)
    rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    t0 = time.time()
    state = trainer.init_state(init_rng, image_size=args.size, batch_size=2)
    print(f"init {time.time() - t0:.0f}s", flush=True)
    gammas = (cfg.TRAIN.SMOOTH.GAMMA1, cfg.TRAIN.SMOOTH.GAMMA2,
              cfg.TRAIN.SMOOTH.GAMMA3)

    def ranks(state):
        feat, code, words, sent = trainer.embed_step(state, ebatch)
        r = rank_r_precision(feat, code, words, sent, ebatch["cap_lens"],
                             gammas, top_k=1)
        return float(r["word_r@1"]), float(r["sent_r@1"])

    t0 = time.time()
    loss = float("nan")
    for step in range(1, args.steps + 1):
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, args.lr, sub)
        if step % args.eval_every == 0 or step == args.steps:
            w1, s1 = ranks(state)
            loss = float(metrics["loss"])
            print(f"step {step:5d}  loss {loss:8.3f}  "
                  f"word R@1 {w1:.2f}  sent R@1 {s1:.2f}", flush=True)
    dt = time.time() - t0
    w1, s1 = ranks(state)
    print(f"{args.steps} steps in {dt:.0f}s ({args.steps/dt:.1f} steps/s); "
          f"FINAL word R@1 {w1:.2f} sent R@1 {s1:.2f} "
          f"(chance {1.0/n_caps:.3f})", flush=True)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "face_net_e_s8.msgpack")
    text_vars = {"params": jax.device_get(state.text_params)}
    save_variables(path, text_vars)
    meta = {
        "vocab_size": vocab,
        "rnn_type": cfg.RNN_TYPE,
        "embedding_dim": cfg.TEXT.EMBEDDING_DIM,
        "recipe": (f"DAMSM pretrain protocol: {n} pairs ({n_caps} real "
                   f"testset.txt captions x {args.crops} aug crops of "
                   f"000155.png), "
                   f"{'SimpleCNN' if args.simple else 'frozen Inception'} "
                   f"@{args.size}px, {args.steps} steps, "
                   f"lr {args.lr}"),
        "final_word_r1": w1,
        "final_sent_r1": s1,
        "final_loss": loss,
    }
    with open(path.replace(".msgpack", ".json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"saved {path} (+ .json metadata)", flush=True)


if __name__ == "__main__":
    main()
