"""DAMSM retrieval ranking over pre-generated SR results.

Completes the TextSRGTDataset use-case (reference datasets.py:1721-1885):
the reference ships the dataset class — pre-generated SR images + their
captions — but no driver consumes it. This CLI is that driver: embed the
images with the DAMSM image encoder and the captions with the text
encoder, rank every caption against every image by the DAMSM word- and
sentence-level similarities (miscc/losses.py:25-105 formulas via
losses/damsm.py), and report R-precision (R@1 / R@5 / mean rank).

Usage:
  python -m tgsr_tpu.cli.eval_rank --data_dir <dir-with-testset.txt> \
      --image_dir <dir-with-SR-pngs> --vocab_pickle <captions pickle> \
      [--dataset face] [--net_e text_encoder.msgpack|.pth] \
      [--image_encoder image_encoder.msgpack] [--simple-cnn]

With no encoder checkpoints the encoders run from a seeded random init
(the reference snapshot ships no trained face NET_E — PARITY.md "Known
gaps"); ranks are then meaningful only as a pipeline smoke, and the tool
prints a warning saying so.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle


def load_vocab(path: str):
    """Vocab from either pickle layout: [caps, ixtoword, wordtoix(, ...)]
    (testset.pickle, test1.py:117-120) or [train, test, ixtoword, wordtoix]
    (captions.pickle, datasets.py:421-426)."""
    from tgsr_tpu.data.tokenizer import Vocab

    with open(path, "rb") as f:
        obj = pickle.load(f)
    dicts = [o for o in obj if isinstance(o, dict)]
    if len(dicts) < 2:
        raise ValueError(f"no (ixtoword, wordtoix) dicts in {path}")
    ixtoword, wordtoix = dicts[0], dicts[1]
    if ixtoword and not isinstance(next(iter(ixtoword)), (int,)):
        ixtoword, wordtoix = wordtoix, ixtoword
    return Vocab(ixtoword={int(k): v for k, v in ixtoword.items()},
                 wordtoix=wordtoix)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="DAMSM R-precision over generated SR results")
    parser.add_argument("--data_dir", required=True,
                        help="directory holding --txt")
    parser.add_argument("--image_dir", required=True,
                        help="directory of generated images named per --txt")
    parser.add_argument("--txt", default="testset.txt")
    parser.add_argument("--dataset", default="face",
                        help="'face' = attr-table caption format, anything "
                             "else = 'name|caption' lines")
    parser.add_argument("--vocab_pickle", required=True)
    parser.add_argument("--net_e", default="",
                        help="text encoder: .msgpack (ours) or .pth (torch)")
    parser.add_argument("--image_encoder", default="",
                        help="image encoder: .msgpack or torchvision "
                             "inception .pth (heads stay init unless ours)")
    parser.add_argument("--simple-cnn", action="store_true")
    parser.add_argument("--imsize", type=int, default=256)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--seed", type=int, default=100)
    parser.add_argument("--out", default="", help="optional JSON out path")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tgsr_tpu.config import Config, enable_compile_cache

    enable_compile_cache()
    from tgsr_tpu.data.datasets import TextSRGTDataset
    from tgsr_tpu.engine.evaluator import rank_r_precision
    from tgsr_tpu.models.image_encoder import CNNEncoder, SimpleCNNEncoder
    from tgsr_tpu.models.text_encoder import TextEncoder

    cfg = Config()
    vocab = load_vocab(args.vocab_pickle)
    ds = TextSRGTDataset(vocab, args.data_dir, args.image_dir, txt=args.txt,
                         dataset=args.dataset, words_num=cfg.TEXT.WORDS_NUM,
                         imsize=args.imsize)
    n = len(ds)
    if n == 0:
        raise SystemExit(f"no entries in {args.data_dir}/{args.txt}")
    print(f"{n} (image, caption) pairs, vocab {vocab.n_words}")

    text_enc = TextEncoder(vocab_size=vocab.n_words,
                           nhidden=cfg.TEXT.EMBEDDING_DIM,
                           rnn_type=cfg.RNN_TYPE)
    cnn_enc = (SimpleCNNEncoder(nef=cfg.TEXT.EMBEDDING_DIM)
               if args.simple_cnn else CNNEncoder(nef=cfg.TEXT.EMBEDDING_DIM))

    rng = jax.random.PRNGKey(args.seed)
    caps0 = jnp.ones((2, cfg.TEXT.WORDS_NUM), jnp.int32)
    lens0 = jnp.full((2,), 4, jnp.int32)
    tv = text_enc.init(rng, caps0, lens0)
    cv = cnn_enc.init(rng, jnp.zeros((2, args.imsize, args.imsize, 3)))

    seeded = []
    if args.net_e:
        if args.net_e.endswith(".pth"):
            from tgsr_tpu.checkpoints.convert_torch import (
                convert_text_encoder, load_torch_state_dict)

            tv = {"params": convert_text_encoder(
                load_torch_state_dict(args.net_e),
                rnn_type=cfg.RNN_TYPE)["params"]}
        else:
            from tgsr_tpu.checkpoints.io import load_variables

            tv = load_variables(args.net_e)
    else:
        seeded.append("text")
    if args.image_encoder:
        if args.image_encoder.endswith(".pth"):
            from tgsr_tpu.checkpoints.convert_torch import (
                convert_cnn_encoder, load_torch_state_dict)

            conv = convert_cnn_encoder(load_torch_state_dict(
                args.image_encoder))
            cv = {"params": {**cv["params"], **conv["params"]},
                  "batch_stats": {**cv.get("batch_stats", {}),
                                  **conv["batch_stats"]}}
        else:
            from tgsr_tpu.checkpoints.io import load_variables

            cv = load_variables(args.image_encoder)
    else:
        seeded.append("image")
    if seeded:
        print(f"WARNING: {'/'.join(seeded)} encoder(s) at seeded random "
              "init — ranks are a pipeline smoke, not an evaluation")

    @jax.jit
    def embed(imgs, caps, lens):
        feat, code = cnn_enc.apply(cv, imgs, train=False)
        words, sent = text_enc.apply(tv, caps, lens, train=False)
        return feat, code, words, sent

    feats, codes, words_l, sents, lens_l = [], [], [], [], []
    B = args.batch
    for lo in range(0, n, B):
        idx = list(range(lo, min(lo + B, n)))
        # pad the tail to the jitted batch shape, drop after
        pad = [idx[-1]] * (B - len(idx))
        ex = [ds[i] for i in idx + pad]
        # normalize on HOST numpy: an eager jnp divide on the axon TPU
        # would pay a remote-compile round trip (CLAUDE.md)
        imgs = jnp.asarray(
            np.stack([e.hr for e in ex]).astype(np.float32) / 127.5 - 1.0)
        caps = jnp.asarray(np.stack([e.tokens for e in ex]))
        lens = jnp.asarray(np.asarray([e.length for e in ex], np.int32))
        feat, code, words, sent = embed(imgs, caps, lens)
        k = len(idx)
        feats.append(np.asarray(feat[:k]))
        codes.append(np.asarray(code[:k]))
        words_l.append(np.asarray(words[:k]))
        sents.append(np.asarray(sent[:k]))
        lens_l.append(np.asarray(lens[:k]))

    # host concatenation; rank_r_precision's jitted core takes numpy
    feat = np.concatenate(feats)
    code = np.concatenate(codes)
    words = np.concatenate(words_l)
    sent = np.concatenate(sents)
    lens = np.concatenate(lens_l)

    gammas = (cfg.TRAIN.SMOOTH.GAMMA1, cfg.TRAIN.SMOOTH.GAMMA2,
              cfg.TRAIN.SMOOTH.GAMMA3)
    res = {"n": n, "seeded_encoders": seeded}
    for k in (1, 5):
        # R@k is well-defined whenever there is at least one pair (it is
        # trivially 1.0 when k >= n, which is still worth reporting —
        # dropping it left the JSON without any rank metric on tiny sets).
        # Emit under the k ACTUALLY used (capped at n) so the key never
        # misdescribes the metric; 1 < n < 5 therefore yields word_r@{n},
        # and n == 1 yields a single word_r@1 entry.
        kk = min(k, n)
        if n >= 1 and f"word_r@{kk}" not in res:
            r = rank_r_precision(feat, code, words, sent, lens, gammas,
                                 top_k=kk)
            res[f"word_r@{kk}"] = r[f"word_r@{kk}"]
            res[f"sent_r@{kk}"] = r[f"sent_r@{kk}"]
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return res


if __name__ == "__main__":
    main()
