"""Evaluation / inference entry point.

= test1.py + condGANTrainer.gen_exampleSRHL (trainer_objective.py:55-165):
config-driven x8/x16 text-guided SR over an example test set, saving
`<key>_SR.png` outputs and attention-grid visualizations.

Usage (mirrors the reference UX):
  python -m tgsr_tpu.cli.test --cfg /root/reference/cfg/eval_faceSR_attn2.yml \
      --data_dir /root/reference/data/face --out_dir ./out [--batch 16]

Differences from the reference, by design:
  * batched + jitted on TPU instead of a per-image python loop
  * netG/netGH checkpoint paths resolve against --ckpt_dir when the YAML's
    relative paths don't exist (the reference hardcodes ../output/...)
"""

from __future__ import annotations

import argparse
import os
import pickle
import pprint

import numpy as np


def gen_example_pickle(data_dir: str, vocab, namein: str = "testset.txt",
                       namecp: str = "testset.pickle",
                       dataset: str = "face",
                       no_stopwords: bool = False,
                       only_color: bool = False) -> str:
    """= gen_examplePickle (test1.py:46-131): tokenize the example captions
    with the TRAIN vocabulary and cache [caption_ids, ixtoword, wordtoix].
    For the face dataset the caption source is the CelebA attribute table."""
    from tgsr_tpu.data.tokenizer import tokenize_caption

    out_path = os.path.join(data_dir, namecp)
    if os.path.exists(out_path):
        return out_path
    caps_ids = []
    src = os.path.join(data_dir, namein)
    if dataset == "face":
        from tgsr_tpu.data.datasets import TextFaceDataset
        import shutil
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            shutil.copy(src, os.path.join(td, "list_attr_celeba.txt"))
            caps_tr, _ = TextFaceDataset.load_attr_captions(td, True)
            caps_te, _ = TextFaceDataset.load_attr_captions(td, False)
        for toks in caps_tr + caps_te:
            caps_ids.append([vocab.wordtoix[w] for w in toks
                             if w in vocab.wordtoix])
    else:
        with open(src) as f:
            names = [n for n in f.read().split("\n") if n]
        for name in names:
            with open(os.path.join(data_dir, f"{name}.txt")) as f:
                caps = [c for c in f.read().split("\n") if c]
            cnt = 0
            for cap in caps:
                toks = tokenize_caption(cap, no_stopwords, only_color)
                if not toks:
                    continue
                caps_ids.append([vocab.wordtoix[w] for w in toks
                                 if w in vocab.wordtoix])
                cnt += 1
                if cnt == 10:
                    break
    with open(out_path, "wb") as f:
        pickle.dump([caps_ids, vocab.ixtoword, vocab.wordtoix], f, protocol=2)
    return out_path


def build_example_dataset(cfg):
    """Resolve the example eval dataset for `cfg`: reuse DATA_DIR's
    testset.pickle when present, else build it from testset.txt with the
    train vocabulary the way test1.py does (gen_examplePickle protocol,
    test1.py:46-131; for the face dataset the vocabulary comes from the
    attribute table itself)."""
    from tgsr_tpu.data.datasets import TextExampleSRDataset

    cap_pickle = os.path.join(cfg.DATA_DIR, "testset.pickle")
    if not os.path.exists(cap_pickle):
        src = os.path.join(cfg.DATA_DIR, "testset.txt")
        if not os.path.exists(src):
            raise SystemExit(f"{cap_pickle} not found and no testset.txt to "
                             "build it from")
        if cfg.DATASET_NAME == "face":
            import shutil
            import tempfile

            from tgsr_tpu.data.datasets import TextFaceDataset
            from tgsr_tpu.data.tokenizer import build_dictionary

            with tempfile.TemporaryDirectory() as td:
                shutil.copy(src, os.path.join(td, "list_attr_celeba.txt"))
                tr, _ = TextFaceDataset.load_attr_captions(td, True)
                te, _ = TextFaceDataset.load_attr_captions(td, False)
            _, _, vocab = build_dictionary(tr, te)
        else:
            from tgsr_tpu.data.datasets import TextSRDataset

            train_ds = TextSRDataset(cfg.DATA_DIR, split="train",
                                     words_num=cfg.TEXT.WORDS_NUM,
                                     embeddings_num=cfg.TEXT.CAPTIONS_PER_IMAGE)
            vocab = train_ds.vocab
        cap_pickle = gen_example_pickle(
            cfg.DATA_DIR, vocab, dataset=cfg.DATASET_NAME,
            no_stopwords=cfg.EVAL.NO_STOPWORD, only_color=cfg.EVAL.ONLY_COLOR)
        print("generated", cap_pickle)

    return TextExampleSRDataset(cfg.DATA_DIR, cap_pickle,
                                words_num=cfg.TEXT.WORDS_NUM,
                                imsize=cfg.imsize)


def resolve_netg_path(cfg, ckpt_dir: str) -> str:
    """Checkpoint resolution shared by the eval and calibration CLIs:
    the YAML's TRAIN.NET_G path, else `ckpt_dir`'s netG file."""
    netg_path = cfg.TRAIN.NET_G
    if not os.path.exists(netg_path) and ckpt_dir:
        netg_path = os.path.join(ckpt_dir, "netG_epoch_7.pth")
    if not os.path.exists(netg_path):
        raise SystemExit(f"netG checkpoint not found: {netg_path}")
    return netg_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="TGSR-TPU eval")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--data_dir", default="")
    parser.add_argument("--out_dir", default="./output_sr")
    parser.add_argument("--ckpt_dir", default="",
                        help="directory holding netG/netGH .pth files "
                             "(cfg.TRAIN.NET_G may instead point at a "
                             ".pth OR a cli.train_gan netG_it*.msgpack "
                             "snapshot — netGH paired by name either way)")
    parser.add_argument("--text_encoder", default="",
                        help="trained text-encoder weights (.pth or .msgpack)")
    parser.add_argument("--seeded-text", action="store_true",
                        help="force the seeded-init text encoder (the "
                             "parity protocol) instead of resolving "
                             "cfg NET_E / the shipped trained NET_E")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--no-bf16", dest="bf16", action="store_false")
    parser.add_argument("--manualSeed", type=int, default=100)  # test1.py:169
    parser.add_argument("--savefile", default="testset")
    parser.add_argument("--metrics", action="store_true",
                        help="also run the batched eval harness (on-device "
                             "degrade -> SR -> Y-PSNR/SSIM) and print JSON")
    parser.add_argument("--arbitrary", action="store_true",
                        help="native-geometry eval (= get_imgsexampletest, "
                             "datasets.py:200-278): each image keeps its own "
                             "size, cropped to scale multiples")
    parser.add_argument("--bucket", type=int, default=0,
                        help="with --arbitrary: pad LR sizes up to multiples "
                             "of BUCKET to bound the XLA compile count "
                             "(0 = exact native shapes)")
    parser.add_argument("--save_artifact", default="",
                        help="after building the (optionally int8) "
                             "pipeline, bundle it + the vocab into this "
                             "deployment dir (SRPipeline.save_artifact; "
                             "serve it with cli.serve --artifact)")
    parser.add_argument("--int8", action="store_true",
                        help="int8 quantized serving (engine/quant.py): "
                             "calibrates activation scales on the first "
                             "batch, then runs every generator conv in int8"
                             " (e2e PSNR-Y cost ~0.05 dB, docs/PERF.md)")
    parser.add_argument("--scales", default="",
                        help="precalibrated int8 scales JSON (tgsr-calibrate"
                             " output); implies int8 serving without the "
                             "batch-0 calibration pass")
    args = parser.parse_args(argv)
    if args.scales and args.int8:
        parser.error("--scales already selects int8; drop --int8 "
                     "(it would recalibrate on batch 0)")

    import jax.numpy as jnp
    from PIL import Image

    from tgsr_tpu.config import config_from_file, enable_compile_cache

    enable_compile_cache()
    from tgsr_tpu.data.pipeline import BatchLoader
    from tgsr_tpu.engine.inference import SRPipeline
    from tgsr_tpu.utils.visualize import build_super_images_all

    cfg = config_from_file(args.cfg_file)
    if args.data_dir:
        import dataclasses

        cfg = dataclasses.replace(cfg, DATA_DIR=args.data_dir)
    pprint.pprint(cfg)
    np.random.seed(args.manualSeed)

    ds = build_example_dataset(cfg)
    netg_path = resolve_netg_path(cfg, args.ckpt_dir)

    # NET_E resolution: flag > cfg NET_E > shipped trained NET_E > seeded
    # (the reference REQUIRES a trained NET_E, trainer_objective.py:62-67;
    # the snapshot ships none, so the rebuild ships its own)
    from tgsr_tpu.checkpoints.shipped import resolve_net_e

    net_e_path, net_e_src = resolve_net_e(
        cfg, args.text_encoder, ds.n_words, seeded=args.seeded_text)
    print(f"text encoder: {net_e_src}")

    pipe = SRPipeline.from_reference_checkpoints(
        cfg, ds.n_words, netg_path,
        text_encoder_path=net_e_path,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        return_attn=True,
        text_seed=args.manualSeed,
    )

    out_dir = os.path.join(args.out_dir, args.savefile)
    att_dir = os.path.join(out_dir, "att")
    os.makedirs(att_dir, exist_ok=True)

    loader = BatchLoader(ds, min(args.batch, len(ds)), shuffle=False,
                         drop_last=False, deterministic_captions=True)
    n_done = 0
    import jax

    from tgsr_tpu.ops.image import normalize_uint8, resize

    # one jitted degrade fn (shared with the calibration pass): eager ops
    # on the axon platform pay a remote-compile round trip per op
    @jax.jit
    def degrade(hr_uint8):
        return resize(normalize_uint8(hr_uint8),
                      (cfg.TREE.BASE_SIZE, cfg.TREE.BASE_SIZE), "bilinear")

    if args.int8 or args.scales:
        if args.scales:
            import json

            with open(args.scales) as f:
                scales = json.load(f)
            src = args.scales
        else:
            # calibrate on the first batch (opt-in serving mode;
            # engine/quant.py); tgsr-calibrate produces a more robust
            # multi-batch artifact for production use. The absmax
            # recording must run FULL precision (the scales describe the
            # unquantized activations — same contract as cli/calibrate):
            # `pipe` may be bf16, so calibrate on an f32 twin.
            cal = next(iter(loader.epoch(0)))
            cal_lr = degrade(jnp.asarray(cal["hr"]))
            pipe_f32 = SRPipeline(
                cfg, ds.n_words, pipe.variables["text"],
                pipe.variables["netg"], pipe.variables["netgh"],
                compute_dtype=jnp.float32)
            # full scales incl. image heads (the shipped default: int8 heads
            # measure faster once the producer GLU splits apply;
            # engine/quant.py)
            scales = pipe_f32.calibrate_quant(cal_lr, cal["captions"],
                                              cal["cap_lens"])
            src = "batch 0 (f32 pass)"
        pipe = SRPipeline(
            cfg, ds.n_words, pipe.variables["text"], pipe.variables["netg"],
            pipe.variables["netgh"],
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            return_attn=True, quant_scales=scales)
        print(f"int8 serving: {len(scales['netg'])}+"
              f"{len(scales['netgh'])} conv scales from {src}")

    if args.save_artifact:
        # deployment bundle: drop return_attn (this CLI's pipeline computes
        # attention for the grids; serving must not pay for it)
        pipe.save_artifact(args.save_artifact, vocab=ds.vocab,
                           return_attn=False)
        print(f"serving artifact -> {args.save_artifact}")

    if args.arbitrary:
        from tgsr_tpu.data.datasets import load_arbitrary_eval_image

        for i in range(min(len(ds), cfg.EVAL.TEXT_BATCH_NUM)):
            path = os.path.join(ds.data_dir, ds.image_subdir,
                                ds.filenames[i])
            if not os.path.exists(path):
                path = os.path.join(ds.data_dir, ds.filenames[i])
            if not os.path.exists(path):
                continue  # eval whatever images the snapshot actually ships
            lr, _ = load_arbitrary_eval_image(path, cfg.scale)
            toks, length = ds.get_caption(i)
            sr = pipe.sr_arbitrary(
                lr, toks[None].astype(np.int32),
                np.asarray([length], np.int32),
                bucket=args.bucket or None)
            stem = os.path.splitext(ds.filenames[i])[0]
            Image.fromarray(sr[0]).save(
                os.path.join(out_dir, f"{stem}_SR.png"))
            n_done += 1
        print(f"saved {n_done} native-geometry SR images to {out_dir} "
              f"({pipe._forward._cache_size()} compiled shapes)")
        return

    for batch in loader.epoch(0):
        lr = degrade(jnp.asarray(batch["hr"]))
        out = pipe(lr, batch["captions"], batch["cap_lens"])
        sr = np.asarray(out["sr"])
        sr8 = np.round(np.clip((sr + 1) * 127.5, 0, 255)).astype(np.uint8)
        attn0 = np.asarray(out["attn"][0])
        for j, key in enumerate(batch["keys"]):
            stem = os.path.splitext(key)[0]
            Image.fromarray(sr8[j]).save(
                os.path.join(out_dir, f"{stem}_SR.png"))
            # vis_size 256 = build_super_imagesall's default; the layout is
            # only self-consistent at 256 (miscc/utils.py:410 hardcodes it)
            grid, _ = build_super_images_all(
                sr8[j:j + 1], batch["captions"][j:j + 1],
                [batch["cap_lens"][j]], ds.vocab.ixtoword,
                attn0[j:j + 1])
            if grid is not None:
                Image.fromarray(grid).save(
                    os.path.join(att_dir, f"{stem}.png"))
            n_done += 1
        if n_done >= cfg.EVAL.TEXT_BATCH_NUM:
            break
    print(f"saved {n_done} SR images to {out_dir}")

    if args.metrics:
        import json

        from tgsr_tpu.engine.evaluator import evaluate_sr

        mloader = BatchLoader(ds, min(args.batch, len(ds)), shuffle=False,
                              drop_last=False, deterministic_captions=True)
        m = evaluate_sr(pipe, mloader.epoch(0),
                        max_images=cfg.EVAL.TEXT_BATCH_NUM)
        print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                          for k, v in m.items()}))


if __name__ == "__main__":
    main()
