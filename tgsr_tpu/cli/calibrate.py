"""Int8 calibration driver (tgsr-calibrate).

Productizes engine/quant.py's robust calibration recipe (docs/PERF.md
"Calibration robustness"): run the full-precision pipeline over one
canonical batch plus augmented batches (varied crops/flips + noise) from
the eval dataset, take the pointwise max of the recorded per-conv absmax
scales (`merge_scales`), gate the resulting int8 pipeline's fidelity
against the f32 output, and write the scales JSON that
`SRPipeline(quant_scales=...)`, `cli.test --scales`, and
`save_artifact` consume.

The reference has no quantized serving at all (its eval path is the f32
per-image loop, trainer_objective.py:55-165); the artifact convention
mirrors the shipped checkpoints/face_s8_int8_scales.json.

Usage:
  tgsr-calibrate --cfg cfg/eval_faceSR_attn2.yml \
      --data_dir /root/reference/data/face \
      --ckpt_dir /root/reference/Checkpoint/face_S8 \
      --out face_scales.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def augmented_lr_batch(hr_uint8: np.ndarray, base_size: int, rng,
                       noise: float = 0.02) -> np.ndarray:
    """Varied-view LR batch from an HR uint8 batch [B,H,W,3]: per-image
    random crop (0.6-1.0 of the short side) + horizontal flip + bicubic
    resize to base_size + gaussian noise, normalized to [-1,1]. This is
    the round-2 robustness recipe: 36/40 of the shipped face scales grew
    >2% under it vs the canonical batch alone (docs/PERF.md)."""
    from PIL import Image

    B = hr_uint8.shape[0]
    lr = np.empty((B, base_size, base_size, 3), np.float32)
    for i in range(B):
        img = Image.fromarray(hr_uint8[i])
        w, h = img.size
        cw = ch = max(base_size, int(min(w, h) * rng.uniform(0.6, 1.0)))
        left = int(rng.integers(0, max(w - cw, 0) + 1))
        top = int(rng.integers(0, max(h - ch, 0) + 1))
        img = img.crop((left, top, left + cw, top + ch))
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        a = np.asarray(img.resize((base_size, base_size), Image.BICUBIC),
                       np.float32) / 127.5 - 1.0
        lr[i] = np.clip(a + rng.normal(0, noise, a.shape), -1.0, 1.0)
    return lr


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Calibrate int8 serving scales for a TGSR checkpoint")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--data_dir", default="")
    parser.add_argument("--ckpt_dir", default="",
                        help="directory holding netG/netGH files when the "
                             "YAML's TRAIN.NET_G path doesn't exist")
    parser.add_argument("--seeded-text", action="store_true",
                        help="force the seeded-init text encoder (parity "
                             "protocol) instead of cfg NET_E / the "
                             "shipped trained NET_E")
    parser.add_argument("--text_encoder", default="",
                        help="trained text-encoder weights (.pth/.msgpack); "
                             "default = the seeded-init convention")
    parser.add_argument("--out", required=True,
                        help="where to write the scales JSON")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--batches", type=int, default=2,
                        help="total calibration batches: 1 canonical + N-1 "
                             "augmented (crops/flips/noise)")
    parser.add_argument("--margin", type=float, default=1.1,
                        help="headroom factor on recorded absmax scales")
    parser.add_argument("--gate_db", type=float, default=35.0,
                        help="minimum int8-vs-f32 output PSNR; the JSON is "
                             "only written when the gate passes (0 disables)")
    parser.add_argument("--no-heads", dest="heads", action="store_false",
                        help="keep the 3-channel image heads in bf16 "
                             "(higher fidelity, ~4%% slower; docs/PERF.md "
                             "'Int8 image heads')")
    parser.add_argument("--seed", type=int, default=0,
                        help="augmentation rng seed (views only)")
    parser.add_argument("--text_seed", type=int, default=100,
                        help="seeded-init text encoder key when no "
                             "--text_encoder is given — MUST match the "
                             "serving pipeline's (cli.test --manualSeed / "
                             "from_reference_checkpoints text_seed, both "
                             "default 100), or the recorded scales "
                             "describe activations serving never sees")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tgsr_tpu.config import config_from_file, enable_compile_cache

    enable_compile_cache()
    from tgsr_tpu.cli.test import build_example_dataset, resolve_netg_path
    from tgsr_tpu.data.pipeline import BatchLoader
    from tgsr_tpu.engine.inference import SRPipeline
    from tgsr_tpu.engine.quant import drop_head_scales, merge_scales
    from tgsr_tpu.ops.image import normalize_uint8, resize

    cfg = config_from_file(args.cfg_file)
    if args.data_dir:
        import dataclasses

        cfg = dataclasses.replace(cfg, DATA_DIR=args.data_dir)
    rng = np.random.default_rng(args.seed)

    ds = build_example_dataset(cfg)
    netg_path = resolve_netg_path(cfg, args.ckpt_dir)

    # calibration runs the FULL-PRECISION pipeline (the recorded absmaxes
    # must describe the unquantized activations), with the SAME text
    # encoder the serving CLIs will resolve (word embeddings feed the
    # attention path, so the NET_E choice shifts activation ranges)
    from tgsr_tpu.checkpoints.shipped import resolve_net_e

    net_e_path, net_e_src = resolve_net_e(
        cfg, args.text_encoder, ds.n_words, seeded=args.seeded_text)
    print(f"text encoder: {net_e_src}")
    pipe = SRPipeline.from_reference_checkpoints(
        cfg, ds.n_words, netg_path,
        text_encoder_path=net_e_path,
        compute_dtype=jnp.float32, text_seed=args.text_seed)

    loader = BatchLoader(ds, min(args.batch, len(ds)), shuffle=False,
                         drop_last=False, deterministic_captions=True)
    # advance the loader across --batches: each view covers DIFFERENT
    # images when the dataset has them (cycling when it doesn't), with
    # the canonical (un-augmented) degrade only on the first
    batches = []
    for b in loader.epoch(0):
        batches.append(b)
        if len(batches) >= max(args.batches, 1):
            break
    batch = batches[0]
    base = cfg.TREE.BASE_SIZE

    degrade = jax.jit(lambda h: resize(normalize_uint8(h), (base, base),
                                       "bilinear"))
    lr0 = np.asarray(degrade(jnp.asarray(batch["hr"])))
    views = [(lr0, batch["captions"], batch["cap_lens"])]
    for i in range(1, max(args.batches, 1)):
        src = batches[i % len(batches)]
        views.append((augmented_lr_batch(np.asarray(src["hr"]), base, rng),
                      src["captions"], src["cap_lens"]))

    per_view = [pipe.calibrate_quant(lr, caps, lens, margin=args.margin)
                for lr, caps, lens in views]
    scales = {g: merge_scales(*(v[g] for v in per_view))
              for g in per_view[0]}
    if not args.heads:
        scales = drop_head_scales(scales)
    n = sum(len(v) for v in scales.values())
    # compare only keys the canonical view recorded: a conv seen solely in
    # augmented views has no canonical baseline and would always count
    grown = sum(
        1 for g in scales for k in scales[g]
        if len(per_view) > 1 and k in per_view[0][g]
        and scales[g][k] > per_view[0][g][k] * 1.02
    )
    print(f"calibrated {n} conv scales over {len(views)} batches "
          f"({grown} grew >2% beyond the canonical batch)")

    # fidelity gate: int8 (bf16 compute, as served) vs the f32 output
    pipe_i8 = SRPipeline(
        cfg, ds.n_words, pipe.variables["text"], pipe.variables["netg"],
        pipe.variables["netgh"], compute_dtype=jnp.bfloat16,
        quant_scales=scales)
    nfid = min(4, lr0.shape[0])
    out_f32 = np.asarray(pipe(lr0[:nfid], batch["captions"][:nfid],
                              batch["cap_lens"][:nfid])["sr"], np.float32)
    out_i8 = np.asarray(pipe_i8(lr0[:nfid], batch["captions"][:nfid],
                                batch["cap_lens"][:nfid])["sr"], np.float32)
    rmse = float(np.sqrt(np.mean((out_f32 - out_i8) ** 2))) * 127.5
    psnr = 20 * np.log10(255.0 / max(rmse, 1e-9))
    ok = psnr >= args.gate_db
    print(f"int8 vs f32: rmse {rmse:.3f}/255, psnr {psnr:.1f} dB "
          f"({'PASS' if ok else 'FAIL'} >= {args.gate_db}; gate measured "
          "at bf16+int8 — conservative vs cli.test's default f32 serve)")
    if not ok:
        raise SystemExit(f"fidelity gate failed ({psnr:.1f} < "
                         f"{args.gate_db} dB): not writing {args.out}; "
                         "widen --margin, try --no-heads, or lower "
                         "--gate_db if this fidelity is acceptable")
    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)
    from tgsr_tpu.engine.quant import SCALES_META_KEY, weights_fingerprint

    # provenance: bind the artifact to the calibrated checkpoint so a
    # different-weights load refuses instead of silently mis-clipping
    # (engine.quant.check_scales verifies on every SRPipeline construction)
    meta = {
        "weights_fingerprint": weights_fingerprint(
            pipe.variables["netg"], pipe.variables["netgh"]),
        "checkpoint": os.path.basename(netg_path),
        "text_encoder": (os.path.basename(net_e_path) if net_e_path
                         else net_e_src),
        "calibration": f"{len(views)} views, margin {args.margin}",
        "gate_db": round(psnr, 2),
        "gate_protocol": "bf16+int8 vs f32 (conservative)",
    }
    with open(args.out, "w") as f:
        json.dump({**scales, SCALES_META_KEY: meta}, f, indent=1,
                  sort_keys=True)
    print(f"saved {args.out} (serve with cli.test --scales / "
          "SRPipeline(quant_scales=...))")


if __name__ == "__main__":
    main()
