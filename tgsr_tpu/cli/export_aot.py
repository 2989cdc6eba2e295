"""AOT export entry point: deployment bundle / checkpoints -> compiled
serving artifact (engine.aot.export_serving).

The output directory is self-contained for the compute: a serving host
runs it with jax alone (cli.serve --aot <dir> --vocab_pickle <pickle>).
The reference has no deployment packaging at all (its eval driver
re-instantiates modules from source + .pth, trainer_objective.py:62-99).

Usage:
  python -m tgsr_tpu.cli.export_aot --artifact bundle/ --out aot/ \
      [--batch N] [--lr_size S] [--float] [--platforms tpu,cpu]
  python -m tgsr_tpu.cli.export_aot --cfg eval_faceSR_attn2.yml \
      --netg netG_epoch_7.pth --out aot/ [--int8]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export an AOT-compiled SR serving artifact")
    parser.add_argument("--artifact", default="",
                        help="SRPipeline.save_artifact bundle to export "
                             "(carries config/weights/quant scales)")
    parser.add_argument("--cfg", dest="cfg_file", default="")
    parser.add_argument("--netg", default="",
                        help="reference netG_epoch_*.pth (netGH resolved "
                             "alongside); alternative to --artifact")
    parser.add_argument("--text_encoder", default="")
    parser.add_argument("--vocab_pickle", default="",
                        help="with --cfg/--netg: derive the text-encoder "
                             "vocab size from this pickle (default: the "
                             "face testset's 41-token vocabulary)")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--batch", type=int, default=0,
                        help="pin the batch size (default: symbolic — one "
                             "artifact serves any batch size)")
    parser.add_argument("--lr_size", type=int, default=0,
                        help="LR spatial size (default cfg.TREE.BASE_SIZE)")
    parser.add_argument("--float", dest="float_out", action="store_true",
                        help="emit float32 [-1,1] instead of the uint8 "
                             "save-path postprocess")
    parser.add_argument("--platforms", default="",
                        help="comma-separated lowering platforms (e.g. "
                             "'tpu,cpu'); default = current backend")
    parser.add_argument("--int8", action="store_true",
                        help="with --cfg/--netg: bake the shipped int8 "
                             "scales (artifact bundles carry their own)")
    parser.add_argument("--f32", action="store_true",
                        help="full f32 compute (default bf16 for "
                             "--cfg/--netg; bundles keep their own dtype)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from tgsr_tpu.config import config_from_file, enable_compile_cache

    enable_compile_cache()
    from tgsr_tpu.engine.aot import export_serving
    from tgsr_tpu.engine.inference import SRPipeline

    if args.artifact:
        # same override semantics as cli.serve: --int8 requires bundled
        # scales, --f32 forces full precision (quant off), default keeps
        # the bundle's own configuration
        pipe, _ = SRPipeline.load_artifact(
            args.artifact,
            compute_dtype=jnp.float32 if args.f32 else None,
            use_quant=True if args.int8 else False if args.f32 else None)
    else:
        if not (args.cfg_file and args.netg):
            raise SystemExit("pass --artifact OR --cfg + --netg")
        cfg = config_from_file(args.cfg_file)
        quant = None
        if args.int8:
            from tgsr_tpu.engine.quant import face_s8_scales, x16_scales

            quant = (face_s8_scales() if cfg.TREE.BRANCH_NUM == 4
                     else x16_scales())
        if args.vocab_pickle:
            from tgsr_tpu.cli.eval_rank import load_vocab

            n_words = load_vocab(args.vocab_pickle).n_words
        else:
            # the face testset pickle's 41-token vocabulary — the only
            # vocab the shipped reference weights pair with (PARITY.md)
            n_words = 41
        pipe = SRPipeline.from_reference_checkpoints(
            cfg, n_words, args.netg,
            text_encoder_path=args.text_encoder or None,
            compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            quant_scales=quant)

    out = export_serving(
        pipe, args.out,
        batch_size=args.batch or None,
        lr_size=args.lr_size or None,
        uint8=not args.float_out,
        platforms=[p for p in args.platforms.split(",") if p] or None)
    import json
    import os

    meta = json.load(open(os.path.join(out, "meta.json")))
    print(f"exported {out}: batch={meta['batch']} lr={meta['lr_size']} "
          f"sr={meta['sr_size']} uint8={meta['uint8']} "
          f"platforms={meta['platforms']} quantized={meta['quantized']}")


if __name__ == "__main__":
    main()
