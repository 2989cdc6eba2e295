"""Torch export entry point: this framework's msgpack snapshots ->
reference-loadable .pth checkpoints (checkpoints/export_torch.py).

The migration path BACK to the original stack: weights trained by
cli.train_gan / cli.pretrain_damsm become state dicts the reference's
torch modules load with strict=True under its own naming conventions
(netG/netGH pairing trainer_objective.py:91-93; text_encoder/
image_encoder pairing pretrain_DAMSM.py:177-179).

Usage:
  python -m tgsr_tpu.cli.export_torch --cfg train_faceSR_S8.yml \
      --netg models/netG_it500.msgpack --out exported/
  python -m tgsr_tpu.cli.export_torch \
      --text_encoder models/text_encoder5.msgpack --out exported/
"""

from __future__ import annotations

import argparse
import os


def _pth_name(msgpack_path: str) -> str:
    base = os.path.basename(msgpack_path)
    root, ext = os.path.splitext(base)
    return root + ".pth"


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export msgpack snapshots to reference .pth checkpoints")
    parser.add_argument("--cfg", dest="cfg_file", default="",
                        help="training/eval YAML (required with --netg: "
                             "selects the x8/x16 family via TREE.BRANCH_NUM "
                             "and the weightmap flag via EVAL.WEIGHTMAP)")
    parser.add_argument("--netg", default="",
                        help="netG_it*.msgpack (the paired netGH_it* file "
                             "is resolved alongside, or pass --netgh)")
    parser.add_argument("--netgh", default="")
    parser.add_argument("--text_encoder", default="",
                        help="text_encoder<N>.msgpack (the paired "
                             "image_encoder<N> file exports too when "
                             "present)")
    parser.add_argument("--out", required=True, help="output directory")
    args = parser.parse_args(argv)

    if not (args.netg or args.text_encoder):
        raise SystemExit("pass --netg and/or --text_encoder")

    from tgsr_tpu.checkpoints.convert_torch import paired_path
    from tgsr_tpu.checkpoints.export_torch import (
        export_cnn_encoder,
        export_netg_low,
        export_netg_low16,
        export_netgh_weight,
        export_netgh_weight16,
        export_text_encoder,
        save_torch,
    )
    from tgsr_tpu.checkpoints.io import load_variables

    os.makedirs(args.out, exist_ok=True)
    written = []

    if args.netg:
        if not args.cfg_file:
            raise SystemExit("--netg needs --cfg to select the "
                             "x8/x16 family (TREE.BRANCH_NUM)")
        from tgsr_tpu.config import config_from_file

        cfg = config_from_file(args.cfg_file)
        netgh_path = args.netgh or paired_path(args.netg, "netG", "netGH")
        gv = load_variables(args.netg)
        ghv = load_variables(netgh_path)
        wm = cfg.EVAL.WEIGHTMAP
        if cfg.TREE.BRANCH_NUM == 4:
            g_sd = export_netg_low(gv, n_stages=cfg.n_stages)
            gh_sd = export_netgh_weight(ghv, weightmap=wm)
        else:
            g_sd = export_netg_low16(gv)
            gh_sd = export_netgh_weight16(ghv, weightmap=wm)
        for sd, src in ((g_sd, args.netg), (gh_sd, netgh_path)):
            dst = os.path.join(args.out, _pth_name(src))
            save_torch(sd, dst)
            written.append(dst)

    if args.text_encoder:
        tv = load_variables(args.text_encoder)
        dst = os.path.join(args.out, _pth_name(args.text_encoder))
        save_torch(export_text_encoder(tv), dst)
        written.append(dst)
        img_path = paired_path(args.text_encoder,
                               "text_encoder", "image_encoder")
        if os.path.exists(img_path):
            iv = load_variables(img_path)
            if "inception" in iv["params"]:
                dst = os.path.join(args.out, _pth_name(img_path))
                save_torch(export_cnn_encoder(iv), dst)
                written.append(dst)
            else:
                # --simple-cnn snapshots (the no-zoo default mode) have no
                # reference torch module to export to; the text encoder
                # still exports
                print(f"skipping {img_path}: SimpleCNNEncoder snapshot "
                      f"has no reference torch counterpart")

    for p in written:
        print(f"exported {p}")


if __name__ == "__main__":
    main()
