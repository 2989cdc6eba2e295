#!/usr/bin/env python
"""Minimal end-to-end demo: x8 text-guided face SR with the reference
checkpoints. The canonical 'drive the framework' script (see
.claude/skills/verify).

  python examples/run_face_sr.py [--out /tmp/demo_sr.png] [--cpu]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/demo_sr.png")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--ref", default=REF)
    p.add_argument("--seeded-text", action="store_true",
                   help="seeded-init text encoder (the parity protocol) "
                        "instead of the shipped trained NET_E")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.engine.inference import SRPipeline

    cfg = config_from_file(os.path.join(args.ref, "cfg/eval_faceSR_attn2.yml"))
    with open(os.path.join(args.ref, "data/face/testset.pickle"), "rb") as f:
        caps, ixtoword, wordtoix = pickle.load(f)

    img = Image.open(os.path.join(args.ref, "data/face/000155.png")).convert("RGB")
    lr = np.asarray(img.resize((32, 32), Image.BICUBIC), np.float32) / 127.5 - 1

    T = cfg.TEXT.WORDS_NUM
    tok = np.zeros((1, T), np.int32)
    L = min(len(caps[0]), T)
    tok[0, :L] = caps[0][:L]
    lens = np.asarray([L], np.int32)
    print("caption:", " ".join(ixtoword[t] for t in caps[0][:L]))

    # same NET_E resolution as cli.test/cli.serve: the shipped trained
    # face NET_E when available, else the seeded parity protocol
    from tgsr_tpu.checkpoints.shipped import resolve_net_e

    net_e_path, net_e_src = resolve_net_e(
        cfg, "", len(ixtoword), seeded=args.seeded_text)
    print("text encoder:", net_e_src)

    pipe = SRPipeline.from_reference_checkpoints(
        cfg, len(ixtoword),
        os.path.join(args.ref, "Checkpoint/face_S8/netG_epoch_7.pth"),
        text_encoder_path=net_e_path,
        compute_dtype=jnp.bfloat16,
    )
    sr8 = pipe.sr_uint8(lr[None], tok, lens)
    Image.fromarray(sr8[0]).save(args.out)
    print(f"32x32 -> {sr8.shape[1]}x{sr8.shape[2]} SR written to {args.out}")


if __name__ == "__main__":
    main()
