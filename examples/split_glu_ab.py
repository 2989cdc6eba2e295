#!/usr/bin/env python
"""A/B: selective GLU value/gate conv split (engine/quant.py
SPLIT_GLU_INT8_CONSUMERS) vs single-conv UpBlocks, e2e int8 serving scan.

Round-3 context (docs/PERF.md "Serving design-space closure"): splitting
EVERY UpBlock regressed e2e (3808 vs 3911 img/s) because GLU outputs
feeding bf16 image heads were free conv-input fusions. The isolated
GLU+requantize pass runs 2.6x faster on two separate buffers
(examples/glu_pass_probe.py), so the split should pay only where the
consumer is another int8 conv. This measures that hypothesis e2e with
alternating A/B timing in one process.

--x16: same A/B on the x16 family (fixed-seed init, shipped
x16_int8_scales.json, 32->512 geometry) — the split set's keys
(upscale2x/4x, h_net1/2 upsample) also name x16 modules, so the default
must be validated per family, not assumed to transfer.
"""

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_face_s8():
    """(cfg, pipeline factory, LR size) for the shipped face_S8 x8 ckpt."""
    import jax.numpy as jnp

    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.engine import quant
    from tgsr_tpu.engine.inference import SRPipeline

    ref = "/root/reference"
    cfg = config_from_file(os.path.join(ref, "cfg/eval_faceSR_attn2.yml"))
    with open(os.path.join(ref, "data/face/testset.pickle"), "rb") as f:
        caps, ixtoword, _ = pickle.load(f)
    vocab = len(ixtoword)

    def make(heads=False):
        return SRPipeline.from_reference_checkpoints(
            cfg, vocab,
            os.path.join(ref, "Checkpoint/face_S8/netG_epoch_7.pth"),
            compute_dtype=jnp.bfloat16,
            quant_scales=quant.face_s8_scales(heads=heads))

    return cfg, make, 32


def build_x16():
    """x16 family at the x16_bench convention: seed-0 init + shipped scales
    (no upstream x16 checkpoint exists — documented gap)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tgsr_tpu.config import Config
    from tgsr_tpu.engine import quant
    from tgsr_tpu.engine.inference import SRPipeline
    from tgsr_tpu.models.models16 import GSRNetLow16, NetGHighWeight16
    from tgsr_tpu.models.text_encoder import TextEncoder

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, METHOD="S16",
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=5, BASE_SIZE=32),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=32))
    vocab, T = 41, cfg.TEXT.WORDS_NUM
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps0 = jnp.ones((2, T), jnp.int32)
    lens0 = jnp.full((2,), 6, jnp.int32)
    tv = enc.init(k, caps0, lens0)
    words, sent = enc.apply(tv, caps0, lens0)
    lr0 = jnp.zeros((2, 32, 32, 3))
    netg = GSRNetLow16(ngf=32, c_dim=cfg.GAN.CONDITION_DIM)
    gv = netg.init(k, lr0, sent, words, caps0 == 0)
    fake, *_ = netg.apply(gv, lr0, sent, words, caps0 == 0)
    netgh = NetGHighWeight16(ngf=32, low="lr",
                             sizes=tuple(cfg.pyramid_sizes()))
    ghv = netgh.init(k, lr0, fake, lr0)
    def make(heads=False):
        return SRPipeline(cfg, vocab, tv, gv, ghv,
                          compute_dtype=jnp.bfloat16,
                          quant_scales=quant.x16_scales(heads=heads))

    return cfg, make, 32


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tgsr_tpu.engine import quant

    p = argparse.ArgumentParser()
    p.add_argument("--x16", action="store_true")
    p.add_argument("--bm", default=None,
                   help="B,M override (defaults: 768,64 x8 / 192,16 x16)")
    p.add_argument("--res", action="store_true",
                   help="A/B the ResBlock/_ResidualSeq conv1 split "
                        "(SPLIT_RES_GLU_SITES) instead; both variants keep "
                        "the shipped UpBlock split")
    p.add_argument("--heads", action="store_true",
                   help="A/B int8 image heads + head-feeding UpBlock "
                        "splits (h_net3/upsample, upscale8x) against the "
                        "shipped bf16-heads config. With the producer "
                        "UpBlocks split, the standalone GLU+requantize "
                        "pass that made int8 heads lose in round 2 no "
                        "longer exists — and the profile shows the bf16 "
                        "heads reading their 256px inputs at only "
                        "~300-390 GiB/s (22%% of device time)")
    p.add_argument("--fusedup", default=None,
                   help="A/B the algebraic int8 upsample-conv fusion "
                        "(quant.FUSED_UP_SITES) against the shipped "
                        "config. Value: comma-separated site keys, or "
                        "'all' (= every quantized UpBlock), or 'big' "
                        "(= the two 256px sites with materialized s8 "
                        "broadcasts: h_net3/upsample, upscale8x)")
    p.add_argument("--res-set", default="all",
                   choices=["sub", "all"],
                   help="res-split site set: all (= the shipped "
                        "SPLIT_RES_GLU_SITES, incl. 32px blocks; measured "
                        "4662 img/s) or sub (64/128px only; 4607)")
    args = p.parse_args()

    ref = "/root/reference"
    cfg, make_pipe, lr_size = (build_x16 if args.x16 else build_face_s8)()
    T = cfg.TEXT.WORDS_NUM

    img = Image.open(os.path.join(ref, "data/face/000155.png")).convert("RGB")
    lr1 = np.asarray(img.resize((lr_size, lr_size), Image.BICUBIC),
                     np.float32) / 127.5 - 1.0

    if args.x16:
        rng0 = np.random.default_rng(1)
        n_caps = 64
        tok = np.zeros((n_caps, T), np.int32)
        lens = rng0.integers(4, 15, n_caps).astype(np.int32)
        for i in range(n_caps):
            tok[i, : lens[i]] = rng0.integers(1, 41, lens[i])
    else:
        with open(os.path.join(ref, "data/face/testset.pickle"), "rb") as f:
            caps, ixtoword, _ = pickle.load(f)
        n_caps = len(caps)
        tok = np.zeros((n_caps, T), np.int32)
        lens = np.zeros((n_caps,), np.int32)
        for i, c in enumerate(caps):
            L = min(len(c), T)
            tok[i, :L] = c[:L]
            lens[i] = L

    B, M = (192, 16) if args.x16 else (768, 64)
    if args.bm:
        B, M = (int(v) for v in args.bm.split(","))
    reps = int(np.ceil(B * M / n_caps))
    tokB = jax.device_put(np.tile(tok, (reps, 1))[: B * M].reshape(M, B, T))
    lensB = jax.device_put(np.tile(lens, reps)[: B * M].reshape(M, B))
    rng = np.random.default_rng(0)
    lrB = jax.device_put(
        (np.broadcast_to(lr1, (M, B, lr_size, lr_size, 3))
         + rng.normal(0, 0.01, (M, B, lr_size, lr_size, 3)))
        .astype(np.float32))

    shipped = quant.SPLIT_GLU_INT8_CONSUMERS
    res_64_128 = frozenset({
        "h_net2/residual_0", "h_net2/residual_1",
        "h_net3/residual_0", "h_net3/residual_1",
        "residual24", "residual48",
    })
    res_sites = res_64_128 if args.res_set == "sub" \
        else quant.SPLIT_RES_GLU_SITES

    heads_split = shipped | frozenset(
        {"h_net3/upsample/conv", "upscale8x/conv", "upscale16x/conv"})

    fused_sets = {
        "all": frozenset({
            "h_net1/upsample/conv", "h_net2/upsample/conv",
            "h_net3/upsample/conv", "upscale2x/conv", "upscale4x/conv",
            "upscale8x/conv", "upscale16x/conv"}),
        "big": frozenset({"h_net3/upsample/conv", "upscale8x/conv",
                          "upscale16x/conv"}),
    }

    def build(split):
        heads = False
        if args.fusedup:
            # treatment: shipped config + fused upsample-conv at the chosen
            # sites; control: the shipped config exactly
            heads = True
            fused = fused_sets.get(
                args.fusedup, frozenset(args.fusedup.split(","))) \
                if split else frozenset()
            saved_f = quant.FUSED_UP_SITES
            quant.FUSED_UP_SITES = fused
            try:
                pipe = make_pipe(heads=True)
                scan, _ = pipe.checksum_fns()
                float(scan(pipe.variables, lrB, tokB, lensB, 0.0))
                return pipe, scan
            finally:
                quant.FUSED_UP_SITES = saved_f
        if args.heads:
            # treatment: int8 heads + their producer UpBlocks split (the
            # shipped default since the round-3 flip); control: the legacy
            # bf16-heads config (drop_head_scales equivalent)
            heads = split
            quant_split = heads_split if split else shipped
            res_split = quant.SPLIT_RES_GLU_SITES
        elif args.res:
            quant_split, res_split = shipped, (res_sites if split
                                               else frozenset())
        else:
            quant_split, res_split = (shipped if split else frozenset(),
                                      frozenset())
        saved = quant.SPLIT_GLU_INT8_CONSUMERS
        saved_res = quant.SPLIT_RES_GLU_SITES
        quant.SPLIT_GLU_INT8_CONSUMERS = quant_split
        quant.SPLIT_RES_GLU_SITES = res_split
        try:
            pipe = make_pipe(heads=heads)
            scan, _ = pipe.checksum_fns()
            # trace now, while the monkeypatch is live
            float(scan(pipe.variables, lrB, tokB, lensB, 0.0))
            return pipe, scan
        finally:
            quant.SPLIT_GLU_INT8_CONSUMERS = saved
            quant.SPLIT_RES_GLU_SITES = saved_res

    print("tracing split variant...", flush=True)
    pipe_a, scan_a = build(True)
    print("tracing no-split variant...", flush=True)
    pipe_b, scan_b = build(False)

    salt = 1.0
    res = {"split": [], "nosplit": []}
    for rnd in range(6):
        for name, pipe, scan in (("split", pipe_a, scan_a),
                                 ("nosplit", pipe_b, scan_b)):
            t0 = time.perf_counter()
            float(scan(pipe.variables, lrB, tokB, lensB, salt))
            dt = time.perf_counter() - t0
            salt += 1.0
            ips = B * M / dt
            res[name].append(ips)
            print(f"round {rnd} {name:8s} {ips:8.0f} img/s", flush=True)

    for name, v in res.items():
        v = sorted(v)[1:-1]  # trim extremes
        print(f"{name:8s} trimmed-mean {np.mean(v):8.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
