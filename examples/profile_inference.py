#!/usr/bin/env python
"""Profile the x8 SR inference hot path on the TPU and print top HLO ops.

Captures a jax.profiler trace of the bench's scan-of-microbatches program
(real face_S8 checkpoints, bf16) and parses the xplane with xprof/
tensorboard_plugin_profile into an HLO-op self-time table — the data
behind docs/PERF.md's "where the time goes".

Usage: python examples/profile_inference.py [B] [M] [iters] [int8] [x16]
(`int8` anywhere in argv profiles the quantized serving config instead —
shipped face_S8 scales, int8 heads, value/gate splits; `x16` profiles
the models16 family at 32->512 with the seed-0 init + shipped
x16_int8_scales, the same convention as examples/x16_bench.py.)
"""

import glob
import os
import pickle
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if a not in ("int8", "x16")]
    int8 = "int8" in sys.argv[1:]
    x16 = "x16" in sys.argv[1:]
    B = int(args[0]) if len(args) > 0 else (256 if x16 else 512)
    M = int(args[1]) if len(args) > 1 else 2
    iters = int(args[2]) if len(args) > 2 else 2

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.engine.inference import SRPipeline

    ref = "/root/reference"
    cfg = config_from_file(os.path.join(ref, "cfg/eval_faceSR_attn2.yml"))
    with open(os.path.join(ref, "data/face/testset.pickle"), "rb") as f:
        caps, ixtoword, _ = pickle.load(f)
    vocab = len(ixtoword)
    img = Image.open(os.path.join(ref, "data/face/000155.png")).convert("RGB")
    lr1 = np.asarray(img.resize((32, 32), Image.BICUBIC),
                     np.float32) / 127.5 - 1.0

    T = cfg.TEXT.WORDS_NUM
    tok = np.zeros((len(caps), T), np.int32)
    lens = np.zeros((len(caps),), np.int32)
    for i, c in enumerate(caps):
        L = min(len(c), T)
        tok[i, :L] = c[:L]
        lens[i] = L

    scales = None
    if x16:
        # models16 at its real 32->512 geometry, seed-0 init (no upstream
        # x16 checkpoint exists) + shipped calibration artifact — the
        # x16_bench.py convention
        import dataclasses

        from tgsr_tpu.models.models16 import GSRNetLow16, NetGHighWeight16
        from tgsr_tpu.models.text_encoder import TextEncoder

        cfg = dataclasses.replace(
            cfg, METHOD="S16",
            TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=5, BASE_SIZE=32),
            GAN=dataclasses.replace(cfg.GAN, GF_DIM=32))
        if int8:
            from tgsr_tpu.engine import quant

            scales = quant.x16_scales()
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
        pipe = SRPipeline(cfg, vocab, tv, gv, ghv,
                          compute_dtype=jnp.bfloat16, quant_scales=scales)
    else:
        if int8:
            from tgsr_tpu.engine import quant

            scales = quant.face_s8_scales()
        pipe = SRPipeline.from_reference_checkpoints(
            cfg, vocab,
            os.path.join(ref, "Checkpoint/face_S8/netG_epoch_7.pth"),
            compute_dtype=jnp.bfloat16, quant_scales=scales)

    scan_checksum, _ = pipe.checksum_fns()

    rng = np.random.default_rng(0)
    reps = int(np.ceil(B * M / len(caps)))
    tokB = jax.device_put(np.tile(tok, (reps, 1))[:B * M].reshape(M, B, T))
    lensB = jax.device_put(np.tile(lens, reps)[:B * M].reshape(M, B))
    lrB = jax.device_put(
        (np.broadcast_to(lr1, (M, B, 32, 32, 3))
         + rng.normal(0, 0.01, (M, B, 32, 32, 3))).astype(np.float32))

    print(f"[profile] warmup B={B} M={M}", file=sys.stderr)
    float(scan_checksum(pipe.variables, lrB, tokB, lensB, 0.0))

    logdir = tempfile.mkdtemp(prefix="sr_prof_")
    jax.profiler.start_trace(logdir)
    for i in range(iters):
        float(scan_checksum(pipe.variables, lrB, tokB, lensB, float(i + 1)))
    jax.profiler.stop_trace()
    print(f"[profile] trace in {logdir}", file=sys.stderr)

    print_op_table(logdir, n_images=B * M * iters)


def print_op_table(logdir, n_images=None, top=25):
    from xprof.convert import raw_to_tool_data as rttd

    xplanes = glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb"))
    assert xplanes, f"no xplane under {logdir}"
    data, _ = rttd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    import json
    tab = json.loads(data.decode() if isinstance(data, bytes) else data)
    ids = [c["id"] for c in tab["cols"]]

    def get(row, cid):
        v = row["c"][ids.index(cid)]
        return v.get("v") if v else None

    recs = []
    for row in tab["rows"]:
        recs.append({
            "cat": get(row, "category"),
            "name": get(row, "hlo_op_name") or "",
            "self_us": float(get(row, "total_self_time") or 0),
            "occ": int(get(row, "occurrences") or 0),
            "bw": get(row, "measured_memory_bw"),
            "gflops": get(row, "model_flop_rate"),
            "bound": get(row, "bound_by") or get(row, "roofline_efficiency"),
        })
    recs.sort(key=lambda r: -r["self_us"])
    total_us = sum(r["self_us"] for r in recs)
    print(f"\ntotal device self time: {total_us/1e3:.1f} ms"
          + (f"  ({total_us/n_images:.1f} us/img)" if n_images else ""))
    print(f"{'self ms':>9} {'%':>5} {'occ':>5} {'GiB/s':>7} "
          f"{'GFLOP/s':>8}  {'category':<18} name")
    for r in recs[:top]:
        bw = f"{float(r['bw']):7.1f}" if r["bw"] not in (None, "") else "      -"
        gf = (f"{float(r['gflops']):8.0f}"
              if r["gflops"] not in (None, "") else "       -")
        print(f"{r['self_us']/1e3:9.2f} {r['self_us']/total_us*100:5.1f} "
              f"{r['occ']:5d} {bw} {gf}  {str(r['cat'])[:18]:<18} "
              f"{r['name'][:60]}")
    return recs


if __name__ == "__main__":
    main()
