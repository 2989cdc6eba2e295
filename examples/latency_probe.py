#!/usr/bin/env python
"""Single-image latency decomposition (docs/PERF.md).

The p50 single-image number on this dev stack bundles per-dispatch tunnel
overhead with device compute. This probe separates them: time a jit that
CHAINS K dependent single-image forwards (lax.scan, each iteration salted
from the carry so nothing folds away) for K=1 and K=32; then

    t(K) = dispatch_overhead + K * device_time_per_image

  python examples/latency_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    import pickle

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.engine.inference import SRPipeline

    cfg = config_from_file(os.path.join(REF, "cfg/eval_faceSR_attn2.yml"))
    with open(os.path.join(REF, "data/face/testset.pickle"), "rb") as f:
        caps, ixtoword, _ = pickle.load(f)
    img = Image.open(os.path.join(REF, "data/face/000155.png")).convert("RGB")
    lr1 = np.asarray(img.resize((32, 32), Image.BICUBIC),
                     np.float32) / 127.5 - 1
    T = cfg.TEXT.WORDS_NUM
    tok = np.zeros((1, T), np.int32)
    L = min(len(caps[0]), T)
    tok[0, :L] = caps[0][:L]
    lens = np.asarray([L], np.int32)

    pipe = SRPipeline.from_reference_checkpoints(
        cfg, len(ixtoword),
        os.path.join(REF, "Checkpoint/face_S8/netG_epoch_7.pth"),
        compute_dtype=jnp.bfloat16)

    # the shared quant-aware probe forward (SRPipeline.bench_forward)
    sr_one = pipe.bench_forward

    import functools

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain(variables, lr_b, cap_b, len_b, k, salt0):
        def body(carry, _):
            sr = sr_one(variables, lr_b + carry * 1e-12, cap_b, len_b)
            return carry + jnp.sum(sr.astype(jnp.float32)), None

        c, _ = jax.lax.scan(body, salt0, None, length=k)
        return c

    lr_d = jax.device_put(lr1[None])
    tok_d = jax.device_put(tok)
    len_d = jax.device_put(lens)

    def timed(k, iters=15):
        float(chain(pipe.variables, lr_d, tok_d, len_d, k, 0.0))  # compile
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(chain(pipe.variables, lr_d, tok_d, len_d, k,
                        float(i + 1)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(1)
    t32 = timed(32)
    dev = (t32 - t1) / 31
    overhead = t1 - dev
    print(f"t(1)={t1*1e3:.1f} ms  t(32)={t32*1e3:.1f} ms")
    print(f"-> device compute per single image: {dev*1e3:.2f} ms")
    print(f"-> per-dispatch overhead (this stack): {overhead*1e3:.1f} ms")
    print(f"(production-host p50 ~= device compute + O(1ms) runtime, "
          f"i.e. ~{dev*1e3:.0f} ms vs 370 ms reference CPU)")


if __name__ == "__main__":
    main()
