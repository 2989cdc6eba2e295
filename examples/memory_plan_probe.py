#!/usr/bin/env python
"""Validate compile-time capacity planning (utils/memory.py) on the real
chip: bisect the largest single-dispatch x8 serving batch WITHOUT running
or crashing anything, and compare against the empirically-found ceiling
(docs/PERF.md "Batch-size ceiling": a single ~1024-image dispatch OOMs,
which is why sr_batched plans microbatches).

  python examples/memory_plan_probe.py            # TPU
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    import jax
    import jax.numpy as jnp

    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.engine.inference import SRPipeline
    from tgsr_tpu.utils.memory import device_memory_budget, program_memory

    cfg = config_from_file(os.path.join(REF, "cfg/eval_faceSR_attn2.yml"))
    with open(os.path.join(REF, "data/face/testset.pickle"), "rb") as f:
        _, ixtoword, _ = pickle.load(f)
    pipe = SRPipeline.from_reference_checkpoints(
        cfg, len(ixtoword),
        os.path.join(REF, "Checkpoint/face_S8/netG_epoch_7.pth"),
        compute_dtype=jnp.bfloat16)
    T = cfg.TEXT.WORDS_NUM

    budget = device_memory_budget()
    print(f"device {jax.devices()[0]}, budget "
          f"{budget / 2**30:.2f} GiB" if budget else "no budget reported",
          flush=True)

    # spot-check the plan at two batch sizes (pipeline's own forward)
    def f(variables, lr, caps, lens):
        return jnp.sum(pipe.bench_forward(variables, lr, caps,
                                          lens).astype(jnp.float32))

    for b in (256, 768):
        mem = program_memory(
            f, pipe.variables,
            jax.ShapeDtypeStruct((b, 32, 32, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, T), jnp.int32),
            jax.ShapeDtypeStruct((b,), jnp.int32))
        print(f"B={b}: temp {(mem['temp'] or 0) / 2**30:.2f} GiB, total "
              f"{(mem['total'] or 0) / 2**30:.2f} GiB", flush=True)

    # the product path: same bisection SRPipeline ships
    best = pipe.plan_microbatch(budget_bytes=budget, lo=256, hi=4096,
                                quantum=128)
    print(f"PLANNED max single-dispatch batch: {best} "
          f"(docs/PERF.md empirical ceiling: <1024; sr_batched default "
          f"microbatch {pipe.DEFAULT_MICROBATCH})", flush=True)


if __name__ == "__main__":
    main()
