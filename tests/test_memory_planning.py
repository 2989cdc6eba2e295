"""Compile-time memory accounting + batch planner (utils/memory.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.utils.memory import (
    device_memory_budget,
    max_feasible_batch,
    program_memory,
)


def test_program_memory_reports_and_scales():
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    small = program_memory(f, jax.ShapeDtypeStruct((64, 64), jnp.float32))
    big = program_memory(f, jax.ShapeDtypeStruct((512, 64), jnp.float32))
    assert set(small) == {"temp", "arguments", "output", "generated_code",
                          "total"}
    # CPU XLA reports argument/temp bytes; the larger program must not
    # report LESS argument memory
    if small["arguments"] is not None and big["arguments"] is not None:
        assert big["arguments"] >= small["arguments"]
    # no execution happened: ShapeDtypeStructs were enough (would have
    # thrown above otherwise)


def test_device_memory_budget_cpu():
    # CPU backends may or may not report a limit; both are valid, the
    # contract is "None or positive int"
    b = device_memory_budget()
    assert b is None or b > 0


def test_max_feasible_batch_bisection():
    # injected measure: 1 MB per batch row, budget 100 MB -> best 100
    calls = []

    def measure(b):
        calls.append(b)
        return b * 2**20

    best, hist = max_feasible_batch(lambda b: (None, ()),
                                    budget_bytes=100 * 2**20,
                                    lo=1, hi=4096, measure=measure)
    assert best == 100
    assert len(calls) <= 16, "bisection, not a linear scan"
    assert hist[best] == 100 * 2**20


def test_max_feasible_batch_quantum_and_infeasible():
    def measure(b):
        return None if b > 96 else b * 2**20

    best, _ = max_feasible_batch(lambda b: (None, ()),
                                 budget_bytes=10**12, lo=1, hi=4096,
                                 measure=measure, quantum=64)
    assert best in (64, 96) and best % 64 == 0 or best == 1
    assert best == 64  # largest multiple of 64 that "compiles"

    best0, hist0 = max_feasible_batch(lambda b: (None, ()),
                                      budget_bytes=1, lo=4, hi=64,
                                      measure=lambda b: 100)
    assert best0 == 0 and hist0 == {4: 100}


def test_max_feasible_batch_real_compiles():
    """End-to-end with real XLA compiles on CPU: a function whose temp
    scales with batch, budgeted to cut the range."""
    def make(b):
        def f(x):
            return (x @ x.T).sum()

        return f, (jax.ShapeDtypeStruct((b, 256), jnp.float32),)

    # budget from a mid-size probe: batch 64's total + slack
    mid = program_memory(*(lambda f_a: (f_a[0], *f_a[1]))(make(64)))
    if mid["total"] is None:
        pytest.skip("backend reports no memory analysis")
    best, hist = max_feasible_batch(make, budget_bytes=mid["total"],
                                    lo=1, hi=512)
    assert 1 <= best <= 512
    assert np.isfinite(best)


def test_pipeline_plan_microbatch(monkeypatch):
    """SRPipeline.plan_microbatch wires the bisection to bench_forward
    shapes; with an injected budget/measure path it must return the
    planner's answer, and fall back to DEFAULT_MICROBATCH when the
    backend reports no budget."""
    from tests.test_serving import build_small_pipe
    import tgsr_tpu.utils.memory as mem

    pipe = build_small_pipe()

    # CPU backend typically reports no budget -> fallback
    monkeypatch.setattr(mem, "device_memory_budget", lambda *a, **k: None)
    calls = {}

    def fake_mfb(make, budget_bytes=None, lo=1, hi=4096, measure=None,
                 quantum=1):
        calls["budget"] = budget_bytes
        if budget_bytes is None:
            raise ValueError("no budget")
        fn, args = make(lo)  # the factory must produce valid specs
        assert args[1].shape == (lo, 16, 16, 3)
        return 192, {}

    monkeypatch.setattr(
        "tgsr_tpu.utils.memory.max_feasible_batch", fake_mfb)
    assert pipe.plan_microbatch() == pipe.DEFAULT_MICROBATCH

    assert pipe.plan_microbatch(budget_bytes=10**9) == 192
    assert calls["budget"] == 10**9


@pytest.mark.slow
def test_gan_trainer_plan_batch():
    """plan_batch AOT-compiles the production fused step at candidate
    batches (nothing executes beyond the tiny shape-source init) and
    bisects the budget; with a generous injected budget at tiny geometry
    it returns a feasible batch in range."""
    import dataclasses

    from tgsr_tpu.config import Config
    from tgsr_tpu.engine.gan_trainer import GANTrainer
    from tgsr_tpu.models.text_encoder import TextEncoder

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=8, DF_DIM=8),
    )
    vocab, T = 11, cfg.TEXT.WORDS_NUM
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    tv = enc.init(jax.random.PRNGKey(0), jnp.ones((2, T), jnp.int32),
                  jnp.full((2,), 4, jnp.int32))
    trainer = GANTrainer(cfg, vocab, tv)

    with pytest.raises(ValueError):
        # CPU reports no memory capacity
        trainer.plan_batch(lo=2, hi=4, quantum=2)

    best = trainer.plan_batch(budget_bytes=10**12, lo=2, hi=4, quantum=2)
    assert best in (2, 4)


def test_program_memory_respects_prejitted_fn():
    """An already-jitted fn (e.g. the production donated train step) must
    be lowered as-is — re-wrapping would drop donate_argnums and
    overstate the plan."""
    def f(x):
        return x * 2.0

    jf = jax.jit(f, donate_argnums=(0,))
    spec = jax.ShapeDtypeStruct((128, 128), jnp.float32)
    mem = program_memory(jf, spec)
    assert set(mem) == {"temp", "arguments", "output", "generated_code",
                        "total"}


def test_device_memory_budget_known_kind_fallback():
    """A backend that reports no memory_stats (the axon tunnel returns
    None for a real v5e) must fall back to the published per-chip
    capacity keyed by device_kind; unknown kinds still yield None."""
    class FakeDev:
        def __init__(self, kind):
            self.device_kind = kind

        def memory_stats(self):
            return None

    b = device_memory_budget(FakeDev("TPU v5 lite"))
    assert b == int(16e9 * 0.92)  # v5e is published in decimal GB
    assert device_memory_budget(FakeDev("Mystery Chip 9000")) is None

    class RaisingDev(FakeDev):
        def memory_stats(self):
            raise RuntimeError("unimplemented")

    assert device_memory_budget(RaisingDev("TPU v4")) == int(
        32 * 2**30 * 0.92)


def test_capacity_table_uses_published_units():
    """ADVICE r3: each entry must use the capacity in the unit its spec
    sheet publishes — v5p is 95 GB (~88.5 GiB; a 96*2**30 entry would
    plan past the physical chip), while v4 is genuinely 32 GiB."""
    from tgsr_tpu.utils.memory import KNOWN_CAPACITY_BYTES
    assert KNOWN_CAPACITY_BYTES["TPU v5"] == int(95e9)
    assert KNOWN_CAPACITY_BYTES["TPU v5 lite"] == int(16e9)
    assert KNOWN_CAPACITY_BYTES["TPU v6 lite"] == int(32e9)
    assert KNOWN_CAPACITY_BYTES["TPU v4"] == 32 * 2**30
