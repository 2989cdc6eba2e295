"""DAMSM pretraining engine: loss decreases on a tiny synthetic task, and
the Inception backbone produces the contract shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tgsr_tpu.config import Config
from tgsr_tpu.engine.damsm_trainer import DAMSMTrainer


class _SyntheticLoader:
    """Tiny correlated text/image task: image channel means encode the
    caption's first token."""

    def __init__(self, n=8, batch=4, T=18, size=64, vocab=12, seed=0):
        rng = np.random.default_rng(seed)
        self.batches = []
        for _ in range(n):
            tok = np.zeros((batch, T), np.int32)
            lens = rng.integers(2, 6, (batch,)).astype(np.int32)
            hr = np.zeros((batch, size, size, 3), np.uint8)
            for i in range(batch):
                first = rng.integers(1, vocab)
                tok[i, : lens[i]] = rng.integers(1, vocab, (lens[i],))
                tok[i, 0] = first
                hr[i] = (first * 255) // vocab
            self.batches.append({
                "hr": hr, "captions": tok, "cap_lens": lens,
                "class_ids": np.arange(batch, dtype=np.int32),
            })

    def epoch(self, _):
        return iter(self.batches)


@pytest.mark.slow
def test_damsm_trains_and_loss_decreases():
    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, TRAIN=dataclasses.replace(cfg.TRAIN, ENCODER_LR=2e-3))
    trainer = DAMSMTrainer(cfg, vocab_size=12, use_inception=False)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=64,
                               batch_size=4)
    loader = _SyntheticLoader()
    first = trainer.evaluate(state, loader, max_batches=8)
    state, hist = trainer.fit(state, loader, epochs=6, log_every=0)
    last = trainer.evaluate(state, loader, max_batches=8)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_epoch_lr_decay():
    cfg = Config()
    trainer = DAMSMTrainer(cfg, vocab_size=10, use_inception=False)
    lr0 = trainer.epoch_lr(0)
    lr1 = trainer.epoch_lr(1)
    assert lr0 == cfg.TRAIN.ENCODER_LR
    assert lr1 == pytest.approx(lr0 * 0.98)
    # floor at base/10
    assert trainer.epoch_lr(500) >= cfg.TRAIN.ENCODER_LR / 10.0 * 0.98


@pytest.mark.slow
def test_inception_backbone_shapes():
    from tgsr_tpu.models.image_encoder import CNNEncoder

    enc = CNNEncoder(nef=256)
    x = jnp.zeros((1, 64, 64, 3))
    v = enc.init(jax.random.PRNGKey(0), x)
    feat, code = enc.apply(v, x)
    assert feat.shape == (1, 289, 256)  # 17*17 regions
    assert code.shape == (1, 256)
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    # torchvision inception_v3 backbone (no fc/aux) is ~21.8M params
    assert 20e6 < n_params < 25e6, n_params


def test_damsm_mixed_precision_close_to_f32():
    """compute_dtype=bf16 CNN compute tracks the f32 step; state stays f32."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tgsr_tpu.config import Config
    from tgsr_tpu.engine.damsm_trainer import DAMSMTrainer

    cfg = Config()
    B, T, vocab = 4, 18, 12
    rng = np.random.default_rng(0)
    batch = {
        "imgs": jnp.asarray(rng.normal(0, 0.3, (B, 64, 64, 3)).astype(np.float32)),
        "captions": jnp.asarray(rng.integers(1, vocab, (B, T)).astype(np.int32)),
        "cap_lens": jnp.asarray(rng.integers(5, T, B).astype(np.int32)),
        "class_ids": jnp.arange(B, dtype=jnp.int32),
    }
    results = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        tr = DAMSMTrainer(cfg, vocab, use_inception=False, compute_dtype=dt)
        st = tr.init_state(jax.random.PRNGKey(0), image_size=64, batch_size=B)
        st, m = tr.train_step(st, batch, 2e-3, jax.random.PRNGKey(1))
        results[name] = {k: float(v) for k, v in m.items()}
        for leaf in jax.tree.leaves((st.text_params, st.cnn_params,
                                     st.cnn_stats)):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32, (name, leaf.dtype)
    for k in results["f32"]:
        a, b = results["f32"][k], results["bf16"][k]
        assert np.isfinite(b), k
        if abs(a) > 1e-3:
            assert abs(a - b) / abs(a) < 0.1, (k, a, b)


def test_fit_nan_abort():
    """fit's log-point failure detection: a diverged run raises instead of
    continuing (metrics fetch already syncs there, so the check is free)."""
    import numpy as np

    from tgsr_tpu.config import Config
    from tgsr_tpu.data.pipeline import BatchLoader
    from tgsr_tpu.engine.damsm_trainer import DAMSMTrainer

    class _OneBatchLoader:
        def __init__(self, batch, n=4):
            self.batch, self.n = batch, n

        def epoch(self, e):
            for _ in range(self.n):
                yield self.batch

    cfg = Config()
    cfg.TRAIN.ENCODER_LR = 1e9  # force divergence
    rng = np.random.default_rng(0)
    n, T, vocab = 4, cfg.TEXT.WORDS_NUM, 13
    caps = np.zeros((n, T), np.int32)
    caps[:, :5] = rng.integers(1, vocab, (n, 5))
    batch = {
        "hr": rng.integers(0, 256, (n, 64, 64, 3)).astype(np.uint8),
        "captions": caps,
        "cap_lens": np.full((n,), 5, np.int32),
        "class_ids": np.arange(n, dtype=np.int32),
    }
    trainer = DAMSMTrainer(cfg, vocab_size=vocab, use_inception=False)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=64,
                               batch_size=2)
    with pytest.raises(FloatingPointError, match="NaN/Inf"):
        trainer.fit(state, _OneBatchLoader(batch), epochs=3, log_every=1)
