"""Aux subsystems: metrics logging, NaN guard, orbax save/restore."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.utils.observability import MetricsLogger, StepTimer, nan_guard


def test_metrics_logger(tmp_path):
    m = MetricsLogger(str(tmp_path), "train")
    m.log(0, loss=1.5, lr=2e-4)
    m.log(1, loss=jnp.asarray(1.2))
    m.close()
    rows = [json.loads(l) for l in open(tmp_path / "train.jsonl")]
    assert rows[0]["loss"] == 1.5
    assert rows[1]["loss"] == pytest.approx(1.2)
    assert rows[1]["step"] == 1


def test_step_timer():
    t = StepTimer()
    assert t.tick() is None
    assert t.tick() is not None


def test_nan_guard_catches_nan():
    def f(x):
        return jnp.log(x)  # NaN for negative input

    safe = nan_guard(f)
    assert np.isfinite(float(safe(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        safe(jnp.asarray(-1.0))


def test_orbax_roundtrip(tmp_path):
    from tgsr_tpu.checkpoints.orbax_io import (
        latest_step,
        restore_train_state,
        save_train_state,
    )

    state = {"params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
             "step": jnp.asarray(7)}
    d = str(tmp_path / "ckpt")
    save_train_state(d, 7, state)
    assert latest_step(d) == 7
    restored, step = restore_train_state(d, jax.tree.map(np.asarray, state))
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))


def test_orthogonal_reinit_semantics():
    """weights_init convention (miscc/utils.py:454-464): orthogonal kernels,
    BN gamma ~ N(1, 0.02), zero biases, everything else untouched."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tgsr_tpu.utils.init import orthogonal_reinit

    params = {
        "conv": {"kernel": jnp.ones((3, 3, 8, 16))},
        "dense": {"kernel": jnp.ones((32, 8)), "bias": jnp.ones((8,))},
        "bn": {"scale": jnp.zeros((16,)), "bias": jnp.ones((16,))},
        "emb": {"embedding": jnp.full((10, 4), 7.0)},
    }
    out = orthogonal_reinit(params, jax.random.PRNGKey(0))

    k = np.asarray(out["conv"]["kernel"]).reshape(-1, 16)
    np.testing.assert_allclose(k.T @ k, np.eye(16), atol=1e-5)
    kd = np.asarray(out["dense"]["kernel"])
    np.testing.assert_allclose(kd.T @ kd, np.eye(8), atol=1e-5)
    assert float(np.abs(np.asarray(out["dense"]["bias"])).max()) == 0.0
    g = np.asarray(out["bn"]["scale"])
    assert abs(g.mean() - 1.0) < 0.05 and 0 < g.std() < 0.1
    np.testing.assert_array_equal(np.asarray(out["emb"]["embedding"]),
                                  np.asarray(params["emb"]["embedding"]))


def test_metrics_logger_tensorboard(tmp_path):
    """tensorboard=True mirrors scalars to event files (SURVEY §5
    "TensorBoard/CSV writer") readable by the standard event loader."""
    pytest.importorskip("tensorboard")
    m = MetricsLogger(str(tmp_path), "train", tensorboard=True)
    m.log(0, loss=1.5, lr=2e-4)
    m.log(5, loss=jnp.asarray(1.2), note="text-skipped")
    m.close()
    # JSONL unaffected
    rows = [json.loads(l) for l in open(tmp_path / "train.jsonl")]
    assert rows[1]["loss"] == pytest.approx(1.2)

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path / "tb"))
    acc.Reload()
    assert "loss" in acc.Tags()["scalars"]
    ev = acc.Scalars("loss")
    assert [e.step for e in ev] == [0, 5]
    assert ev[0].value == pytest.approx(1.5)
    assert ev[1].value == pytest.approx(1.2, rel=1e-5)
    # non-float values are JSONL-only, never TB
    assert "note" not in acc.Tags()["scalars"]


def test_metrics_logger_csv(tmp_path):
    m = MetricsLogger(str(tmp_path), "train", csv=True)
    m.log(0, loss=1.5, lr=2e-4)
    m.log(1, loss=0.5, lr=1e-4, extra=9.0)  # late key widens the header
    m.close()
    lines = open(tmp_path / "train.csv").read().splitlines()
    assert lines[0] == "step,time,loss,lr,extra"
    # the pre-widening row gained padding, not data
    assert lines[1].startswith("0,") and lines[1].endswith(",1.5,0.0002,")
    assert lines[2].startswith("1,") and lines[2].endswith(",0.5,0.0001,9.0")
    rows = [json.loads(l) for l in open(tmp_path / "train.jsonl")]
    assert rows[1]["extra"] == 9.0


def test_metrics_logger_csv_interleaved_schemas(tmp_path):
    """Interleaved metric families (train rows + --eval_every rows) must
    BOTH land in the CSV — the first-row-wins header previously dropped
    every training column when an eval row came first."""
    m = MetricsLogger(str(tmp_path), "train", csv=True)
    m.log(0, val_psnr_y=20.0)          # eval row fixes the initial header
    m.log(0, d_loss=1.0, g_loss=2.0)   # train row must widen it
    m.log(1, val_psnr_y=21.0)
    m.close()
    lines = open(tmp_path / "train.csv").read().splitlines()
    assert lines[0] == "step,time,val_psnr_y,d_loss,g_loss"
    assert lines[2].endswith(",1.0,2.0")          # losses present
    assert lines[3].split(",")[2] == "21.0"       # eval rows pad the rest


def test_metrics_logger_csv_resume_append(tmp_path):
    """A resumed run appends to the existing CSV under the EXISTING header
    (one file, one schema) instead of writing a second header mid-file."""
    m = MetricsLogger(str(tmp_path), "train", csv=True)
    m.log(0, loss=1.5)
    m.close()
    m2 = MetricsLogger(str(tmp_path), "train", csv=True)  # resume
    m2.log(1, loss=0.7)
    m2.close()
    lines = open(tmp_path / "train.csv").read().splitlines()
    assert lines[0] == "step,time,loss"
    assert len(lines) == 3 and lines[2].endswith(",0.7")


def test_metrics_logger_csv_comma_value_widening(tmp_path):
    """Round-4 review finding: a string value containing a comma must be
    csv-quoted, and the header-widening rewrite must parse rows with the
    csv module — counting raw ',' characters mis-padded every prior row."""
    import csv as _csv

    m = MetricsLogger(str(tmp_path), "train", csv=True)
    m.log(1, loss=0.5, note="a,b")
    m.log(2, loss=0.4, note="plain", extra=7.0)  # widening rewrite fires
    m.close()
    with open(tmp_path / "train.csv", newline="") as f:
        rows = list(_csv.reader(f))
    header = rows[0]
    assert header[:2] == ["step", "time"] and header[-1] == "extra"
    assert all(len(r) == len(header) for r in rows[1:])
    row1 = dict(zip(header, rows[1]))
    assert row1["note"] == "a,b" and row1["extra"] == ""
    row2 = dict(zip(header, rows[2]))
    assert row2["extra"] == "7.0"
