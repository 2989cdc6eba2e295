"""device_prefetch (data/pipeline.py): transfer-ahead iterator semantics;
enable_compile_cache opt-in (config.py)."""

import numpy as np
import pytest

import jax

from tgsr_tpu.config import enable_compile_cache
from tgsr_tpu.data.pipeline import device_prefetch


def _batches(n, record):
    for i in range(n):
        record.append(i)
        yield {"x": np.full((4, 3), i, np.float32), "i": i,
               "keys": [f"k{i}"]}


def test_prefetch_values_order_and_passthrough():
    rec = []
    out = list(device_prefetch(_batches(5, rec), depth=2))
    assert [b["i"] for b in out] == list(range(5))
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      np.full((4, 3), i, np.float32))
        assert b["keys"] == [f"k{i}"]  # python fields untouched


def test_prefetch_runs_ahead():
    rec = []
    it = device_prefetch(_batches(6, rec), depth=3)
    first = next(it)
    assert first["i"] == 0
    # pulling ONE batch must have transferred depth batches ahead
    assert len(rec) >= 3
    assert [b["i"] for b in it] == [1, 2, 3, 4, 5]


def test_prefetch_short_stream_and_early_close():
    rec = []
    assert [b["i"] for b in device_prefetch(_batches(2, rec), depth=8)] \
        == [0, 1]
    # abandoning the iterator mid-stream must not raise or hang
    it = device_prefetch(_batches(10, []), depth=2)
    next(it)
    it.close()


def test_prefetch_with_sharding():
    from tgsr_tpu.parallel.mesh import data_sharding, make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_data=8)
    sh = data_sharding(mesh, ndim=2)
    rec = []
    out = list(device_prefetch(
        ({"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
         for _ in range(2)), depth=2, sharding=sh))
    for b in out:
        assert b["x"].sharding == sh
        np.testing.assert_array_equal(
            np.asarray(b["x"]), np.arange(32, dtype=np.float32).reshape(16, 2))


def test_prefetch_with_put_override():
    """`put=` replaces the default device_put landing (the multi-process
    CLIs pass land_batch here so cross-process assembly is prefetched)."""
    from tgsr_tpu.parallel.mesh import make_mesh
    from tgsr_tpu.parallel.multihost import land_batch

    mesh = make_mesh(n_data=8, n_model=1)
    out = list(device_prefetch(
        ({"x": np.full((16, 2), float(i)), "keys": [f"a{i}"]}
         for i in range(3)),
        depth=2, put=lambda b: land_batch(mesh, b)))
    assert len(out) == 3
    for i, b in enumerate(out):
        assert b["x"].sharding.spec == jax.sharding.PartitionSpec(
            "data", None)
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      np.full((16, 2), float(i)))
        assert b["keys"] == [f"a{i}"]


def test_enable_compile_cache(tmp_path, monkeypatch):
    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("TGSR_COMPILE_CACHE", raising=False)
        assert enable_compile_cache() is False
        assert enable_compile_cache(str(tmp_path)) is True
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        monkeypatch.setenv("TGSR_COMPILE_CACHE", str(tmp_path / "env"))
        assert enable_compile_cache() is True
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "env")
    finally:
        # the cache dir is process-wide jax state; leaving it pointed at a
        # soon-deleted tmpdir would leak into the rest of the suite
        jax.config.update("jax_compilation_cache_dir", prev)
