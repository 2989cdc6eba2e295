"""Multi-host helpers on the single-process CPU x8 backend.

jax.make_array_from_process_local_data with one process must produce the
same globally-sharded arrays as a plain device_put with the data sharding;
initialize_distributed must be a safe no-op.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tgsr_tpu.parallel.mesh import make_mesh
from tgsr_tpu.parallel.multihost import (
    global_batch_from_local,
    initialize_distributed,
    process_local_slice,
)


def test_initialize_noop_single_process():
    assert initialize_distributed() == 0
    assert jax.process_count() == 1


def test_global_batch_from_local_single_process():
    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(0)
    local = {
        "x": rng.random((16, 4, 4, 3), np.float32),
        "lens": np.arange(16, dtype=np.int32),
    }
    g = global_batch_from_local(mesh, local)
    assert g["x"].shape == (16, 4, 4, 3)
    assert g["x"].sharding.spec == P("data", None, None, None)
    np.testing.assert_array_equal(np.asarray(g["x"]), local["x"])
    np.testing.assert_array_equal(np.asarray(g["lens"]), local["lens"])

    # consumable by a data-sharded jit
    @jax.jit
    def f(b):
        return jnp.sum(b["x"], axis=(1, 2, 3)) + b["lens"]

    out = f(g)
    expect = local["x"].sum(axis=(1, 2, 3)) + local["lens"]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_process_local_slice():
    s = process_local_slice(32)
    assert (s.start, s.stop) == (0, 32)
