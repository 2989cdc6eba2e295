"""Mixed-precision helpers (engine/precision.py).

The merge_stats contract: BN running statistics accumulated over many
steps in a bf16-computing trainer must track the f32 reference — applying
the low-precision DELTA to an f32 master bounds the error at one rounding
of the per-step delta, while storing the returned bf16 state re-quantizes
the whole accumulator every step.
"""

import jax.numpy as jnp
import numpy as np

from tgsr_tpu.engine.precision import cast_floats, merge_stats, uncast_floats


def test_cast_roundtrip_and_int_passthrough():
    tree = {"w": jnp.ones((3,), jnp.float32), "i": jnp.ones((3,), jnp.int32)}
    lo = cast_floats(tree, jnp.bfloat16)
    assert lo["w"].dtype == jnp.bfloat16 and lo["i"].dtype == jnp.int32
    hi = uncast_floats(lo, jnp.bfloat16)
    assert hi["w"].dtype == jnp.float32
    assert cast_floats(tree, jnp.float32) is tree


def test_merge_stats_recovers_exact_f32_recursion():
    """flax BatchNorm blends running stats IN F32 but seeds the blend from
    the bf16 CAST of the old state (verified empirically; see
    engine/precision.py). merge_stats adds back momentum*(master - cast),
    recovering the exact f32 recursion over many steps."""
    rng = np.random.RandomState(0)
    momentum = 0.9
    ref = np.float64(1.0)          # exact accumulation
    master = jnp.float32(1.0)      # corrected master
    naive = jnp.float32(1.0)       # stores flax's cast-seeded blend as-is
    for _ in range(500):
        batch = np.float32(1.0 + rng.randn() * 0.01)
        ref = momentum * ref + (1 - momentum) * np.float64(batch)
        # what flax returns: f32 blend seeded from the bf16 cast of the state
        def flax_blend(state_f32):
            cast = state_f32.astype(jnp.bfloat16).astype(jnp.float32)
            return jnp.float32(momentum) * cast + \
                jnp.float32(1 - momentum) * jnp.float32(batch)

        master = merge_stats(master, flax_blend(master), jnp.bfloat16,
                             momentum=momentum)
        naive = flax_blend(naive)
    err_master = abs(float(master) - float(ref))
    err_naive = abs(float(naive) - float(ref))
    assert master.dtype == jnp.float32
    assert err_master < 1e-5, err_master           # exact up to f32 rounding
    assert err_naive > 10 * err_master, (err_master, err_naive)


def test_merge_stats_f32_passthrough():
    old = {"m": jnp.asarray([1.0, 2.0], jnp.float32)}
    new = {"m": jnp.asarray([1.5, 2.5], jnp.float32)}
    out = merge_stats(old, new, jnp.float32)
    np.testing.assert_array_equal(np.asarray(out["m"]), [1.5, 2.5])
