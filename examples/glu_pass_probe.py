"""Follow-up to requant_probe.py: fix the GLU+requantize pass's REAL leak.

Decomposition (docs/PERF.md round-3 update) showed the standalone int8
GLU+requantize pass is bound by the BINARY COMBINE of the tensor's two
channel-half slices (~10.9 ms at [256,256,256,64]), NOT by the sigmoid
(full-width sigmoid+quant: 4.4 ms) and NOT by quantize (half-read floor:
2.9 ms). Every variant that reads the tensor as two half-width streams
pays ~3.5x bandwidth; reading it ONCE at full lane width is fast.

This probe tests full-width single-stream formulations of
GLU(h) = h[..:c] * sigmoid(h[..c:]):

  * roll:    p = h * sigmoid(roll(h, -c, lanes)); out = p[..:c]
             (one full-width read; the rotate is an in-register lane op)
  * rollpad: same but keep the full-width product and let the consumer
             slice (measures whether the final slice forces half-width)
  * two-tensor: value/gate as separate arrays (what a layout change at
             the producer conv would feed)

Run on the TPU: python examples/glu_pass_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *arrs, reps=20):
    @jax.jit
    def run(salt, *xs):
        def body(c, i):
            # dtype-aware freshness: float inputs get a tiny additive salt,
            # int inputs a parity bit (keeps XLA from hoisting out of scan)
            def fresh(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x + (salt + i).astype(x.dtype) * 1e-6
                return x + ((salt + i) % 2).astype(x.dtype)

            out = fn(*[fresh(x) for x in xs])
            return c + jnp.sum(out.astype(jnp.float32)), ()

        t, _ = jax.lax.scan(body, 0.0, jnp.arange(reps))
        return t

    float(run(jnp.int32(0), *arrs))
    t0 = time.perf_counter()
    float(run(jnp.int32(1), *arrs))
    dt = (time.perf_counter() - t0) * 1e3 / reps
    print(f"{name:34s} {dt:7.2f} ms", flush=True)
    return dt


def _requant(g):
    return jnp.round(
        jnp.clip(g.astype(jnp.float32) / 0.02, -127, 127)).astype(jnp.int8)


def main():
    key = jax.random.PRNGKey(0)
    B, S, C = 256, 256, 32
    z = jax.device_put(jax.random.normal(key, (B, S, S, 2 * C), jnp.bfloat16))
    print(f"device {jax.devices()[0].device_kind}, [{B},{S},{S},{2*C}] bf16",
          flush=True)

    def prod(a):
        h = a * 1.1 + 0.05
        return _requant(h[..., :C] * jax.nn.sigmoid(h[..., C:]))

    def roll(a):
        h = a * 1.1 + 0.05
        p = h * jax.nn.sigmoid(jnp.roll(h, -C, axis=-1))
        return _requant(p[..., :C])

    def rollpad(a):
        # full-width output: int8 of the whole product (consumer would
        # slice the first half; measures the no-final-slice ceiling)
        h = a * 1.1 + 0.05
        p = h * jax.nn.sigmoid(jnp.roll(h, -C, axis=-1))
        return _requant(p)

    def barrier_split(a):
        # force the two halves to materialize as SEPARATE buffers, then
        # combine as the (fast) two-tensor pass
        h = a * 1.1 + 0.05
        v, g = jax.lax.optimization_barrier((h[..., :C], h[..., C:]))
        return _requant(v * jax.nn.sigmoid(g))

    def two_pass(a):
        # pass 1: sigmoid of the gate half (single-slice read = floor-cheap)
        # pass 2: value slice * materialized gate (slice + separate tensor)
        h = a * 1.1 + 0.05
        s = jax.lax.optimization_barrier(jax.nn.sigmoid(h[..., C:]))
        return _requant(h[..., :C] * s)

    t_prod = timed("prod half-slice GLU+quant", prod, z)
    t_roll = timed("roll full-width GLU+quant", roll, z)
    timed("rollpad (no final slice)", rollpad, z)
    timed("barrier-split two buffers", barrier_split, z)
    timed("two-pass gate then combine", two_pass, z)

    val = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(1), (B, S, S, C), jnp.bfloat16))
    gate = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(2), (B, S, S, C), jnp.bfloat16))
    timed("two-tensor val*sig(gate)+quant",
          lambda v, g: _requant((v * 1.1 + 0.05)
                                * jax.nn.sigmoid(g * 1.1 + 0.05)),
          val, gate)

    # realistic producer: int8 conv (the UpBlock conv that feeds the GLU
    # pass in the int8 pipeline) -> dequant affine -> GLU+requant. Measures
    # whether the barrier split costs an extra copy pass when the producer
    # is a conv fusion rather than elementwise.
    xq = jax.device_put((jax.random.normal(
        jax.random.PRNGKey(3), (B, S, S, C)) * 40).astype(jnp.int8))
    wq = jax.device_put((jax.random.normal(
        jax.random.PRNGKey(4), (3, 3, C, 2 * C)) * 40).astype(jnp.int8))

    def _conv(a):
        y = jax.lax.conv_general_dilated(
            a, wq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * 2e-4 + 0.05).astype(jnp.bfloat16)

    def conv_base(a):
        h = _conv(a)
        return _requant(h[..., :C] * jax.nn.sigmoid(h[..., C:]))

    def conv_barrier(a):
        h = _conv(a)
        v, g = jax.lax.optimization_barrier((h[..., :C], h[..., C:]))
        return _requant(v * jax.nn.sigmoid(g))

    def conv_two_pass(a):
        h = _conv(a)
        s = jax.lax.optimization_barrier(jax.nn.sigmoid(h[..., C:]))
        return _requant(h[..., :C] * s)

    def _conv_half(a, w):
        y = jax.lax.conv_general_dilated(
            a, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * 2e-4 + 0.05).astype(jnp.bfloat16)

    def conv_split(a):
        # kernel split into value/gate halves: two 32-out convs whose
        # outputs are SEPARATE buffers, so the GLU pass runs in its fast
        # two-tensor form. Trades duplicate input read + 32-out-channel
        # MXU underfill for the 2.6x pass win. (Round-2 tried a variant
        # with the sigmoid riding the conv epilogues: 3634 vs 3812 e2e.)
        v = _conv_half(a, wq[..., :C])
        g = _conv_half(a, wq[..., C:])
        return _requant(v * jax.nn.sigmoid(g))

    t_cb = timed("conv->GLU+quant (production)", conv_base, xq)
    t_cbar = timed("conv->barrier-split GLU", conv_barrier, xq)
    t_c2p = timed("conv->two-pass GLU", conv_two_pass, xq)
    t_csp = timed("split-conv->two-tensor GLU", conv_split, xq)
    print(f"conv chain speedups: barrier {t_cb / t_cbar:.2f}x, "
          f"two-pass {t_cb / t_c2p:.2f}x, split-conv {t_cb / t_csp:.2f}x",
          flush=True)

    # numeric identity of the roll formulation
    a = np.random.default_rng(0).normal(
        size=(2, 8, 8, 2 * C)).astype(np.float32)
    h = a * 1.1 + 0.05
    want = h[..., :C] / (1 + np.exp(-h[..., C:]))
    got = (h * (1 / (1 + np.exp(-np.roll(h, -C, axis=-1)))))[..., :C]
    print(f"roll == half-slice: max|diff| = {np.abs(want - got).max():.1e}")
    print(f"speedup prod/roll = {t_prod / t_roll:.2f}x")


if __name__ == "__main__":
    main()
