"""Decompose the int8 serving path's standalone GLU+requantize pass.

The round-2 profile (docs/PERF.md "Int8 quantized serving mode") blames
~22% of int8 device time on standalone `round-nearest-even_convert` loop
fusions — the BN+GLU+quantize chain that the bf16 path gets for free as a
conv input fusion.  This probe isolates that pass at its production shape
([256,256,256,64] bf16 -> [*,32] int8, the 256px stage of the x8 face
pipeline, reference math util.py:707-713 GLU) and measures:

  * the production pass (affine + GLU with bf16 sigmoid + quantize)
  * its pure-traffic floor (same bytes moved, no sigmoid/multiply)
  * an f32-sigmoid variant (what a naive port would do)

Verdict recorded in docs/PERF.md "Serving design-space closure (round 3)":
the pass is VPU-bound on the sigmoid chain (~8 ms above the traffic
floor), so a Pallas rewrite using the same VPU transcendental cannot beat
XLA here; only hiding the epilogue inside a conv kernel could — and XLA's
int8 convs already run at 222 TOPS, above what a hand-written Pallas
formulation of these K=32 convs can reach.

Run on the TPU: python examples/requant_probe.py
"""
import time

import jax
import jax.numpy as jnp


def timed(name, fn, x, reps=20):
    """Forced-sync timing per docs/PERF.md honest-measurement rules:
    device-resident input, in-graph scan, fetch a scalar checksum."""

    @jax.jit
    def run(salt, xx):
        def body(c, i):
            out = fn(xx + (salt + i).astype(xx.dtype) * 1e-6)
            return c + jnp.sum(out.astype(jnp.float32)), ()

        t, _ = jax.lax.scan(body, 0.0, jnp.arange(reps))
        return t

    float(run(jnp.float32(0), x))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.float32(1), x))
    print(f"{name:30s} {(time.perf_counter() - t0) * 1e3 / reps:7.2f} ms",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    B, S, C = 256, 256, 32
    z = jax.device_put(jax.random.normal(key, (B, S, S, 2 * C), jnp.bfloat16))
    print(f"device {jax.devices()[0].device_kind}, tensor [{B},{S},{S},{2*C}] "
          f"bf16 -> int8", flush=True)

    def requant_sig(a):
        c = a.shape[-1] // 2
        h = a * 1.1 + 0.05  # stand-in BN affine
        g = h[..., :c] * jax.nn.sigmoid(h[..., c:])
        return jnp.round(
            jnp.clip(g.astype(jnp.float32) / 0.02, -127, 127)).astype(jnp.int8)

    def copy_only(a):
        c = a.shape[-1] // 2
        return jnp.round(
            jnp.clip(a[..., :c].astype(jnp.float32) / 0.02, -127,
                     127)).astype(jnp.int8)

    def glu_f32_quant(a):
        c = a.shape[-1] // 2
        h = (a * 1.1 + 0.05).astype(jnp.float32)
        g = h[..., :c] * jax.nn.sigmoid(h[..., c:])
        return jnp.round(jnp.clip(g / 0.02, -127, 127)).astype(jnp.int8)

    timed("requant+sigmoid (prod)", requant_sig, z)
    timed("slice+quant only (floor)", copy_only, z)
    timed("requant f32-sigmoid", glu_f32_quant, z)


if __name__ == "__main__":
    main()
