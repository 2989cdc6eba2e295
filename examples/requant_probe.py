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

    # --- round-3 follow-up: approximate-sigmoid gates. The pass computes
    # the GLU in bf16 (eps ~0.004), so any gate approximation with max
    # error below ~3e-3 is numerically indistinguishable from bf16
    # sigmoid at the output; the question is only VPU cost. ---

    def _requant(g):
        return jnp.round(
            jnp.clip(g.astype(jnp.float32) / 0.02, -127, 127)).astype(jnp.int8)

    def requant_hard(a):
        # hardsigmoid clip(x/6+1/2, 0, 1): max err ~0.077 vs sigmoid
        c = a.shape[-1] // 2
        h = a * 1.1 + 0.05
        gate = jnp.clip(h[..., c:] * jnp.bfloat16(1 / 6) + jnp.bfloat16(0.5),
                        0, 1)
        return _requant(h[..., :c] * gate)

    def requant_rational(a):
        # 0.5 + 0.5*x/(2+|x|)-ish fast gate: max err ~0.05
        c = a.shape[-1] // 2
        h = a * 1.1 + 0.05
        x = h[..., c:]
        gate = jnp.bfloat16(0.5) + x / (jnp.bfloat16(2.0) + jnp.abs(2 * x))
        return _requant(h[..., :c] * gate)

    def requant_pade(a):
        # sigmoid(x) = 0.5*(1+tanh(x/2)); tanh via Pade(5,4) on the clamped
        # range |y|<=3.35 (beyond: tanh saturates within bf16 eps).
        # max |err| vs exact sigmoid ~= 2.4e-3 < bf16 eps band.
        c = a.shape[-1] // 2
        h = a * 1.1 + 0.05
        y = jnp.clip(h[..., c:] * jnp.bfloat16(0.5), -3.35, 3.35)
        y2 = y * y
        num = y * (945.0 + y2 * (105.0 + y2))
        den = 945.0 + y2 * (420.0 + 15.0 * y2)
        gate = jnp.bfloat16(0.5) + jnp.bfloat16(0.5) * (num / den)
        return _requant(h[..., :c] * gate)

    # --- structural decomposition: WHERE does the non-floor cost live?
    # (round-3 finding: hardsigmoid == sigmoid == pade to within noise, so
    # the pass is NOT transcendental-bound) ---

    def mult_only(a):
        # both halves read, plain multiply, no gate function at all
        c = a.shape[-1] // 2
        h = a * 1.1 + 0.05
        return _requant(h[..., :c] * h[..., c:])

    def add_only(a):
        c = a.shape[-1] // 2
        h = a * 1.1 + 0.05
        return _requant(h[..., :c] + h[..., c:])

    def affine_only(a):
        # single-half affine + quantize: floor plus the BN affine
        c = a.shape[-1] // 2
        h = a[..., :c] * 1.1 + 0.05
        return _requant(h)

    def split_axis(a):
        # same math as prod, but split value/gate on a reshaped axis
        # instead of slicing the lane dimension in half
        c = a.shape[-1] // 2
        h = a * 1.1 + 0.05
        h2 = h.reshape(*h.shape[:-1], 2, c)
        g = h2[..., 0, :] * jax.nn.sigmoid(h2[..., 1, :])
        return _requant(g)

    def sigmoid_inplace(a):
        # full-width sigmoid, no slicing: isolates the transcendental cost
        # at full lane occupancy
        h = a * 1.1 + 0.05
        return _requant(jax.nn.sigmoid(h))

    timed("requant+sigmoid (prod)", requant_sig, z)
    timed("slice+quant only (floor)", copy_only, z)
    timed("requant f32-sigmoid", glu_f32_quant, z)
    timed("requant hardsigmoid", requant_hard, z)
    timed("requant rational", requant_rational, z)
    timed("requant pade(5,4) tanh", requant_pade, z)
    timed("mult only (no gate fn)", mult_only, z)
    timed("add only", add_only, z)
    timed("affine+quant one half", affine_only, z)
    timed("split on reshaped axis", split_axis, z)
    timed("sigmoid full width", sigmoid_inplace, z)

    # two-tensor variant: value and gate as SEPARATE arrays (what a
    # split-conv or a [2,...]-stacked layout would feed this pass)
    val = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(1), (B, S, S, C), jnp.bfloat16))
    gate = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(2), (B, S, S, C), jnp.bfloat16))

    def timed2(name, fn, reps=20):
        @jax.jit
        def run(salt):
            def body(c_, i):
                out = fn(val + (salt + i).astype(val.dtype) * 1e-6, gate)
                return c_ + jnp.sum(out.astype(jnp.float32)), ()

            t, _ = jax.lax.scan(body, 0.0, jnp.arange(reps))
            return t

        float(run(jnp.float32(0)))
        t0 = time.perf_counter()
        float(run(jnp.float32(1)))
        print(f"{name:30s} {(time.perf_counter() - t0) * 1e3 / reps:7.2f} ms",
              flush=True)

    timed2("two-tensor val*sig(gate)",
           lambda v, g: _requant((v * 1.1 + 0.05)
                                 * jax.nn.sigmoid(g * 1.1 + 0.05)))

    # numeric check of the gate approximations vs f64 sigmoid
    import numpy as np

    xs = np.linspace(-12, 12, 20001)
    exact = 1 / (1 + np.exp(-xs))
    pade_y = np.clip(xs * 0.5, -3.35, 3.35)
    y2 = pade_y**2
    pade = 0.5 + 0.5 * (pade_y * (945 + y2 * (105 + y2))
                        / (945 + y2 * (420 + 15 * y2)))
    print(f"max|pade - sigmoid| = {np.abs(pade - exact).max():.2e} "
          f"(bf16 eps band ~4e-3)")
    hard = np.clip(xs / 6 + 0.5, 0, 1)
    print(f"max|hard - sigmoid| = {np.abs(hard - exact).max():.2e}")


if __name__ == "__main__":
    main()
