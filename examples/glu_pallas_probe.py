"""Pallas candidate for the int8 GLU+requantize pass.

Decomposition (requant_probe.py + glu_pass_probe.py, docs/PERF.md) shows
the standalone pass `int8(GLU(h))` at [256,256,256,64] bf16 is bound by
XLA's lowering of the two same-tensor channel-half reads: 10.9 ms vs a
2.9 ms pure-traffic floor and 4.3 ms when value/gate arrive as separate
buffers. Forcing separate buffers with optimization_barrier LOSES (the
split write pays the same penalty), so the only remaining shot is a
kernel that reads the tensor ONCE and does the half-combine in VMEM.

Unlike every previously-measured Pallas candidate (which competed against
XLA passes already near the HBM floor), this pass has 3.8x headroom.

Variants:
  A  one ref [R,64], in-kernel static lane slices
  B  two refs over the SAME array, channel-blocked (R,32) specs — the
     de-interleave rides the HBM->VMEM DMA instead of the VPU
  C  two-pixel rows: view [N,64] as [N/2,128] (full lane fill), 4 static
     slices per row

Run on the TPU: python examples/glu_pallas_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def timed(name, fn, *arrs, reps=20):
    @jax.jit
    def run(salt, *xs):
        def body(c, i):
            out = fn(*[x + ((salt + i) % 2).astype(x.dtype) * 0
                       for x in xs])
            out = out + (salt + i).astype(out.dtype) * 0
            return c + jnp.sum(out.astype(jnp.float32)), ()

        t, _ = jax.lax.scan(body, 0.0, jnp.arange(reps))
        return t

    float(run(jnp.int32(0), *arrs))
    t0 = time.perf_counter()
    float(run(jnp.int32(1), *arrs))
    dt = (time.perf_counter() - t0) * 1e3 / reps
    print(f"{name:34s} {dt:7.2f} ms", flush=True)
    return dt


STEP = 0.02


def _requant(g):
    return jnp.round(
        jnp.clip(g.astype(jnp.float32) / STEP, -127, 127)).astype(jnp.int8)


def _glu_q(v, g):
    # bf16 logistic hits a Mosaic lowering bug (f32->bf16 vector.broadcast);
    # gate in f32 (VPU transcendentals are f32-rate anyway)
    s = jax.nn.sigmoid(g.astype(jnp.float32)).astype(v.dtype)
    return _requant(v * s)


def _kern_one(h_ref, o_ref, *, c):
    h = h_ref[...]
    o_ref[...] = _glu_q(h[:, :c], h[:, c:])


def glu_requant_one(h2, c, rows):
    n = h2.shape[0]
    return pl.pallas_call(
        functools.partial(_kern_one, c=c),
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, 2 * c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.int8),
    )(h2)


# Variant B (two channel-blocked refs over the same array) is structurally
# impossible: Mosaic requires lane-dim blocks divisible by 128 or equal to
# the array's lane dim, so a (rows, 32) block over a 64-lane array is
# rejected. The DMA-de-interleave idea cannot be expressed.


def _kern_pair(h_ref, o_ref, *, c):
    h = h_ref[...]
    a = _glu_q(h[:, :c], h[:, c:2 * c])
    b = _glu_q(h[:, 2 * c:3 * c], h[:, 3 * c:])
    o_ref[...] = jnp.concatenate([a, b], axis=-1)


def glu_requant_pair(h2, c, rows):
    hp = h2.reshape(h2.shape[0] // 2, 4 * c)
    n = hp.shape[0]
    out = pl.pallas_call(
        functools.partial(_kern_pair, c=c),
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, 4 * c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows, 2 * c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2 * c), jnp.int8),
    )(hp)
    return out.reshape(h2.shape[0], c)


def main():
    key = jax.random.PRNGKey(0)
    B, S, C = 256, 256, 32
    N = B * S * S
    z = jax.device_put(jax.random.normal(key, (N, 2 * C), jnp.bfloat16))
    print(f"device {jax.devices()[0].device_kind}, [{N},{2*C}] bf16",
          flush=True)

    def xla_prod(a):
        return _requant(a[..., :C] * jax.nn.sigmoid(a[..., C:]))

    # numeric parity on CPU-sized slices first (cheap: same jit, tiny N)
    small = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(7), (4096, 2 * C), jnp.bfloat16))
    want = np.asarray(jax.jit(xla_prod)(small))
    for nm, f in [("one", glu_requant_one), ("pair", glu_requant_pair)]:
        got = np.asarray(jax.jit(
            lambda a, f=f: f(a, C, 512))(small))
        diff = int(np.abs(got.astype(np.int32) - want.astype(np.int32)).max())
        print(f"parity {nm}: max|diff| = {diff} (int8 steps)", flush=True)

    t0 = timed("XLA fused prod (baseline)", xla_prod, z)
    for rows in (1024, 4096):
        t1 = timed(f"pallas A one-ref r={rows}",
                   lambda a, r=rows: glu_requant_one(a, C, r), z)
        t3 = timed(f"pallas C pair-row r={rows}",
                   lambda a, r=rows: glu_requant_pair(a, C, r), z)
        print(f"  speedups r={rows}: A {t0/t1:.2f}x "
              f"C {t0/t3:.2f}x", flush=True)


if __name__ == "__main__":
    main()
