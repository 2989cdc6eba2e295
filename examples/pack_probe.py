#!/usr/bin/env python
"""Channel-packing probe (VERDICT r2 item 2a): can packing 4 images into
the channel dimension beat the measured lane underfill of the 32-channel
model's convs on the v5e MXU?

Background (docs/PERF.md): the head conv3x3 32->3 runs at ~8 TFLOP/s
(output tile 3/128 filled; K=32/128), and the up-convs at 73% MXU. Packing
G=4 images channelwise gives K=128 (full) and Cout=12 -- the same padded
output tile now serves 4 images. Variants measured per segment, bf16,
forced-sync scan timing (docs/PERF.md methodology):

  base        [B, S, S, C] -> conv -> [B, S, S, Cout]
  pack-dense  [B/4, S, S, 4C] -> conv(block-diag kernel) -> [B/4, S, S, 4Cout]
              (4x FLOPs, dense MXU work, full K lanes)
  pack-group  same shapes, feature_group_count=4 (no FLOP inflation; XLA's
              grouped-conv lowering decides the layout)

Each packed variant is measured BOTH steady-state (inputs already packed --
the model-wide packed formulation) and with pack/unpack reshapes included
(per-segment adoption cost).

  python examples/pack_probe.py [--batch 256] [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--cin", type=int, default=32)
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--group", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, S, C, G = args.batch, args.size, args.cin, args.group
    assert B % G == 0
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"device {jax.devices()[0]}, B={B} S={S} C={C} G={G}, bf16",
          flush=True)

    def timed(name, fn, *arrs):
        """jit a scan of `reps` salted applications; fetch a scalar checksum
        (block_until_ready does not sync on this stack -- docs/PERF.md)."""
        @jax.jit
        def run(salt, *xs):
            def salted(x, i):
                # real per-iteration input perturbation: defeats both result
                # caching and loop-invariant hoisting of the measured op
                if jnp.issubdtype(x.dtype, jnp.integer):
                    return x + ((salt.astype(jnp.int32) + i) % 2).astype(
                        x.dtype)
                return x + (salt + i).astype(x.dtype) * 1e-6

            def body(carry, i):
                out = fn(*[salted(x, i) for x in xs])
                return carry + jnp.sum(out.astype(jnp.float32)), ()

            tot, _ = jax.lax.scan(body, 0.0, jnp.arange(args.reps))
            return tot

        float(run(jnp.float32(0), *arrs))  # compile
        t0 = time.perf_counter()
        float(run(jnp.float32(1), *arrs))
        dt_ms = (time.perf_counter() - t0) * 1e3 / args.reps
        print(f"  {name:34s} {dt_ms:8.2f} ms/iter", flush=True)
        return dt_ms

    results = {}

    # ---------------- head conv: 3x3 C -> 3 ----------------
    x = jax.random.normal(key, (B, S, S, C), dt)
    w = jax.random.normal(key, (3, 3, C, 3), dt) * 0.1
    xp = jnp.reshape(jnp.transpose(jnp.reshape(x, (B // G, G, S, S, C)),
                                   (0, 2, 3, 1, 4)), (B // G, S, S, G * C))
    # block-diagonal packed kernel [3,3,G*C,G*3]
    wd = np.zeros((3, 3, G * C, G * 3), np.float32)
    for g in range(G):
        wd[:, :, g * C:(g + 1) * C, g * 3:(g + 1) * 3] = np.asarray(
            w, np.float32)
    wd = jnp.asarray(wd, dt)
    wg = jnp.concatenate([w] * G, axis=-1)  # grouped kernel [3,3,C,G*3]

    conv = lambda x_, w_, fg=1: jax.lax.conv_general_dilated(
        x_, w_, (1, 1), "SAME", feature_group_count=fg,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    print("head conv3x3 32->3:", flush=True)
    results["head_base"] = timed("base", lambda a: conv(a, w), x)
    results["head_pack_dense"] = timed("pack-dense (steady)",
                                       lambda a: conv(a, wd), xp)
    results["head_pack_group"] = timed("pack-group (steady)",
                                       lambda a: conv(a, wg, G), xp)

    def pack_then_conv(a):
        ap = jnp.reshape(jnp.transpose(jnp.reshape(a, (B // G, G, S, S, C)),
                                       (0, 2, 3, 1, 4)),
                         (B // G, S, S, G * C))
        return conv(ap, wd)

    results["head_pack_incl"] = timed("pack-dense (incl. pack op)",
                                      pack_then_conv, x)

    # ---------------- up-conv: nearest-up2 + conv3x3 C -> 2*2C (GLU in) ----
    S2 = S // 2
    y = jax.random.normal(key, (B, S2, S2, C), dt)
    Cout = 4 * C  # conv to 2*(2C) pre-GLU channels (h_net3 geometry)
    wu = jax.random.normal(key, (3, 3, C, Cout), dt) * 0.1
    wud = np.zeros((3, 3, G * C, G * Cout), np.float32)
    for g in range(G):
        wud[:, :, g * C:(g + 1) * C, g * Cout:(g + 1) * Cout] = np.asarray(
            wu, np.float32)
    wud = jnp.asarray(wud, dt)
    wug = jnp.concatenate([wu] * G, axis=-1)
    yp = jnp.reshape(jnp.transpose(jnp.reshape(y, (B // G, G, S2, S2, C)),
                                   (0, 2, 3, 1, 4)), (B // G, S2, S2, G * C))

    def up2(a):
        b, h, w_, c = a.shape
        a = jnp.broadcast_to(a[:, :, None, :, None, :],
                             (b, h, 2, w_, 2, c))
        return jnp.reshape(a, (b, h * 2, w_ * 2, c))

    print(f"up2 + conv3x3 {C}->{Cout} at {S2}->{S}:", flush=True)
    results["up_base"] = timed("base", lambda a: conv(up2(a), wu), y)
    results["up_pack_dense"] = timed("pack-dense (steady)",
                                     lambda a: conv(up2(a), wud), yp)
    results["up_pack_group"] = timed("pack-group (steady)",
                                     lambda a: conv(up2(a), wug, G), yp)

    # ---------------- elementwise BN+GLU pass over the 2Cout tensor --------
    z = jax.random.normal(key, (B, S, S, 2 * C), dt)
    zp = jnp.reshape(z, (B // G, S, S, 2 * C * G))  # pure relabel

    def bnglu(a):
        c = a.shape[-1] // 2
        h = a * 1.1 + 0.05  # inference-affine BN
        return h[..., :c] * jax.nn.sigmoid(h[..., c:])

    def bnglu_packed(a):
        # packed layout: [..., G*2C] with per-image [value;gate] blocks
        b, h, w_, cc = a.shape
        a = jnp.reshape(a, (b, h, w_, G, cc // G))
        c = cc // G // 2
        h_ = a * 1.1 + 0.05
        out = h_[..., :c] * jax.nn.sigmoid(h_[..., c:])
        return jnp.reshape(out, (b, h, w_, G * c))

    print(f"BN+GLU pass over [B,{S},{S},{2*C}]:", flush=True)
    results["glu_base"] = timed("base", bnglu, z)
    results["glu_packed"] = timed("packed relabel", bnglu_packed, zp)

    # ------------- int8 requantize pass: BN+GLU+quantize, int8 out --------
    # The int8 serving profile's biggest leak (~22%) is standalone
    # round-nearest-even_convert fusions. int8 min tile is (32, 128) LANES:
    # a C=32 int8 tensor fills 32/128 lanes; packing 4 images -> C=128.
    def requant(a):
        c = a.shape[-1] // 2
        h = a * 1.1 + 0.05
        g = h[..., :c] * jax.nn.sigmoid(h[..., c:])
        return jnp.round(jnp.clip(g.astype(jnp.float32) / 0.02,
                                  -127, 127)).astype(jnp.int8)

    def requant_packed(a):
        b, h, w_, cc = a.shape
        a = jnp.reshape(a, (b, h, w_, G, cc // G))
        c = cc // G // 2
        hh = a * 1.1 + 0.05
        g = hh[..., :c] * jax.nn.sigmoid(hh[..., c:])
        g = jnp.reshape(g, (b, h, w_, G * c))
        return jnp.round(jnp.clip(g.astype(jnp.float32) / 0.02,
                                  -127, 127)).astype(jnp.int8)

    print(f"BN+GLU+int8-requantize over [B,{S},{S},{2*C}]:", flush=True)
    results["rq_base"] = timed("base", requant, z)
    results["rq_packed"] = timed("packed relabel", requant_packed, zp)

    # int8 conv at the up-conv geometry (the int8 serving path's hot op)
    zq = jnp.round(jnp.clip(y.astype(jnp.float32) / 0.02, -127, 127)
                   ).astype(jnp.int8)
    zqp = jnp.reshape(jnp.transpose(
        jnp.reshape(zq, (B // G, G, S2, S2, C)), (0, 2, 3, 1, 4)),
        (B // G, S2, S2, G * C))
    wq = jnp.round(jnp.clip(np.asarray(wu, np.float32) / 0.01, -127, 127)
                   ).astype(jnp.int8)
    wqd = jnp.round(jnp.clip(np.asarray(wud, np.float32) / 0.01, -127, 127)
                    ).astype(jnp.int8)
    wqg = jnp.concatenate([wq] * G, axis=-1)

    def conv_i8(x_, w_, fg=1):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME", feature_group_count=fg,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32).astype(jnp.bfloat16)

    print(f"int8 up2+conv3x3 {C}->{Cout} at {S2}->{S}:", flush=True)
    results["i8_base"] = timed("base", lambda a: conv_i8(up2(a), wq), zq)
    results["i8_pack_dense"] = timed("pack-dense (steady)",
                                     lambda a: conv_i8(up2(a), wqd), zqp)
    results["i8_pack_group"] = timed("pack-group (steady)",
                                     lambda a: conv_i8(up2(a), wqg, G), zqp)

    print("\nsummary (speedup vs base, steady-state):", flush=True)
    for seg in ("head", "up"):
        b = results[f"{seg}_base"]
        for v in ("pack_dense", "pack_group"):
            print(f"  {seg} {v}: {b / results[f'{seg}_{v}']:.2f}x", flush=True)
    print(f"  glu packed: "
          f"{results['glu_base'] / results['glu_packed']:.2f}x", flush=True)
    print(f"  requant packed: "
          f"{results['rq_base'] / results['rq_packed']:.2f}x", flush=True)
    print(f"  int8 up pack-dense: "
          f"{results['i8_base'] / results['i8_pack_dense']:.2f}x", flush=True)
    print(f"  int8 up pack-group: "
          f"{results['i8_base'] / results['i8_pack_group']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
