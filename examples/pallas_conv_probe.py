"""Go/no-go probe for the whole-stage Pallas fusion (VERDICT round-2 #4).

The proposed whole-stage kernel (resblock x2 + attention + upsample per
VMEM tile) spends most of its time in conv3x3 matmuls, so it can only win
if Pallas conv throughput matches XLA's measured 144 TFLOP/s (73% MXU
peak) at the model's hot geometry (h_net3 resblock conv: [B,128,128,64]
-> [B,128,128,128] bf16, reference math util.py:781-823).  XLA reaches
that rate via implicit im2col (contraction K = 9*Cin = 576 >= the 128
MXU lanes); the round-1 house formulation (9 shifted K=64 matmuls,
ops/pallas_up_head.py:_conv_valid) caps at ~50% MXU by construction.

Variants measured here (bf16, f32 accumulation, forced sync):

  xla    lax.conv_general_dilated baseline
  tap9   9 shifted K=64 matmuls (round-1 formulation)
  im2col patch buffer [TILE*W, 640] built by lane-concat of tap pairs
         (9 taps + 1 dup padded to 10 -> 5 aligned 128-lane blocks,
         dummy block zeroed in the weights), one K=640 MXU dot
  dotceil the same K=640 dot WITHOUT patch building (MXU ceiling)

Decision rule: if best-of(tap9, im2col) is well below xla, the
whole-stage fusion cannot pay for its conv content and is a measured
negative; if im2col ~ xla, the fusion's HBM savings ride on top and the
stage kernel is worth building.

Run on the TPU: python examples/pallas_conv_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, CIN, COUT = 64, 128, 128, 64, 128
TILE = 16  # output rows per inner step (32 exceeds the 16 MB VMEM budget)
NT = H // TILE


def timed(name, fn, *args, reps=10, flops=None):
    @jax.jit
    def run(salt, *a):
        def body(c, i):
            out = fn(a[0] + (salt + i).astype(a[0].dtype) * 1e-6, *a[1:])
            return c + jnp.sum(out.astype(jnp.float32)), ()

        t, _ = jax.lax.scan(body, 0.0, jnp.arange(reps))
        return t

    float(run(jnp.float32(0), *args))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.float32(1), *args))
    dt = (time.perf_counter() - t0) / reps
    rate = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:28s} {dt * 1e3:8.2f} ms{rate}", flush=True)
    return dt


CONV_FLOPS = 2 * B * H * W * 9 * CIN * COUT


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


# ---------------------------------------------------------------- tap9 --
def _tap9_kernel(xp_ref, w_ref, o_ref):
    t = pl.program_id(1)
    r0 = t * TILE
    acc = jnp.zeros((TILE * W, COUT), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp_ref[0, pl.ds(r0 + dy, TILE), dx:dx + W, :]
            acc = acc + jax.lax.dot_general(
                patch.reshape(TILE * W, CIN), w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(TILE, W, COUT).astype(jnp.bfloat16)


@jax.jit
def tap9(x, w):  # w: [3,3,CIN,COUT]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wk = w.reshape(9, CIN, COUT)
    return pl.pallas_call(
        _tap9_kernel,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, CIN), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((9, CIN, COUT), lambda b, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, W, COUT), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), jnp.bfloat16),
    )(xp, wk)


# -------------------------------------------------------------- im2col --
def _im2col_kernel(xp_ref, w_ref, o_ref, patches):
    t = pl.program_id(1)
    r0 = t * TILE

    def tap(i):
        dy, dx = divmod(i, 3)
        return xp_ref[0, pl.ds(r0 + dy, TILE),
                      dx:dx + W, :].reshape(TILE * W, CIN)

    for p in range(5):
        a = tap(2 * p)
        b = tap(2 * p + 1) if 2 * p + 1 < 9 else a  # dup; weights zeroed
        patches[:, p * 128:(p + 1) * 128] = jnp.concatenate([a, b], axis=-1)
    acc = jax.lax.dot_general(
        patches[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(TILE, W, COUT).astype(jnp.bfloat16)


def _pack_w(w):
    """[3,3,CIN,COUT] -> [640, COUT] matching the paired-tap patch layout."""
    wk = np.asarray(w, np.float32).reshape(9, CIN, COUT)
    out = np.zeros((640, COUT), np.float32)
    for p in range(5):
        out[p * 128:p * 128 + 64] = wk[2 * p]
        if 2 * p + 1 < 9:
            out[p * 128 + 64:(p + 1) * 128] = wk[2 * p + 1]
    return jnp.asarray(out, jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def im2col(x, wp, interpret=False):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        _im2col_kernel,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, CIN), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((640, COUT), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, W, COUT), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TILE * W, 640), jnp.bfloat16)],
        interpret=interpret,
    )(xp, wp)


# --------------------------------------------------------------- pair5 --
PTILE = 32  # no patch scratch -> VMEM allows the bigger tile


def _pair5_kernel(xp_ref, w_ref, o_ref):
    t = pl.program_id(1)
    r0 = t * PTILE

    def tap(i):
        dy, dx = divmod(i, 3)
        return xp_ref[0, pl.ds(r0 + dy, PTILE),
                      dx:dx + W, :].reshape(PTILE * W, CIN)

    acc = jnp.zeros((PTILE * W, COUT), jnp.float32)
    for p in range(5):
        a = tap(2 * p)
        b = tap(2 * p + 1) if 2 * p + 1 < 9 else a  # dup; weights zeroed
        acc = acc + jax.lax.dot_general(
            jnp.concatenate([a, b], axis=-1), w_ref[p * 128:(p + 1) * 128],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(PTILE, W, COUT).astype(jnp.bfloat16)


@jax.jit
def pair5(x, wp):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        _pair5_kernel,
        grid=(B, H // PTILE),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, CIN), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((640, COUT), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, PTILE, W, COUT),
                               lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), jnp.bfloat16),
    )(xp, wp)


# ------------------------------------------------------------- dotceil --
def _dotceil_kernel(p_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(
        p_ref[0], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(jnp.bfloat16)


@jax.jit
def dotceil(p, wp):  # p: [B*NT, TILE*W, 640]
    return pl.pallas_call(
        _dotceil_kernel,
        grid=(B * NT,),
        in_specs=[
            pl.BlockSpec((1, TILE * W, 640), lambda i: (i, 0, 0)),
            pl.BlockSpec((640, COUT), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE * W, COUT), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * NT, TILE * W, COUT),
                                       jnp.bfloat16),
    )(p, wp)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.device_put(
        jax.random.normal(key, (B, H, W, CIN), jnp.bfloat16) * 0.1)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, CIN, COUT),
                          jnp.bfloat16) * 0.05
    wp = _pack_w(w)
    print(f"device {jax.devices()[0].device_kind}, conv3x3 "
          f"[{B},{H},{W},{CIN}]->[{B},{H},{W},{COUT}] bf16, "
          f"{CONV_FLOPS/1e9:.1f} GFLOP", flush=True)

    # numeric check first (vs XLA)
    ref = np.asarray(xla_conv(x, w), np.float32)
    got = np.asarray(im2col(x, wp), np.float32)
    err = np.max(np.abs(ref - got))
    print(f"im2col max|err| vs XLA conv: {err:.4f}", flush=True)
    assert err < 0.5, "im2col parity broken"

    timed("xla conv", xla_conv, x, w, flops=CONV_FLOPS)
    try:
        timed("pallas tap9 (K=64 x9)", tap9, x, w, flops=CONV_FLOPS)
    except Exception as e:  # noqa: BLE001
        print(f"tap9 failed: {type(e).__name__}: {str(e)[:200]}")
    try:
        timed("pallas im2col (K=640)", im2col, x, wp, flops=CONV_FLOPS)
    except Exception as e:  # noqa: BLE001
        print(f"im2col failed: {type(e).__name__}: {str(e)[:200]}")
    try:
        err5 = float(np.max(np.abs(
            np.asarray(pair5(x, wp), np.float32) - ref)))
        print(f"pair5 max|err| vs XLA conv: {err5:.4f}", flush=True)
        timed("pallas pair5 (5x K=128)", pair5, x, wp, flops=CONV_FLOPS)
    except Exception as e:  # noqa: BLE001
        print(f"pair5 failed: {type(e).__name__}: {str(e)[:200]}")
    p = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(2), (B * NT, TILE * W, 640), jnp.bfloat16) * 0.1)
    timed("pure K=640 dot (ceiling)", dotceil, p, wp,
          flops=2 * B * NT * TILE * W * 640 * COUT)


if __name__ == "__main__":
    main()
