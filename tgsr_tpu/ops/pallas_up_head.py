"""Pallas TPU kernel: fused upsample -> conv3x3 -> BN -> GLU -> image head.

Motivation (docs/PERF.md): at the final x2 stage the pipeline writes a
[B, 2H, 2W, C] feature tensor to HBM (4.3 GB at B=512) only to re-read it
once for a 3-channel image head -- ~half the HBM traffic of the whole 256px
stage. Both final-stage call sites have this shape:

  GSRNetLow:       h3 = upBlock(h2)         -> img_net3 = conv3x3 -> 3ch
  NetGHighWeight:  o  = upscale8x(residual) -> conv_output = conv5x5 + tanh
                                               -> + a * SRb

This kernel computes the whole chain per output row-tile in VMEM and writes
ONLY the 3-channel image: HBM traffic drops from
(write 2C@4HW + read 2C@4HW + write 3@4HW) to (read Cin@HW + write 3@4HW).

Convs run as k*k shifted [rows*W, Cin] @ [Cin, Cout] MXU matmuls with f32
accumulation. BN is eval-mode, folded to per-channel (mul, add) outside.
SAME-conv boundary semantics (zero padding at the true image edges, for
BOTH convs) are reproduced with absolute-position masking in the kernel.

Exact math = upsample_nearest2x -> conv3x3(SAME) -> BN(eval) -> GLU ->
head conv(SAME) [-> tanh] [+ a*srb]; parity-tested in
tests/test_pallas_up_head.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Eval BatchNorm -> per-channel (mul, add)."""
    mul = scale * jax.lax.rsqrt(var + eps)
    return mul, bias - mean * mul


def _conv_valid(x, w, out_r=None, out_w=None, acc_dtype=jnp.float32):
    """Valid conv of [R, W, Cin] with [kh, kw, Cin, Cout] as kh*kw shifted
    matmuls -> [out_r, out_w, Cout] in acc_dtype.

    Mosaic constraint: the [R, W, C] <-> [R*W, C] collapse requires W to be
    a multiple of 8 (sublane granularity). Callers pass an 8-aligned out_w
    (x must be wide enough: W >= out_w + kw - 1); overhang columns carry
    garbage the caller masks/crops."""
    kh, kw, cin, cout = w.shape
    r, wd, _ = x.shape
    out_r = out_r if out_r is not None else r - kh + 1
    out_w = out_w if out_w is not None else wd - kw + 1
    acc = jnp.zeros((out_r * out_w, cout), acc_dtype)
    for dy in range(kh):
        for dx in range(kw):
            patch = x[dy:dy + out_r, dx:dx + out_w, :]  # static slice
            acc = acc + jax.lax.dot_general(
                patch.reshape(out_r * out_w, cin), w[dy, dx],
                (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype)
    return acc.reshape(out_r, out_w, cout)


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _up2(x):
    # jnp.repeat lowers cleanly in Mosaic; the broadcast+5D-reshape
    # formulation hits an unsupported interleaving shape cast
    return jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("head_k", "use_tanh", "blend", "tile_rows", "interpret"))
def fused_up_head(
    x: jax.Array,  # [B, H, W, Cin]
    w_up: jax.Array,  # [3, 3, Cin, C2]
    bn_mul: jax.Array,  # [C2] folded eval BN
    bn_add: jax.Array,  # [C2]
    w_head: jax.Array,  # [k, k, C2//2, 3]
    srb: Optional[jax.Array] = None,  # [B, 2H, 2W, 3]
    a: Optional[jax.Array] = None,  # scalar blend weight
    head_k: int = 3,
    use_tanh: bool = False,
    blend: bool = False,
    tile_rows: int = 32,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns float32 [B, 2H, 2W, 3] = head(GLU(BN(conv(up2(x))))) [+a*srb]
    without materializing the upsampled features in HBM."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, h, w, cin = x.shape
    c2 = w_up.shape[-1]
    c = c2 // 2
    hh = head_k // 2  # head halo (output rows/cols)
    ih = (hh + 2) // 2  # input halo (source rows/cols)
    goff = 2 * ih - hh - 1  # static slice offset into the valid up-conv out

    th = tile_rows
    while (2 * h) % th:
        th //= 2
    n_tiles = (2 * h) // th
    in_rows = th // 2 + 2 * ih
    g_rows = th + 2 * hh  # GLU rows consumed by the head conv
    g_cols = 2 * w + 2 * hh

    # overlapping input tiles, zero-padded (zeros at the true image edges
    # reproduce the up-conv's SAME padding)
    xp = jnp.pad(x, ((0, 0), (ih, ih), (ih, ih), (0, 0)))
    idx = (jnp.arange(n_tiles)[:, None] * (th // 2)
           + jnp.arange(in_rows)[None, :])  # [n_tiles, in_rows]
    xt = xp[:, idx]  # [B, n_tiles, in_rows, W + 2ih, Cin]

    if srb is None:
        srb = jnp.zeros((b, 2 * h, 2 * w, 3), jnp.float32)
    if a is None:
        a = jnp.zeros((), jnp.float32)
    a2 = jnp.reshape(a.astype(jnp.float32), (1, 1))

    def kernel(x_ref, wup_ref, bnmul_ref, bnadd_ref, whead_ref, srb_ref,
               a_ref, out_ref):
        i = pl.program_id(1)
        xt_ = x_ref[0, 0]  # [in_rows, W+2ih, Cin]
        up = _up2(xt_)
        f = _conv_valid(up, wup_ref[...])  # f32
        f = f * bnmul_ref[...][None, None, :] + bnadd_ref[...][None, None, :]
        g = f[..., :c] * jax.nn.sigmoid(f[..., c:])
        # slice to exactly the head-conv input window (static offsets)
        g = g[goff:goff + g_rows, goff:goff + g_cols, :]
        # zero the halo rows/cols that lie outside the true image (SAME
        # padding semantics of the head conv)
        row_abs = (i * th - hh
                   + jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 0))
        col_abs = (-hh
                   + jax.lax.broadcasted_iota(jnp.int32, (g_rows, g_cols), 1))
        ok = ((row_abs >= 0) & (row_abs < 2 * h)
              & (col_abs >= 0) & (col_abs < 2 * w))
        g = jnp.where(ok[..., None], g, 0.0)
        y = _conv_valid(g.astype(xt_.dtype), whead_ref[...])  # [th, 2W, 3]
        if use_tanh:
            y = jnp.tanh(y)
        if blend:
            y = y + a_ref[0, 0] * srb_ref[0].astype(jnp.float32)
        out_ref[0] = y.astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, in_rows, w + 2 * ih, cin),
                         lambda bi, i: (bi, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, c2), lambda bi, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), lambda bi, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), lambda bi, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((head_k, head_k, c, 3),
                         lambda bi, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, 2 * w, 3), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, th, 2 * w, 3),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, 3), jnp.float32),
        interpret=interpret,
    )(xt, w_up, bn_mul, bn_add, w_head, srb, a2)
    return out


# ---------------------------------------------------------------------------
# Parity-packed formulation: Mosaic-friendly (no in-kernel interleave).
#
# up2+conv3x3 == one 2x2 conv producing 4 parity classes (ops/fused_upsample
# weight transform); the head conv on the INTERLEAVED grid becomes a 3x3
# conv on the PACKED grid with a class-remapped kernel. Intermediates carry
# 4*C2 = 256 channels (full 128-lane tiles); the kernel writes only the
# 12-channel packed image, depth-to-space'd outside.
# ---------------------------------------------------------------------------

import numpy as _np


def pack_head_kernel(wh: _np.ndarray) -> _np.ndarray:
    """[k, k, C, 3] head kernel (SAME conv on the interleaved 2x grid) ->
    [3, 3, 4C, 12] packed-grid kernel.

    For output class q=(dy,dx) at packed pixel (I,J), interleaved tap (u,v)
    reads interleaved row 2I+dy+u-hh = packed row I+s_r of class pr, where
    2*s_r + pr = dy + u - hh. Each (u, parity) pair maps to exactly one
    (s in {-1,0,1}, p) pair, so a 3x3 packed kernel covers k in {3, 5}.
    """
    wh = _np.asarray(wh)
    k, _, c, cout = wh.shape
    hh = k // 2
    out = _np.zeros((3, 3, 4 * c, 4 * cout), wh.dtype)
    for dy in range(2):
        for dx in range(2):
            q = dy * 2 + dx
            for u in range(k):
                t = dy + u - hh
                pr, s_r = t % 2, (t - t % 2) // 2
                if not -1 <= s_r <= 1:
                    raise ValueError("head kernel too large for 3x3 packed")
                for v in range(k):
                    t2 = dx + v - hh
                    pc, s_c = t2 % 2, (t2 - t2 % 2) // 2
                    p = pr * 2 + pc
                    out[s_r + 1, s_c + 1, p * c:(p + 1) * c,
                        q * cout:(q + 1) * cout] += wh[u, v]
    return out


def pack_head_kernel_jnp(wh: jax.Array) -> jax.Array:
    """Traceable pack_head_kernel (static indices, functional updates)."""
    k, _, c, cout = wh.shape
    hh = k // 2
    out = jnp.zeros((3, 3, 4 * c, 4 * cout), wh.dtype)
    for dy in range(2):
        for dx in range(2):
            q = dy * 2 + dx
            for u in range(k):
                t = dy + u - hh
                pr, s_r = t % 2, (t - t % 2) // 2
                for v in range(k):
                    t2 = dx + v - hh
                    pc, s_c = t2 % 2, (t2 - t2 % 2) // 2
                    p = pr * 2 + pc
                    out = out.at[s_r + 1, s_c + 1, p * c:(p + 1) * c,
                                 q * cout:(q + 1) * cout].add(wh[u, v])
    return out


@functools.partial(
    jax.jit,
    static_argnames=("head_k", "use_tanh", "blend", "tile_rows", "interpret"))
def fused_up_head_packed(
    x: jax.Array,  # [B, H, W, Cin]
    w_up: jax.Array,  # [3, 3, Cin, C2] (canonical; packed internally)
    bn_mul: jax.Array,  # [C2]
    bn_add: jax.Array,  # [C2]
    w_head: jax.Array,  # [k, k, C2//2, 3]
    srb: Optional[jax.Array] = None,
    a: Optional[jax.Array] = None,
    head_k: int = 3,
    use_tanh: bool = False,
    blend: bool = False,
    tile_rows: int = 16,  # packed rows per tile (output rows = 2x)
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Same math as fused_up_head, parity-packed internally."""
    from tgsr_tpu.ops.blocks import depth_to_space
    from tgsr_tpu.ops.fused_upsample import fuse_upconv_kernel_jnp

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, h, w, cin = x.shape
    c2 = w_up.shape[-1]
    c = c2 // 2

    wp_up = fuse_upconv_kernel_jnp(w_up.astype(x.dtype))  # [2,2,Cin,4C2]
    wph = pack_head_kernel_jnp(w_head).astype(x.dtype)  # [3,3,4C,12]
    # per-input-class kernels [4, 3, 3, C, 12]: the head conv becomes a SUM
    # of 4 class convs (Mosaic rejects lane-dim concatenation of the GLU
    # blocks, so g classes stay separate)
    wp_head = jnp.stack([wph[:, :, p * c:(p + 1) * c, :] for p in range(4)])
    bn_mul4 = jnp.tile(bn_mul, 4)
    bn_add4 = jnp.tile(bn_add, 4)

    tr = tile_rows
    while h % tr:
        tr //= 2
    n_tiles = h // tr
    # geometry: packed output rows [r0, r0+tr) need g rows [r0-1, r0+tr+1)
    # (3-tap packed head); g row i needs conv2x2-VALID outputs at padded
    # positions i and i+1; conv output at padded position j reads x rows
    # [j-1, j] (source coords). So x rows [r0-2, r0+tr+2) => halo 2.
    ih = 2
    in_rows = tr + 2 * ih
    g_rows = tr + 2  # g rows [r0-1, r0+tr+1)
    # Mosaic needs 8-aligned widths at every [R,W,C]<->[R*W,C] collapse:
    # head out width 8-aligned; g wide enough for the head's dx shifts;
    # up-conv out wide enough for g's dj shifts; input tile wide enough for
    # the up-conv's dx shifts. Overhang columns are masked/cropped.
    head_w = _round8(w)
    g_cols = head_w + 2
    co_w = _round8(g_cols + 1)
    xt_w = co_w + 1
    pad_r = xt_w - w - ih  # right/bottom-extra pad beyond the halo
    xp = jnp.pad(x, ((0, 0), (ih, ih), (ih, pad_r), (0, 0)))
    idx = jnp.arange(n_tiles)[:, None] * tr + jnp.arange(in_rows)[None, :]
    xt = xp[:, idx]  # [B, n_tiles, in_rows, xt_w, Cin]

    def kernel(x_ref, wup_ref, bnmul_ref, bnadd_ref, whead_ref, out_ref):
        i = pl.program_id(1)
        xt_ = x_ref[0, 0]  # [in_rows, xt_w, Cin]
        co = _conv_valid(xt_, wup_ref[...],
                         out_w=co_w)  # [in_rows-1, co_w, 4C2] f32
        co = co * bnmul_ref[...][None, None, :] + bnadd_ref[...][None, None, :]
        # GLU stays f32: Mosaic's bf16 logistic lowering trips a
        # vector.broadcast verification error
        # boundary mask (zero g outside the true image = SAME semantics of
        # BOTH convs at the image edges)
        row_abs = (i * tr - 1 + jax.lax.broadcasted_iota(
            jnp.int32, (g_rows, g_cols, 1), 0))
        col_abs = (-1 + jax.lax.broadcasted_iota(
            jnp.int32, (g_rows, g_cols, 1), 1))
        ok = ((row_abs >= 0) & (row_abs < h) & (col_abs >= 0) & (col_abs < w))
        # head conv = sum over the 4 parity classes (kept separate --
        # lane-dim concatenation is not lowerable)
        y = jnp.zeros((tr * head_w, 12), jnp.float32)
        for di in range(2):
            for dj in range(2):
                p = di * 2 + dj
                blk = co[di:di + g_rows, dj:dj + g_cols,
                         p * c2:(p + 1) * c2]
                gp = blk[..., :c] * jax.nn.sigmoid(blk[..., c:])
                gp = jnp.where(ok, gp, 0.0).astype(xt_.dtype)
                yp = _conv_valid(gp, whead_ref[p], out_r=tr, out_w=head_w)
                y = y + yp.reshape(tr * head_w, 12)
        y = y.reshape(tr, head_w, 12)
        if use_tanh:
            y = jnp.tanh(y)
        out_ref[0] = y[:, :w].astype(out_ref.dtype)

    packed = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, in_rows, xt_w, cin),
                         lambda bi, i: (bi, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, cin, 4 * c2), lambda bi, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c2,), lambda bi, i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c2,), lambda bi, i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 3, 3, c, 12), lambda bi, i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, w, 12), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 12), jnp.float32),
        interpret=interpret,
    )(xt, wp_up, bn_mul4, bn_add4, wp_head)

    y = depth_to_space(packed, 2)  # [B, 2H, 2W, 3]
    if blend:
        y = y + a.astype(jnp.float32) * srb.astype(jnp.float32)
    return y


def reference_up_head(x, w_up, bn_mul, bn_add, w_head, srb=None, a=None,
                      use_tanh=False, blend=False):
    """Unfused reference (same math via XLA ops) for parity tests."""
    from tgsr_tpu.ops.blocks import upsample_nearest2x

    up = upsample_nearest2x(x)
    h = jax.lax.conv_general_dilated(
        up, w_up.astype(up.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    h = h * bn_mul + bn_add
    c = h.shape[-1] // 2
    g = (h[..., :c] * jax.nn.sigmoid(h[..., c:])).astype(x.dtype)
    k = w_head.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        g, w_head.astype(g.dtype), (1, 1), [(k, k), (k, k)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if use_tanh:
        y = jnp.tanh(y)
    if blend:
        y = y + a.astype(jnp.float32) * srb.astype(jnp.float32)
    return y
