"""Algebraic fusion of nearest-x2-upsample + conv3x3 (the upBlock hot path).

Every upBlock in the generator stack (util.py:74-80) computes
    y = conv3x3(nearest_up2(x))
at the UPSAMPLED resolution -- the single most FLOP-expensive pattern in the
model (the 256px upsample conv alone is ~25% of total inference FLOPs).

Because nearest upsampling repeats each source pixel 2x2, every output pixel
only ever sees a 2x2 window of SOURCE pixels, with kernel taps that collapse
by output parity class (di, dj):

    y[2i+di, 2j+dj] = sum_{k,l in 3x3} w[k,l] * x[(2i+di+k-1)//2, (2j+dj+l-1)//2]
                    = sum_{m,n in 2x2} w'[di,dj,m,n] * x[i+m-1+?, j+n-1+?]

so the whole op is exactly one 2x2 conv producing 4*Cout channels followed
by depth_to_space(2): 16/36 = 0.44x the FLOPs, and the conv runs at the
SMALL resolution with 4x the output channels -- a strictly better shape for
the 128-lane MXU than 3x3 at the doubled resolution with few channels.

Weight transformation (done once at load time):
  parity class (di, dj) selects taps of w whose source index maps to the
  same x pixel. For output position 2i+di, kernel tap k (0..2) reads
  upsampled row 2i+di+k-1, i.e. source row (2i+di+k-1)//2 = i + (di+k-1)//2.
  Offsets (di+k-1)//2 take values in {-1, 0} for di=0 and {0, 1} for di=1 --
  always two distinct source rows => effective kernel height 2 for each
  parity (taps summed where offsets coincide).

Numerical parity with upsample_nearest2x+conv is exact (same additions in a
different order, f32) and verified in tests/test_fused_upsample.py.

MEASURED RESULT (v5e, bf16, B=512 x M=8 scan, forced sync): the fused form
benches SLOWER end-to-end (1816 vs 2997 img/s). XLA already fuses the
nearest-upsample broadcast into the conv (no extra HBM traffic), while this
form pays 4 output slices + concat + depth_to_space shuffles at the large
resolution. Kept as an opt-in (`UpBlock(fused=True)`) and a documented
negative result: the FLOP win does not survive the added data movement at
these channel widths.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tgsr_tpu.ops.blocks import depth_to_space


def fuse_upconv_kernel(w: np.ndarray) -> np.ndarray:
    """Transform a 3x3 HWIO kernel (for conv-on-upsampled) into the
    equivalent 2x2 HWIO kernel with 4x output channels (parity-packed).

    Input  w:  [3, 3, Cin, Cout]
    Output w': [2, 2, Cin, 4*Cout], channel order c' = (di*2 + dj)*Cout + c
               matching depth_to_space(2) pixel order (di, dj) = (row, col).
    """
    w = np.asarray(w)
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, "fusion derived for 3x3 kernels"
    out = np.zeros((2, 2, cin, 4 * cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            for k in range(3):
                # source row offset relative to i-1 (so index m in 0..1):
                # (di + k - 1) // 2 in {-1, 0} or {0, 1}; shift to m = off+1
                # for di=0 (offsets -1,0) and m = off for di=1 (offsets 0,1)
                off_r = (di + k - 1) // 2
                m = off_r + (1 if di == 0 else 0)
                for l in range(3):
                    off_c = (dj + l - 1) // 2
                    n = off_c + (1 if dj == 0 else 0)
                    out[m, n, :, (di * 2 + dj) * cout:(di * 2 + dj + 1) * cout] += \
                        w[k, l]
    return out


def fuse_upconv_kernel_jnp(w: jax.Array) -> jax.Array:
    """Traceable version of fuse_upconv_kernel (jnp, no python loops over
    data): builds the [2, 2, Cin, 4*Cout] parity-packed kernel from a
    [3, 3, Cin, Cout] kernel. XLA constant-folds this against the weights."""
    cout = w.shape[-1]
    zero = jnp.zeros_like(w[0, 0])
    rows = {
        # per parity di: effective 2-tap row kernels (see fuse_upconv_kernel)
        0: (w[0], w[1] + w[2]),
        1: (w[0] + w[1], w[2]),
    }

    def cols(wrow, dj):
        # wrow: [3(cols), Cin, Cout] -> 2-tap column kernels
        if dj == 0:
            return (wrow[0], wrow[1] + wrow[2])
        return (wrow[0] + wrow[1], wrow[2])

    out = []
    for di in range(2):
        # first collapse rows: r[m] = effective row kernel [3, Cin, Cout]
        r0, r1 = rows[di]
        for dj in range(2):
            c00, c01 = cols(r0, dj)
            c10, c11 = cols(r1, dj)
            # [2, 2, Cin, Cout] for this parity class
            out.append(jnp.stack([jnp.stack([c00, c01]),
                                  jnp.stack([c10, c11])]))
    # concat classes on the output-channel axis: order (di*2 + dj)
    return jnp.concatenate(out, axis=-1)


def upconv2x_fused(x: jax.Array, w_fused: jax.Array) -> jax.Array:
    """y = conv3x3(nearest_up2(x)) computed as one 2x2 SAME-ish conv at the
    SOURCE resolution + depth_to_space.

    Padding: the 3x3 conv on the upsampled [2H, 2W] grid pads one upsampled
    pixel each side == HALF a source pixel; parity class 0 rows need the
    top/left source pad, class 1 rows need bottom/right. With the m/n shift
    used in fuse_upconv_kernel, all classes read source window rows
    [i-1+m_base, i+m_base], so padding (1, 1) on each side and a 2x2 VALID
    conv... reduces to SAME with offset: pad (1, 0) for class 0 and (0, 1)
    for class 1 -- unified below by padding (1, 1) and slicing.
    """
    b, h, w_, cin = x.shape
    c4 = w_fused.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # one 2x2 VALID conv over the padded grid -> [B, H+1, W+1, 4*Cout]
    y = jax.lax.conv_general_dilated(
        xp, w_fused, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    cout = c4 // 4
    # class (0,*) uses windows starting at row i-1+1=i (in padded coords:
    # rows [i, i+1] -> conv output index i); class (1,*) uses rows
    # [i+1, i+2] -> conv output index i+1. Same for columns.
    y00 = y[:, :-1, :-1, 0 * cout:1 * cout]
    y01 = y[:, :-1, 1:, 1 * cout:2 * cout]
    y10 = y[:, 1:, :-1, 2 * cout:3 * cout]
    y11 = y[:, 1:, 1:, 3 * cout:4 * cout]
    packed = jnp.concatenate([y00, y01, y10, y11], axis=-1)
    return depth_to_space(packed, 2)
