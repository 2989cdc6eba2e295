"""Int8 quantized inference (TPU-native serving mode).

The x8 SR pipeline is HBM-bandwidth-bound with its hottest convs at ~73% of
bf16 MXU peak (docs/PERF.md round-2 profile). The v5e MXU runs int8 at 2x
the bf16 rate and int8 activations halve HBM traffic, so a quantized
serving path is the one remaining large lever. This module implements
post-training symmetric int8 quantization for every conv in the generator
stack:

  * weights: per-output-channel absmax int8 (computed from the loaded
    checkpoint at trace time; XLA folds it)
  * activations: per-tensor static scales, calibrated by running the bf16
    pipeline on representative inputs and recording per-conv input absmax
  * accumulation in int32 on the MXU, dequantized per-channel into the
    bf16 epilogue (BN/GLU/bias unchanged)

No model-code changes: a flax method interceptor (nn.intercept_methods)
substitutes the quantized conv at every nn.Conv call site, plus the
UpBlock hot path (ops/blocks.py:138-171, a raw lax conv on a nearest-up2
input — quantization happens BEFORE the upsample, which commutes, so the
broadcast also moves 2x less data).

There is no reference analogue (the reference is f32-only, single GPU);
this is framework-level serving infrastructure. Fidelity is measured, not
assumed: tests pin the quantized conv math, and bench/PERF.md record the
e2e PSNR delta of the quantized pipeline against the f32 protocol metric.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgsr_tpu.models.generator_hf import _ResidualSeq
from tgsr_tpu.ops.blocks import ResBlock, UpBlock, glu, upsample_nearest2x

QMAX = 127.0

# UpBlock call sites whose GLU output is requantized by a following int8
# conv (next stage's residual conv1 / next upscale) -- the sites where the
# value/gate conv split pays (see quant_interceptor's split_glu). The final
# upsample of each stack (h_net3, upscale8x) feeds only a bf16 image head
# and stays single-conv. Keys are matched against the calibrated-scales
# keys, so entries absent from a family (e.g. the x16 variants) are inert.
SPLIT_GLU_INT8_CONSUMERS = frozenset({
    "h_net1/upsample/conv", "h_net2/upsample/conv",
    "upscale2x/conv", "upscale4x/conv",
})

# UpBlocks whose GLU output feeds (an) image head(s). With bf16 heads the
# GLU is a free conv-input fusion there and splitting regresses (round-2/3
# measurements); when the heads themselves run int8 these consumers become
# int8 convs and the split pays. `effective_split_glu` applies them
# conditionally on the scales dict actually containing head entries.
HEAD_FEEDING_UPBLOCKS = frozenset({
    "h_net3/upsample/conv", "upscale8x/conv", "upscale16x/conv",
})


def heads_quantized(scales: Dict[str, float]) -> bool:
    """True when the scales dict quantizes the image heads."""
    return any("img_net" in k or "conv_output" in k for k in scales)


def effective_split_glu(scales: Dict[str, float]) -> frozenset:
    """The UpBlock split set for a given scales dict: the always-on
    int8-consumer sites, plus the head-feeding sites iff the heads are
    quantized (measured +3.6% e2e with int8 heads, regression with bf16
    heads — docs/PERF.md "Int8 image heads")."""
    if heads_quantized(scales):
        return SPLIT_GLU_INT8_CONSUMERS | HEAD_FEEDING_UPBLOCKS
    return SPLIT_GLU_INT8_CONSUMERS

# Quantized UpBlock sites computed as the ALGEBRAIC upsample-conv fusion
# (ops/fused_upsample.py): one 2x2 int8 conv at the SOURCE resolution
# producing the 4 parity classes, packed BN+GLU, depth_to_space. In bf16
# this formulation measured SLOWER (XLA fuses the nearest-up2 broadcast
# into a bf16 conv for free -- docs/PERF.md "Negative results"), but the
# TPU conv emitter does NOT fuse an s8 broadcast: the int8 path
# materializes every upsampled activation (3 GiB + 1.5 GiB per B=768
# microbatch at the two 256px sites alone, 6.7% of device time standing
# broadcasts in the round-3 profile), so the trade flips and is
# re-measured per site in the int8 regime (examples/split_glu_ab.py
# --fusedup).
FUSED_UP_SITES = frozenset()

# Sites whose GLU output feeds exactly ONE int8 conv (the image heads read
# the final UpBlocks directly): the fused path may pre-quantize with the
# consumer's input scale and depth_to_space in int8 (1 byte moved instead
# of 2); the consumer's own quantize_act then round-trips bit-exactly
# (round(round(x/s)*s/s) == round(x/s) on exactly-representable products).
FUSED_UP_OUT_CONSUMER = {
    "h_net3/upsample/conv": "img_net3/conv",
    "upscale8x/conv": "conv_output/conv",
    "upscale16x/conv": "conv_output/conv",
}

# ResBlock/_ResidualSeq module paths whose conv1 gets the same value/gate
# split: inside these blocks the GLU output is ALWAYS requantized by the
# block's own int8 conv2, i.e. every site pays the standalone
# GLU+requantize pass that two separate buffers run 2.6x faster
# (docs/PERF.md "Serving design-space closure"). Measured e2e
# (examples/split_glu_ab.py --res, v5e, B=768 x M=64): the 64/128px
# sites alone win 4607 vs 4007 img/s (+15.0%); adding the 32px blocks
# wins further (4662, +16.2%) — unlike the UpBlock case there is no
# bf16-head consumer anywhere in this family, so EVERY site pays the
# slow half-read pass and every split is profit. Keys match the
# calibrated-scales paths, so entries absent from a family are inert.
SPLIT_RES_GLU_SITES = frozenset(
    {
        # GSRNetLow: per-stage resblocks (32/64/128px)
        "h_net1/residual_0", "h_net1/residual_1",
        "h_net2/residual_0", "h_net2/residual_1",
        "h_net3/residual_0", "h_net3/residual_1",
        # NetGHighWeight: the 6 LR-resolution resblocks + the residual
        # sequences (64/128px; residual816 exists only in the x16
        # fix_bugs=True variant and is inert otherwise)
        "residual24", "residual48", "residual816",
    }
    | {f"residual_{i}" for i in range(6)}
)


def quantize_kernel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """HWIO kernel -> (int8 kernel, per-output-channel step) with symmetric
    absmax scaling: w ~= wq * step[None, None, None, :]."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=(0, 1, 2))
    step = jnp.maximum(absmax, 1e-12) / QMAX
    wq = jnp.round(w32 / step).astype(jnp.int8)
    return wq, step


def quantize_act(x: jax.Array, scale: float) -> Tuple[jax.Array, jax.Array]:
    """Per-tensor symmetric activation quantization: x ~= xq * step."""
    step = jnp.asarray(max(scale, 1e-12) / QMAX, jnp.float32)
    xq = jnp.round(
        jnp.clip(x.astype(jnp.float32) / step, -QMAX, QMAX)).astype(jnp.int8)
    return xq, step


def _norm_strides(s) -> Sequence[int]:
    if s is None:
        return (1, 1)
    if isinstance(s, int):
        return (s, s)
    return tuple(s)


def quant_conv(x: jax.Array, kernel: jax.Array, scale: float,
               strides=(1, 1), padding="SAME",
               feature_group_count: int = 1,
               out_dtype=jnp.bfloat16) -> jax.Array:
    """int8 x int8 -> int32 conv, dequantized per-output-channel.

    `scale` is the calibrated input absmax; symmetric quantization keeps
    quantized zero == 0, so SAME zero-padding is exact.
    """
    xq, x_step = quantize_act(x, scale)
    wq, w_step = quantize_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        xq, wq, _norm_strides(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (x_step * w_step)).astype(out_dtype)


def _conv_key(path: Tuple[str, ...]) -> str:
    return "/".join(path)


def _eligible(mod, method_name: str) -> Optional[str]:
    """Returns the scales-dict key when this interceptor call is a conv we
    quantize, else None."""
    if method_name != "__call__" or mod.is_initializing():
        return None
    if isinstance(mod, nn.Conv):
        return _conv_key(mod.path)
    if isinstance(mod, UpBlock) and not mod.fused:
        # the raw lax conv inside UpBlock holds its kernel under <path>/conv
        return _conv_key(tuple(mod.path) + ("conv",))
    return None


def _bn_affine(p: Dict[str, jax.Array], s: Dict[str, jax.Array]
               ) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode BatchNorm folded to a per-channel (mul, add) affine in
    f32 (eps 1e-5, matching ops.blocks.batch_norm)."""
    mul = p["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        s["var"].astype(jnp.float32) + 1e-5)
    add = p["bias"].astype(jnp.float32) - s["mean"].astype(jnp.float32) * mul
    return mul, add


def _int8_seg_fn(inp, x_step, wq, w_step, affine, out_dtype):
    """Shared per-output-channel-slice segment primitive for the value/gate
    split paths: int8 conv on `inp` restricted to kernel columns [lo, hi),
    dequantized, with an optional folded-BN (mul, add) affine."""
    def seg(lo, hi):
        y = jax.lax.conv_general_dilated(
            inp, wq[..., lo:hi], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (x_step * w_step[lo:hi])
        if affine is not None:
            mul, add = affine
            y = y * mul[lo:hi] + add[lo:hi]
        return y.astype(out_dtype)

    return seg


def _res_block_split(mod, x, scales: Dict[str, float]):
    """conv1 -> [BN1] -> GLU -> conv2 -> [BN2] [+ identity] with conv1
    split into its GLU value/gate halves as two int8 convs.

    Numerically this is the single int8 conv1 sliced in two (weight
    quantization is per-output-channel and the conv is output-channel-
    separable), but the value and gate arrive as SEPARATE buffers, so the
    GLU combine + conv2 requantize avoids XLA's slow lowering of two
    channel-half reads of one buffer (docs/PERF.md "GLU+requantize pass").
    BN runs as the folded f32 affine (same as the UpBlock branch)."""
    k1 = _conv_key(tuple(mod.path) + ("conv1",))
    k2 = _conv_key(tuple(mod.path) + ("conv2",))
    p = mod.variables["params"]
    use_bn = getattr(mod, "use_bn", True)
    xq, x_step = quantize_act(x, scales[k1])
    wq, w_step = quantize_kernel(p["conv1"]["kernel"])
    affine1 = (_bn_affine(p["bn1"], mod.variables["batch_stats"]["bn1"])
               if use_bn else None)
    seg = _int8_seg_fn(xq, x_step, wq, w_step, affine1, x.dtype)
    c = wq.shape[-1] // 2
    h = seg(0, c) * jax.nn.sigmoid(seg(c, 2 * c))
    y = quant_conv(h, p["conv2"]["kernel"], scales[k2],
                   out_dtype=jnp.float32)
    if use_bn:
        mul2, add2 = _bn_affine(p["bn2"], mod.variables["batch_stats"]["bn2"])
        y = y * mul2 + add2
    y = y.astype(x.dtype)
    # ResBlock has the identity skip; _ResidualSeq does not (model.py:229-232)
    return y + x if isinstance(mod, ResBlock) else y


def _fused_up_int8(mod, x, key: str, scales: Dict[str, float],
                   out_scale: Optional[float] = None) -> jax.Array:
    """Quantized UpBlock via the algebraic upsample-conv fusion.

    conv3x3(nearest_up2(x)) == depth_to_space(conv2x2_phases(x)): the 3x3
    kernel collapses to a [2, 2, Cin, 4*Cout] parity-packed kernel at the
    SOURCE resolution (ops/fused_upsample.py, parity derivation there), so
    the s8 upsample broadcast that XLA materializes in the int8 path never
    exists. Weight quantization happens on the TRANSFORMED kernel
    (per phase x output channel -- finer granularity than the unfused
    per-channel scale, same |error| bound), BN folds to the f32 affine
    tiled across the 4 phases, GLU combines per phase in the packed
    domain, and depth_to_space runs on the GLU output (int8 when
    `out_scale` -- the single int8 consumer's calibrated input scale -- is
    known, bf16 otherwise)."""
    from tgsr_tpu.ops.fused_upsample import fuse_upconv_kernel_jnp

    xq, x_step = quantize_act(x, scales[key])
    w = mod.variables["params"]["conv"]["kernel"]
    cout = w.shape[-1]
    wq, w_step = quantize_kernel(fuse_upconv_kernel_jnp(
        w.astype(jnp.float32)))
    if mod.use_bn:
        mul, add = _bn_affine(mod.variables["params"]["bn"],
                              mod.variables["batch_stats"]["bn"])
    c2 = cout // 2
    # One VALID 2x2 conv PER PHASE with per-phase padding (phase (di, dj)
    # reads source rows i-1+di..i+di => pad (1-di, di)): each conv's
    # int32 output feeds straight into its own dequant+BN+GLU epilogue, so
    # nothing int32 or pre-GLU ever materializes. (A single 4*Cout conv
    # over a (1,1)-padded halo is fewer dispatches but its 4 offset
    # slices block epilogue fusion -- XLA materializes the full
    # s32[B,H+1,W+1,4*Cout] halo buffer, 13 GiB at the 256px site.)
    hs = []
    for ph, (di, dj) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        yp = jax.lax.conv_general_dilated(
            xq, wq[..., ph * cout:(ph + 1) * cout], (1, 1),
            [(1 - di, di), (1 - dj, dj)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )  # [B, H, W, Cout]
        yp = yp.astype(jnp.float32) * (
            x_step * w_step[ph * cout:(ph + 1) * cout])
        if mod.use_bn:
            yp = yp * mul + add
        hs.append(yp[..., :c2] * jax.nn.sigmoid(yp[..., c2:]))
    packed = jnp.concatenate(hs, axis=-1)  # [B, H, W, 4*(Cout//2)] f32
    from tgsr_tpu.ops.blocks import depth_to_space

    if out_scale is not None:
        pq, p_step = quantize_act(packed, out_scale)
        return (depth_to_space(pq, 2).astype(jnp.float32)
                * p_step).astype(x.dtype)
    return depth_to_space(packed.astype(x.dtype), 2)


def calib_interceptor(records: Dict[str, jax.Array]) -> Callable:
    """Interceptor recording per-conv input absmax into `records` (traced
    scalars; return them from the surrounding jit to fetch)."""

    def interceptor(next_fun, args, kwargs, context):
        key = _eligible(context.module, context.method_name)
        if key is not None:
            m = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
            records[key] = jnp.maximum(records[key], m) \
                if key in records else m
        return next_fun(*args, **kwargs)

    return interceptor


def quant_interceptor(scales: Dict[str, float],
                      out_dtype=jnp.bfloat16,
                      split_glu: Optional[frozenset] = None,
                      split_res: Optional[frozenset] = None,
                      fused_up: Optional[frozenset] = None) -> Callable:
    """Interceptor substituting int8 convs for every nn.Conv / UpBlock whose
    path has a calibrated scale. Paths absent from `scales` run unquantized
    (the mechanism for keeping e.g. image heads in bf16).

    `split_glu`: UpBlock conv keys whose int8 conv is split into its GLU
    value/gate halves so the two arrive as SEPARATE buffers. Round-3
    decomposition (docs/PERF.md "GLU+requantize pass"): the standalone
    GLU+requantize pass following a single-conv UpBlock is bound by XLA's
    lowering of the two same-buffer channel-half reads (10.9 ms vs 2.9 ms
    traffic floor at [256,256,256,64]; two separate buffers: 4.3 ms;
    isolated conv chain: split wins 1.41x). But splitting EVERY UpBlock
    regresses e2e (3808 vs 3911 img/s) because GLU outputs feeding only
    bf16 image heads were free conv-input fusions; the split only pays
    where the consumer is another int8 conv (a real requantize pass)."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        # Whole-block value/gate split for ResBlock/_ResidualSeq sites
        # (see _res_block_split). Falls through to the per-conv path when
        # the site is not opted in or scales are missing.
        if (split_res and isinstance(mod, (ResBlock, _ResidualSeq))
                and context.method_name == "__call__"
                and not mod.is_initializing()):
            base = _conv_key(mod.path)
            train = kwargs.get("train",
                               args[1] if len(args) > 1 else False)
            if (base in split_res and not train
                    and _conv_key(tuple(mod.path) + ("conv1",)) in scales
                    and _conv_key(tuple(mod.path) + ("conv2",)) in scales):
                return _res_block_split(mod, args[0], scales)
        key = _eligible(mod, context.method_name)
        if key is None or key not in scales:
            return next_fun(*args, **kwargs)
        if isinstance(mod, nn.Conv):
            if (mod.kernel_dilation not in (1, (1, 1), None)
                    or mod.input_dilation not in (1, (1, 1), None)):
                return next_fun(*args, **kwargs)
            x = args[0]
            y = quant_conv(x, mod.variables["params"]["kernel"], scales[key],
                           strides=mod.strides, padding=mod.padding,
                           feature_group_count=mod.feature_group_count,
                           out_dtype=x.dtype)
            if mod.use_bias:
                y = y + mod.variables["params"]["bias"].astype(y.dtype)
            return y
        # UpBlock: quantize BEFORE the nearest-up2 (commutes; the broadcast
        # then moves int8), conv in int8, BN(eval)+GLU epilogue.
        #
        # Round-2 negative (docs/PERF.md int8 section): splitting EVERY
        # UpBlock conv into its GLU value/gate halves benches slower e2e
        # (3808 vs 3911 img/s round 3; 3634 vs 3812 for the round-2
        # epilogue-riding variant) -- GLU outputs read by bf16 heads were
        # free conv-input fusions. Keys in `split_glu` opt into the split
        # (numerically exact: weight quantization and the conv are both
        # output-channel-separable) for call sites whose consumer is an
        # int8 conv, where the standalone GLU+requantize pass runs 2.6x
        # faster on two separate buffers (examples/glu_pass_probe.py).
        x = args[0]
        train = kwargs.get("train", args[1] if len(args) > 1 else False)
        if train:
            return next_fun(*args, **kwargs)
        if fused_up and key in fused_up:
            out_key = FUSED_UP_OUT_CONSUMER.get(key)
            return _fused_up_int8(
                mod, x, key, scales,
                out_scale=scales.get(out_key) if out_key else None)
        xq, x_step = quantize_act(x, scales[key])
        wq, w_step = quantize_kernel(mod.variables["params"]["conv"]["kernel"])
        up = upsample_nearest2x(xq)
        affine = (_bn_affine(mod.variables["params"]["bn"],
                             mod.variables["batch_stats"]["bn"])
                  if mod.use_bn else None)
        seg = _int8_seg_fn(up, x_step, wq, w_step, affine, x.dtype)
        n_out = wq.shape[-1]
        if split_glu and key in split_glu:
            c = n_out // 2
            v, g = seg(0, c), seg(c, n_out)
            return v * jax.nn.sigmoid(g)
        return glu(seg(0, n_out))

    return interceptor


def calibrate(run_fn: Callable, *args, margin: float = 1.0,
              jit: bool = True) -> Dict[str, float]:
    """Run `run_fn(*args)` (a function that internally applies flax modules)
    under the calibration interceptor; returns {conv path: absmax * margin}.

    With jit=True the whole calibration is one compiled program (required on
    the axon TPU platform where eager ops pay remote-compile round trips).
    """
    def wrapped(*a):
        records: Dict[str, jax.Array] = {}
        with nn.intercept_methods(calib_interceptor(records)):
            run_fn(*a)
        return records

    rec = jax.jit(wrapped)(*args) if jit else wrapped(*args)
    return {k: float(v) * margin for k, v in rec.items()}


def merge_scales(*dicts: Dict[str, float]) -> Dict[str, float]:
    """Pointwise max over several calibration runs."""
    out: Dict[str, float] = {}
    for d in dicts:
        for k, v in d.items():
            out[k] = max(out.get(k, 0.0), v)
    return out


def drop_head_scales(scales: Dict[str, Dict[str, float]]
                     ) -> Dict[str, Dict[str, float]]:
    """Remove the image-head convs (img_net*/conv_output) from a scales
    dict so they run bf16.

    History: in round 2 bf16 heads measured FASTER (3905 vs 3812 img/s) --
    int8 heads forced a standalone GLU+requantize pass over each 256px
    feature tensor. Once the producer value/gate splits shipped
    (SPLIT_RES_GLU_SITES + HEAD_FEEDING_UPBLOCKS) that pass became cheap
    and the verdict FLIPPED: int8 heads read their 256px inputs at half
    the bytes and win +3.6% (x8) / +12.7% (x16), so quantized heads are
    now the default (docs/PERF.md "Int8 image heads"). This helper remains
    for the higher-fidelity bf16-head mode (39.7 vs 38.9 dB vs bf16)."""
    return {g: {k: v for k, v in d.items()
                if "img_net" not in k and "conv_output" not in k}
            for g, d in scales.items()}


SCALES_META_KEY = "_meta"


def conv_kernel_sites(params: Dict[str, Any]) -> Dict[str, Any]:
    """Map 'mod/sub/...' module paths to their 4-D conv kernels in a flax
    param tree — the exact key naming of the calibrated-scales JSONs (the
    interceptor derives keys from module paths the same way)."""
    out: Dict[str, Any] = {}

    def walk(prefix, node):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(prefix + (k,), v)
            elif k == "kernel" and hasattr(v, "ndim") and v.ndim == 4:
                out["/".join(prefix)] = v

    walk((), params)
    return out


def weights_fingerprint(netg_vars: Dict[str, Any],
                        netgh_vars: Dict[str, Any]) -> str:
    """sha256 (first 16 hex chars) over the conv kernels the int8 path
    quantizes, name-sorted and cast to float32. Binds a scales artifact to
    the checkpoint it was calibrated on: activation scales describe the
    distribution of one set of weights, and applying them to different
    weights silently mis-clips (VERDICT r4 weak #4)."""
    import hashlib

    import numpy as np

    h = hashlib.sha256()
    for group, v in (("netg", netg_vars), ("netgh", netgh_vars)):
        for name, kern in sorted(conv_kernel_sites(v["params"]).items()):
            h.update(f"{group}/{name}".encode())
            h.update(np.ascontiguousarray(
                np.asarray(kern), dtype=np.float32).tobytes())
    return h.hexdigest()[:16]


def split_scales_meta(scales: Dict[str, Any]
                      ) -> Tuple[Dict[str, Dict[str, float]],
                                 Dict[str, Any]]:
    """Separate the optional '_meta' provenance entry (written by
    cli.calibrate / save_artifact) from the per-group scale dicts."""
    meta = scales.get(SCALES_META_KEY) or {}
    return {k: v for k, v in scales.items()
            if k != SCALES_META_KEY}, dict(meta)


def check_scales(scales: Dict[str, Dict[str, float]],
                 netg_vars: Dict[str, Any], netgh_vars: Dict[str, Any],
                 meta: Optional[Dict[str, Any]] = None,
                 source: str = "quant_scales") -> None:
    """Refuse silently-wrong scales artifacts.

    (a) Key coverage: every non-empty scales group must name at least one
        conv that exists in the loaded model family, and unknown keys are
        an error — a scales file calibrated for a different family would
        otherwise quantize only the (possibly empty) intersection.
    (b) Provenance: when the artifact carries a weights fingerprint
        ('_meta' from cli.calibrate / save_artifact), it must match the
        loaded checkpoint; strip '_meta' from the JSON to deliberately
        reuse scales across weights (e.g. a finetune of the calibrated
        checkpoint).
    """
    site_trees = {"netg": conv_kernel_sites(netg_vars["params"]),
                  "netgh": conv_kernel_sites(netgh_vars["params"])}
    for group, d in scales.items():
        sites = site_trees.get(group)
        if sites is None:
            raise ValueError(
                f"{source}: unknown scales group {group!r} "
                f"(expected {sorted(site_trees)})")
        if not d:
            continue
        unknown = sorted(k for k in d if k not in sites)
        if len(unknown) == len(d):
            raise ValueError(
                f"{source}: no {group!r} scales key matches any conv in "
                f"the loaded model family (sample keys: {unknown[:4]}; "
                f"model convs: {sorted(sites)[:4]}...) — was this "
                "artifact calibrated for a different family?")
        if unknown:
            raise ValueError(
                f"{source}: {len(unknown)} {group!r} scales key(s) match "
                f"no conv in the loaded model (e.g. {unknown[:4]}) — "
                "family mismatch or stale artifact; recalibrate with "
                "tgsr-calibrate")
    want = (meta or {}).get("weights_fingerprint")
    if want:
        got = weights_fingerprint(netg_vars, netgh_vars)
        if got != want:
            raise ValueError(
                f"{source}: weights fingerprint mismatch (artifact "
                f"{want}, loaded checkpoint {got}) — these scales were "
                "calibrated on different weights and would mis-clip "
                "activations. Recalibrate with tgsr-calibrate, or delete "
                "the '_meta' entry from the JSON to override deliberately."
                + ("" if not (meta or {}).get("calibration") else
                   f" (artifact calibration: {meta['calibration']})"))


def _load_shipped_scales(filename: str, heads: bool
                         ) -> Dict[str, Dict[str, float]]:
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints", filename)
    with open(path) as f:
        scales = json.load(f)
    return scales if heads else drop_head_scales(scales)


def face_s8_scales(heads: bool = True) -> Dict[str, Dict[str, float]]:
    """Shipped calibration for the reference face_S8 checkpoints (margin
    1.1, noise-augmented face batch; see SRPipeline.calibrate_quant to
    regenerate). Keys: {"netg": {...}, "netgh": {...}}.

    heads=True (default) quantizes the image heads too -- measured +3.6%
    e2e now that the producer GLU splits ship (docs/PERF.md "Int8 image
    heads"); heads=False is the higher-fidelity bf16-head mode (see
    drop_head_scales)."""
    return _load_shipped_scales("face_s8_int8_scales.json", heads)


def x16_scales(heads: bool = True) -> Dict[str, Dict[str, float]]:
    """Shipped calibration for the x16 family (GSRNetLow16 +
    NetGHighWeight16, BRANCH_NUM=5). NOTE: the reference ships no x16
    checkpoint (models16.py is code-only), so these scales are calibrated
    on the fixed-seed random init used by tests/test_models16_oracle.py
    and the x16 benches; regenerate with examples/x16_bench.py when real
    weights exist (the artifact save is gated on the >=35 dB fidelity
    check). Keys: {"netg": {...}, "netgh": {...}}."""
    return _load_shipped_scales("x16_int8_scales.json", heads)
