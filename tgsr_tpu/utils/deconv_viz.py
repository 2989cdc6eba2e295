"""Deconvnet feature visualization (vis_layer / vis_layeror equivalents).

The reference ships ``vis_layer``/``vis_layeror`` (miscc/utils.py:488-592):
a Zeiler-Fergus deconvnet that, for a chosen VGG16 conv layer, selects the
feature map with the largest activation, zeroes everything else (optionally
thresholding the chosen map at its max / mean / 10th percentile), and runs
the result backwards through a ``vgg16_deconv`` network (max-unpooling at
the recorded pool switches + tied transposed convolutions + ReLU) to pixel
space.  The reference's ``vgg16_conv``/``vgg16_deconv`` classes are absent
from the snapshot (miscc/utils.py references objects that exist nowhere),
so this module supplies the whole subsystem.

TPU-native formulation: the deconvnet *is* a VJP with one modified rule.

  * transposed conv with tied weights (no bias)  == conv VJP
  * max-unpooling at the forward argmax switches == max-pool VJP
  * deconvnet ReLU (rectify the BACKWARD signal,
    ignoring the forward mask -- Zeiler & Fergus 2014) == custom-VJP ReLU

So instead of maintaining a second mirrored network and recorded pool
locations, we run ``jax.vjp`` through the forward tower built with a
custom-VJP ReLU whose backward rule is ``relu(g)``.  XLA fuses the whole
inverse pass; no Python mirroring, no switch bookkeeping.

Weights come from :class:`tgsr_tpu.models.vgg.VGG16Features` params
(torchvision-convertible via ``convert_vgg16``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.models.vgg import _CFG


@jax.custom_vjp
def deconv_relu(x):
    """ReLU whose VJP implements the deconvnet rule: rectify the incoming
    backward signal instead of gating it by the forward mask."""
    return jnp.maximum(x, 0.0)


def _deconv_relu_fwd(x):
    return jnp.maximum(x, 0.0), None


def _deconv_relu_bwd(_, g):
    return (jnp.maximum(g, 0.0),)


deconv_relu.defvjp(_deconv_relu_fwd, _deconv_relu_bwd)


def _conv_layer_count() -> int:
    return sum(n for _, n in _CFG)


def forward_to_tap(params: dict, x: jax.Array, layer: int) -> jax.Array:
    """Run the VGG16 tower (same conv layout/normalization as
    ``VGG16Features``) up to conv layer ``layer`` (0..12), with the
    deconvnet ReLU.  Returns the post-ReLU feature map [B, H, W, C].

    ``layer`` indexes conv layers in torchvision order (conv0..conv12);
    max-pool is applied between blocks as in the forward tower.
    """
    n_layers = _conv_layer_count()
    if not 0 <= layer < n_layers:
        raise ValueError(f"layer must be in [0, {n_layers}), got {layer}")
    mean = jnp.array([0.485, 0.456, 0.406])
    std = jnp.array([0.229, 0.224, 0.225])
    x = ((x + 1.0) / 2.0 - mean) / std
    li = 0
    for bi, (_, n_convs) in enumerate(_CFG):
        for _ci in range(n_convs):
            p = params[f"conv{li}"]
            x = jax.lax.conv_general_dilated(
                x, p["kernel"], window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"]
            x = deconv_relu(x)
            if li == layer:
                return x
            li += 1
        if bi < len(_CFG) - 1:
            # max-pool 2x2/2: its VJP is exactly the deconvnet's
            # max-unpooling at the recorded switches.
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
    raise AssertionError  # unreachable: layer validated above


def _select_seed(fmap: np.ndarray, mode: str) -> Tuple[np.ndarray, float]:
    """Reference selection logic (miscc/utils.py:537-589): keep only the
    channel with the largest single activation; threshold that map.

    mode: 'max'  -> keep only the max-activation pixel   (vis_layeror)
          'mean' -> keep pixels >= channel mean           (meanfeature)
          'four' -> keep pixels >= 10th percentile        (fourfeature,
                    midpoint interpolation -- the reference default)
          'all'  -> keep the whole tensor                 (all_feature)
    Returns (seed [H,W,C], max_activation).
    """
    h, w, c = fmap.shape
    per_channel_max = fmap.reshape(-1, c).max(axis=0)
    mark = int(np.argmax(per_channel_max))
    choose = fmap[:, :, mark]
    max_act = float(choose.max())
    if mode == "all":
        return fmap.copy(), max_act
    if mode == "max":
        thresh_map = np.where(choose == max_act, choose, 0.0)
    elif mode == "mean":
        thresh_map = np.where(choose >= choose.mean(), choose, 0.0)
    elif mode == "four":
        q = np.percentile(choose, 10, method="midpoint")
        thresh_map = np.where(choose >= q, choose, 0.0)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    seed = np.zeros_like(fmap)
    seed[:, :, mark] = thresh_map
    return seed, max_act


@functools.lru_cache(maxsize=None)
def _layer_jits(layer: int):
    """Per-layer jitted (forward, vjp-apply) pair, cached at module level
    so repeated vis_layer calls reuse the compiled programs (params/x are
    ordinary traced arguments)."""
    fwd = jax.jit(lambda p, im: forward_to_tap(p, im, layer))

    @jax.jit
    def vjp_apply(p, im, seed_b):
        _, vjp_fn = jax.vjp(lambda i: forward_to_tap(p, i, layer), im)
        return vjp_fn(seed_b)[0]

    return fwd, vjp_apply


def vis_layer(params: dict, image: jax.Array, layer: int,
              mode: str = "four") -> Tuple[np.ndarray, int]:
    """Deconvnet visualization of VGG16 conv layer ``layer`` for one image.

    = miscc/utils.py:537-592 ``vis_layer`` (mode='four', its shipped flag
    setting) / miscc/utils.py:487-535 ``vis_layeror`` (mode='max').

    image: [H, W, 3] or [1, H, W, 3] in [-1, 1] (NHWC).
    Returns (uint8 [H, W, 3] reconstruction, int(max_activation)) exactly
    like the reference (min-max normalized to 0..255, int-cast activation).
    """
    x = jnp.asarray(image)
    if x.ndim == 3:
        x = x[None]
    # two jits (forward; vjp-apply), NOT eager: on the axon TPU platform
    # every eager primitive pays a remote-compile round trip (CLAUDE.md),
    # which would turn the ~30-op tower + inverse into minutes of hangs.
    # The host-side channel selection between them forces the split.
    # Module-level cached per layer: fresh closures per call would retrace
    # and recompile BOTH programs for every image of a sweep.
    fwd, vjp_apply = _layer_jits(layer)
    feats = fwd(params, x)
    fmap = np.asarray(feats[0])
    seed, max_act = _select_seed(fmap, mode)

    recon = vjp_apply(params, x, jnp.asarray(seed, feats.dtype)[None])
    img = np.asarray(recon[0], np.float32)
    lo, hi = img.min(), img.max()
    img = (img - lo) / max(hi - lo, 1e-12) * 255.0
    return img.astype(np.uint8), int(max_act)
