"""VGG16 perceptual feature extractor.

The reference's ManiGAN-style losses take a `VGG` callable returning a list
of feature maps (miscc/losses.py:656-662) but ship no VGG network
("VGG network itself not in repo", SURVEY.md 2.7). This implements the
standard torchvision VGG16 feature tower with taps after each pre-pool ReLU
block (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 -- the usual perceptual
set) and a torchvision-key converter.
"""

from __future__ import annotations

from typing import List, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision vgg16 'features' layout: conv indices in the Sequential
_CFG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


class VGG16Features(nn.Module):
    """x in [-1, 1] NHWC -> list of 5 feature maps (after last ReLU of each
    block, before pooling)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        # [-1,1] -> imagenet normalization
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        x = ((x + 1.0) / 2.0 - mean) / std
        taps = []
        li = 0
        for bi, (width, n_convs) in enumerate(_CFG):
            for ci in range(n_convs):
                x = nn.Conv(width, (3, 3), padding="SAME", use_bias=True,
                            name=f"conv{li}")(x)
                x = nn.relu(x)
                li += 1
            taps.append(x)
            if bi < len(_CFG) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
        return taps


def convert_vgg16(sd: Mapping) -> dict:
    """torchvision vgg16 state dict (features.N.weight/bias) -> params."""
    import numpy as np

    conv_layers = [i for i in range(31) if f"features.{i}.weight" in sd]
    params = {}
    for li, i in enumerate(conv_layers):
        w = sd[f"features.{i}.weight"]
        w = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
        b = sd[f"features.{i}.bias"]
        b = np.asarray(b.detach().cpu().numpy() if hasattr(b, "detach") else b)
        params[f"conv{li}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    return {"params": params}
