"""DAMSM image encoder.

= CNN_ENCODER (util.py:263-368): a torchvision Inception-v3 backbone with
all backbone params frozen, tapping Mixed_6e (17x17x768) as region features
and the final pooled 2048 vector, plus two trainable heads
(emb_features 1x1 768->nef, emb_cnn_code Linear 2048->nef). Input is
bilinearly resized to 299x299 (util.py:311).

The Inception-v3 graph here mirrors torchvision's module names exactly so
the zoo checkpoint (inception_v3_google-1a9a5a14.pth) converts key-for-key
(convert_inception_v3 in tgsr_tpu/checkpoints/convert_torch.py consumes it
when a local copy is provided -- this environment has no network egress).
`SimpleCNNEncoder` is a small trainable backbone for from-scratch DAMSM
training without zoo weights.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _avg_pool_3x3_same(x: jax.Array) -> jax.Array:
    """F.avg_pool2d(k=3, s=1, p=1) with count_include_pad=True."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def _max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """F.max_pool2d(k=3, s=2), VALID."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


class BasicConv2d(nn.Module):
    """Conv(bias=False) + BN(eps=0.001) + ReLU (torchvision BasicConv2d)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _p(n):  # symmetric padding helper
    return ((n, n), (n, n))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x, train)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=_p(2), name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=_p(1), name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=_p(1), name="branch3x3dbl_3")(b3, train)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x, train)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, (3, 3), padding=_p(1), name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd, train)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5")(bd, train)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7, train)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x, train)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3_2a")(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, (3, 3), padding=_p(1), name="branch3x3dbl_2")(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Backbone(nn.Module):
    """torchvision inception_v3 feature graph up to Mixed_7c (no aux, no fc).

    __call__(x [B,299,299,3]) -> (mixed_6e [B,17,17,768],
                                  pooled [B,2048])
    """

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, (3, 3), padding=_p(1), name="Conv2d_2b_3x3")(x, train)
        x = _max_pool_3x3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x, train)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, name="Mixed_5b")(x, train)
        x = InceptionA(64, name="Mixed_5c")(x, train)
        x = InceptionA(64, name="Mixed_5d")(x, train)
        x = InceptionB(name="Mixed_6a")(x, train)
        x = InceptionC(128, name="Mixed_6b")(x, train)
        x = InceptionC(160, name="Mixed_6c")(x, train)
        x = InceptionC(160, name="Mixed_6d")(x, train)
        x = InceptionC(192, name="Mixed_6e")(x, train)
        features = x  # 17 x 17 x 768
        x = InceptionD(name="Mixed_7a")(x, train)
        x = InceptionE(name="Mixed_7b")(x, train)
        x = InceptionE(name="Mixed_7c")(x, train)
        pooled = jnp.mean(x, axis=(1, 2))  # F.avg_pool2d(k=8) -> [B, 2048]
        return features, pooled


class CNNEncoder(nn.Module):
    """= CNN_ENCODER(nef): frozen Inception-v3 + trainable heads.

    Freezing is enforced by the trainer (backbone params are excluded from
    the optimizer / wrapped in stop_gradient), not by the module.
    """

    nef: int = 256

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 freeze_backbone: bool = True):
        """x: [B, H, W, 3] in [-1, 1]. Returns (features [B, 17, 17, nef] as
        [B, R=289, nef] flattened, cnn_code [B, nef])."""
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, x.shape[3]), "bilinear")  # util.py:311
        features, pooled = InceptionV3Backbone(name="inception")(x, train)
        if freeze_backbone:
            features = jax.lax.stop_gradient(features)
            pooled = jax.lax.stop_gradient(pooled)
        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -0.1, 0.1)

        feat = nn.Dense(self.nef, use_bias=False, kernel_init=uinit,
                        name="emb_features")(features)  # 1x1 conv == dense
        code = nn.Dense(self.nef, use_bias=True, kernel_init=uinit,
                        name="emb_cnn_code")(pooled)
        b = feat.shape[0]
        return feat.reshape(b, -1, self.nef), code


class SimpleCNNEncoder(nn.Module):
    """Small fully-trainable DAMSM image encoder for environments without
    the Inception zoo checkpoint (this one has no egress). Produces the
    same interface: 17x17 region features + global code."""

    nef: int = 256
    width: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        w = self.width
        x = jax.image.resize(x, (x.shape[0], 137, 137, x.shape[3]), "bilinear")
        for i, (f, s) in enumerate([(w, 2), (w * 2, 2), (w * 4, 2)]):
            x = nn.Conv(f, (3, 3), strides=(s, s), padding="SAME",
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        # now 18x18 -> one VALID conv to 17x17
        x = nn.Conv(w * 8, (2, 2), padding="VALID", use_bias=False,
                    name="conv_17")(x)
        x = nn.relu(x)  # [B, 17, 17, 8w]
        features = nn.Dense(self.nef, use_bias=False, name="emb_features")(x)
        pooled = jnp.mean(x, axis=(1, 2))
        code = nn.Dense(self.nef, name="emb_cnn_code")(pooled)
        b = features.shape[0]
        return features.reshape(b, -1, self.nef), code
