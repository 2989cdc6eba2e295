"""On-device image processing + quality metrics.

Replaces the reference's host-side PIL preprocessing (datasets.py:112-278)
with fused on-device ops (resize pyramids, bicubic LR degradation, gaussian
blur, normalization) and implements the evaluation metrics
(rgb2y/psnr = trainer_objective.py:168-181; SSIM added -- the reference
computed it ad hoc with skimage).

Images are NHWC. Normalized domain is [-1, 1] (ToTensor+Normalize(0.5,0.5)).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Normalization (= transforms.ToTensor + Normalize((0.5,)*3, (0.5,)*3))
# ---------------------------------------------------------------------------

def normalize_uint8(x: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [-1,1]."""
    return x.astype(jnp.float32) / 127.5 - 1.0


def denormalize_to_uint8(x: jax.Array) -> jax.Array:
    """[-1,1] -> uint8 with the reference's save-time clip
    (trainer_objective.py:153-155: round(clip((x+1)*127.5)))."""
    return jnp.round(jnp.clip((x + 1.0) * 127.5, 0.0, 255.0)).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Resize (PIL-comparable antialiased filters)
# ---------------------------------------------------------------------------

def resize(x: jax.Array, size: Tuple[int, int], method: str = "bilinear",
           antialias: bool = True) -> jax.Array:
    """Antialiased resize, NHWC. PIL's Resize applies an antialiased
    triangle/cubic filter; jax.image.resize(antialias=True) uses the same
    filter family (exact-match tested against PIL in tests/test_image_ops)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method=method,
                            antialias=antialias)


def build_pyramid(hr: jax.Array, n_branches: int, base_size: int,
                  method: str = "bilinear") -> List[jax.Array]:
    """Per-branch target pyramid (= get_imgs, datasets.py:131-141):
    ret[i] = resize(img, base * 2^i), full-res at the last branch."""
    out = []
    for i in range(n_branches):
        s = base_size * 2**i
        if hr.shape[1] == s:
            out.append(hr)
        else:
            out.append(resize(hr, (s, s), method))
    return out


def degrade_and_bicubic(hr: jax.Array, scale: int,
                        method: str = "bilinear") -> Tuple[jax.Array, List[jax.Array]]:
    """LR = resize(HR, 1/scale); bic[i] = resize(LR -> each pyramid size)
    (= datasets.py:137-145). Returns (lr, bic_pyramid)."""
    h, w = hr.shape[1:3]
    lr = resize(hr, (h // scale, w // scale), method)
    bic = []
    s = h // scale
    while True:
        s *= 2
        if s >= h:
            break  # the full-res level is appended once below
        bic.append(resize(lr, (s, s), "cubic"))
    bic.append(resize(lr, (h, w), "cubic"))
    return lr, bic


def _torch_bicubic_weights(in_size: int, out_size: int) -> jnp.ndarray:
    """[out, in] resampling matrix matching F.interpolate(mode='bicubic',
    align_corners=False): Keys kernel with a = -0.75, no antialiasing,
    border-replicate tap clamping."""
    import numpy as np

    a = -0.75

    def kernel(t):
        t = np.abs(t)
        return np.where(
            t <= 1, (a + 2) * t**3 - (a + 3) * t**2 + 1,
            np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0))

    scale = in_size / out_size
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        for k in range(-1, 3):
            j = base + k
            wt = kernel(src - j)
            w[i, min(max(j, 0), in_size - 1)] += wt
    return jnp.asarray(w)


def resize_bicubic_torch(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """NHWC resize numerically matching torch F.interpolate(mode='bicubic',
    align_corners=False) -- used where the reference's training losses
    depend on torch's kernel (a=-0.75; jax.image uses a=-0.5)."""
    h_out, w_out = size
    wr = _torch_bicubic_weights(x.shape[1], h_out)
    wc = _torch_bicubic_weights(x.shape[2], w_out)
    x = jnp.einsum("oh,bhwc->bowc", wr, x)
    return jnp.einsum("pw,bhwc->bhpc", wc, x)


def crop_to_scale_multiple(img: jax.Array, scale: int) -> jax.Array:
    """Crop H, W down to multiples of `scale` (= get_imgsexampletest,
    datasets.py:200-233: arbitrary-size eval images are truncated so the
    LR degrade divides exactly)."""
    h, w = img.shape[1:3]
    return img[:, : (h // scale) * scale, : (w // scale) * scale]


def bucket_shape(h: int, w: int, scale: int, bucket: int = 64) -> Tuple[int, int]:
    """Round (h, w) UP to multiples of `bucket` (itself a multiple of scale)
    so arbitrary-size eval reuses a bounded set of compiled programs
    (the XLA answer to the reference's fully dynamic example-test shapes)."""
    bucket = max(bucket, scale)
    bh = -(-h // bucket) * bucket
    bw = -(-w // bucket) * bucket
    return bh, bw


def pad_to(img: jax.Array, h: int, w: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """Edge-pad NHWC image up to (h, w); returns (padded, original (h, w))."""
    oh, ow = img.shape[1:3]
    return (
        jnp.pad(img, ((0, 0), (0, h - oh), (0, w - ow), (0, 0)), mode="edge"),
        (oh, ow),
    )


# ---------------------------------------------------------------------------
# Gaussian blur (= PIL ImageFilter.GaussianBlur(radius=2), datasets.py:186)
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(radius: float) -> jnp.ndarray:
    """PIL-convention gaussian: sigma = radius, support = 2*ceil(2*sigma)+1
    (Pillow uses a box-approximation historically; modern Pillow >=9 uses a
    true gaussian with this support). Normalized to sum 1."""
    sigma = float(radius)
    half = int(math.ceil(sigma * 2.0))
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(x: jax.Array, radius: float = 2.0) -> jax.Array:
    """Separable depthwise gaussian blur, edge-replicate padding (PIL
    semantics), NHWC."""
    k = _gaussian_kernel1d(radius)
    half = (k.shape[0] - 1) // 2
    c = x.shape[-1]
    # horizontal then vertical, depthwise
    kh = jnp.broadcast_to(k.reshape(1, -1, 1, 1), (1, k.shape[0], 1, c))
    kv = jnp.broadcast_to(k.reshape(-1, 1, 1, 1), (k.shape[0], 1, 1, c))
    xp = jnp.pad(x, ((0, 0), (0, 0), (half, half), (0, 0)), mode="edge")
    x1 = jax.lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xp = jnp.pad(x1, ((0, 0), (half, half), (0, 0), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        xp, kv, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def rgb2y(rgb_uint8: jax.Array) -> jax.Array:
    """BT.601 luma, uint8 -> uint8 (= trainer_objective.py:168-174)."""
    rgb = rgb_uint8.astype(jnp.float32) / 255.0
    coef = jnp.array([65.481, 128.553, 24.966], jnp.float32) / 255.0
    y = jnp.sum(rgb * coef, axis=-1) + 16.0 / 255.0
    return (y * 255.0 + 0.5).astype(jnp.uint8)


def psnr(im1: jax.Array, im2: jax.Array) -> jax.Array:
    """20*log10(255/RMSE) on uint8 (= trainer_objective.py:177-181).

    Runs in float32: the reference's numpy float64 is unavailable under
    JAX's default x64-disabled config (an astype(float64) would silently
    stay f32 anyway), and XLA's tree-structured reduction keeps the f32
    mean within ~1e-3 dB of the f64 value on 256px images — quote
    borderline threshold comparisons (e.g. the bench >=35 dB gate) from
    host numpy f64 when the last decimals matter."""
    diff = im1.astype(jnp.float32) - im2.astype(jnp.float32)
    rmse = jnp.sqrt(jnp.mean(diff**2))
    return 20.0 * jnp.log10(255.0 / rmse)


def psnr_batch(im1: jax.Array, im2: jax.Array) -> jax.Array:
    """Per-image PSNR over a batch (any float/uint8 dtype in [0,255])."""
    diff = im1.astype(jnp.float32) - im2.astype(jnp.float32)
    mse = jnp.mean(diff**2, axis=tuple(range(1, diff.ndim)))
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))


def ssim(im1: jax.Array, im2: jax.Array, data_range: float = 255.0,
         filter_size: int = 11, filter_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Mean SSIM over a batch, NHWC, gaussian-windowed (standard Wang et al.
    formulation, matching skimage.structural_similarity(gaussian_weights=True,
    use_sample_covariance=False))."""
    x = im1.astype(jnp.float32)
    y = im2.astype(jnp.float32)
    half = filter_size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / filter_sigma) ** 2)
    k = k / jnp.sum(k)
    c = x.shape[-1]

    def blur(z):
        kh = jnp.broadcast_to(k.reshape(1, -1, 1, 1), (1, filter_size, 1, c))
        kv = jnp.broadcast_to(k.reshape(-1, 1, 1, 1), (filter_size, 1, 1, c))
        z = jax.lax.conv_general_dilated(
            z, kh, (1, 1), "VALID", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            z, kv, (1, 1), "VALID", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    mu_x = blur(x)
    mu_y = blur(y)
    mu_x2, mu_y2, mu_xy = mu_x**2, mu_y**2, mu_x * mu_y
    sigma_x2 = blur(x * x) - mu_x2
    sigma_y2 = blur(y * y) - mu_y2
    sigma_xy = blur(x * y) - mu_xy
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))
