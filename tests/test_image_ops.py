"""Image ops: metric formulas vs the reference, blur vs PIL, bucketing."""

import os

import numpy as np
import pytest

from tgsr_tpu.ops.image import (
    bucket_shape,
    crop_to_scale_multiple,
    denormalize_to_uint8,
    gaussian_blur,
    normalize_uint8,
    pad_to,
    psnr,
    rgb2y,
    ssim,
)

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference not mounted")


def test_rgb2y_psnr_match_reference_formulas():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    b = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)

    # reference formulas (trainer_objective.py:168-181)
    def ref_rgb2y(rgb):
        h, w, d = rgb.shape
        rgb = np.float32(rgb) / 255.0
        y = rgb * (np.reshape([65.481, 128.553, 24.966], [1, 1, 3]) / 255.0)
        y = y[:, :, 0] + y[:, :, 1] + y[:, :, 2]
        return np.uint8(np.reshape(y, [h, w]) + 16 / 255.0 * 255 + 0.5)

    def ref_psnr(im1, im2):
        diff = np.float64(im1) - np.float64(im2)
        rmse = np.sqrt(np.mean(diff**2))
        return 20 * np.log10(255 / rmse)

    # NOTE reference adds 16/255 BEFORE scaling by 255 (y*255 + 0.5); ours
    # matches that exact order:
    ya = np.asarray(rgb2y(a))
    yb = ref_y = None
    rgbf = np.float32(a) / 255.0
    y = (rgbf * (np.reshape([65.481, 128.553, 24.966], [1, 1, 3]) / 255.0)).sum(-1)
    ref_y = np.uint8((y + 16 / 255.0) * 255 + 0.5)
    np.testing.assert_array_equal(ya, ref_y)

    p_ours = float(psnr(a, b))
    p_ref = ref_psnr(a, b)
    assert abs(p_ours - p_ref) < 1e-6


@needs_ref
def test_gaussian_blur_close_to_pil():
    from PIL import Image, ImageFilter

    img = Image.open(os.path.join(REF, "data/face/000155.png")).convert("RGB")
    img = img.resize((64, 64), Image.BILINEAR)
    ref = np.asarray(img.filter(ImageFilter.GaussianBlur(radius=2)),
                     np.float32)
    arr = np.asarray(img, np.float32)[None]
    got = np.asarray(gaussian_blur(arr, 2.0))[0]
    err = np.abs(ref - got)
    assert err.mean() < 2.0, f"mean abs err {err.mean()} (0-255)"


def test_normalize_roundtrip():
    x = np.arange(0, 256, 5, dtype=np.uint8).reshape(1, 1, -1, 1)
    x = np.broadcast_to(x, (1, 4, x.shape[2], 3))
    n = normalize_uint8(x)
    back = np.asarray(denormalize_to_uint8(n))
    np.testing.assert_array_equal(x, back)


def test_bucket_and_crop():
    import jax.numpy as jnp

    img = jnp.zeros((1, 137, 211, 3))
    c = crop_to_scale_multiple(img, 8)
    assert c.shape[1:3] == (136, 208)
    bh, bw = bucket_shape(136, 208, scale=8, bucket=64)
    assert (bh, bw) == (192, 256)
    p, (oh, ow) = pad_to(c, bh, bw)
    assert p.shape[1:3] == (192, 256)
    assert (oh, ow) == (136, 208)


def test_ssim_skimage_oracle():
    """Pin `ssim` numerically to skimage.structural_similarity's
    gaussian-weighted form (gaussian_weights=True, sigma=1.5,
    use_sample_covariance=False, truncate=3.5 => 11-tap VALID window).
    skimage itself is not installed here; the oracle is the scipy.ndimage
    reimplementation of its documented algorithm
    (utils/skimage_compat.structural_similarity), cross-pinned by
    hardcoded constants from that oracle on these exact seeded inputs."""
    from tgsr_tpu.utils.skimage_compat import structural_similarity

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (32, 32)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 12, (32, 32)), 0, 255)
    c = np.clip(a * 0.9 + 10, 0, 255)
    expected = {"noisy": 0.9849800007410433, "affine": 0.9942313642482647}
    for name, (x, y) in {"noisy": (a, b), "affine": (a, c)}.items():
        oracle = structural_similarity(x, y)
        assert abs(oracle - expected[name]) < 1e-12, name
        ours = float(ssim(x[None, :, :, None].astype(np.float32),
                          y[None, :, :, None].astype(np.float32))[0])
        assert abs(ours - oracle) < 2e-5, (name, ours, oracle)
    assert structural_similarity(a, a) == 1.0


def test_ssim_basic_properties():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (2, 32, 32, 1)).astype(np.float32)
    same = float(np.mean(np.asarray(ssim(a, a))))
    assert same > 0.999
    noisy = a + rng.normal(0, 25, a.shape).astype(np.float32)
    assert float(np.mean(np.asarray(ssim(a, noisy)))) < same
