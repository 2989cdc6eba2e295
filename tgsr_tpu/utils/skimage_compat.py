"""scipy-backed equivalents of the two skimage.transform calls the
reference visualization layer makes (miscc/utils.py:147-151, 271-273,
396-398). skimage itself is not installed in this environment; modern
skimage implements both calls on top of scipy.ndimage, which is installed,
so these delegate to the identical backend:

* ``skimage.transform.resize(img, shape, order=1, mode='reflect')`` is
  ``scipy.ndimage.zoom(img, out/in, order=1, mode='mirror', grid_mode=True)``
  (skimage's 'reflect' is numpy.pad naming = ndimage 'mirror'); with
  ``anti_aliasing=True`` a ``gaussian_filter(sigma=anti_aliasing_sigma)``
  pre-smooth runs first.
* ``skimage.transform.pyramid_expand(img, upscale, sigma)`` (multichannel
  unaware, the reference's call form) resizes EVERY axis by ``upscale`` --
  including the channel axis of an HxWx3 input -- then gaussian-smooths
  with a scalar sigma over all axes. The reference feeds 3-channel
  attention maps, so a [128,128,3] map becomes [256,256,6]; the caller's
  ``np.resize(one_map, [256,256,3])`` (miscc/utils.py:286) then crops the
  raveled buffer -- a scrambling quirk preserved faithfully downstream.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage as ndi

_SKIMAGE_TO_NDI_MODE = {
    "constant": "constant",
    "edge": "nearest",
    "symmetric": "reflect",
    "reflect": "mirror",
    "wrap": "wrap",
}


def resize(
    image: np.ndarray,
    output_shape: Sequence[int],
    order: int = 1,
    mode: str = "reflect",
    cval: float = 0.0,
    anti_aliasing: bool = False,
    anti_aliasing_sigma: Optional[float] = None,
) -> np.ndarray:
    """skimage.transform.resize semantics (float path, clip is a no-op for
    order<=1 since interpolation is a convex combination)."""
    image = np.asarray(image, np.float64)
    output_shape = tuple(output_shape)
    if len(output_shape) < image.ndim:  # trailing axes keep their size
        output_shape = output_shape + image.shape[len(output_shape):]
    ndi_mode = _SKIMAGE_TO_NDI_MODE[mode]
    if anti_aliasing:
        sigma = anti_aliasing_sigma
        if sigma is None:  # skimage default: max(0, (in/out - 1) / 2)
            factors = np.divide(image.shape, output_shape)
            sigma = np.maximum(0, (factors - 1) / 2)
        image = ndi.gaussian_filter(image, sigma, cval=cval, mode=ndi_mode)
    zoom_factors = [o / i for o, i in zip(output_shape, image.shape)]
    return ndi.zoom(image, zoom_factors, order=order, mode=ndi_mode,
                    cval=cval, grid_mode=True)


def pyramid_expand(
    image: np.ndarray,
    upscale: int = 2,
    sigma: Optional[float] = None,
    order: int = 1,
    mode: str = "reflect",
    cval: float = 0.0,
) -> np.ndarray:
    """skimage.transform.pyramid_expand with multichannel=False (the
    reference's call form): every axis scales by `upscale`, then a scalar
    gaussian smooth over all axes (sigma default 2*upscale/6)."""
    image = np.asarray(image, np.float64)
    out_shape = tuple(math.ceil(upscale * d) for d in image.shape)
    if sigma is None:
        sigma = 2 * upscale / 6.0
    resized = resize(image, out_shape, order=order, mode=mode, cval=cval,
                     anti_aliasing=False)
    ndi_mode = _SKIMAGE_TO_NDI_MODE[mode]
    return ndi.gaussian_filter(resized, sigma, mode=ndi_mode, cval=cval)


def structural_similarity(
    im1: np.ndarray,
    im2: np.ndarray,
    data_range: float = 255.0,
    gaussian_weights: bool = True,
    sigma: float = 1.5,
    use_sample_covariance: bool = False,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """skimage.metrics.structural_similarity for a single-channel 2-D image,
    gaussian-weighted form (the parameterization ops/image.py:205 claims):
    truncate=3.5 => 11-tap window, VALID crop of pad=(win-1)//2 borders.
    Used as the numpy-side oracle for the jax `ssim` (tests pin both)."""
    assert gaussian_weights and not use_sample_covariance
    x = np.asarray(im1, np.float64)
    y = np.asarray(im2, np.float64)
    truncate = 3.5
    r = int(truncate * sigma + 0.5)  # skimage: radius 5 -> win 11

    def filt(z):
        return ndi.gaussian_filter(z, sigma, truncate=truncate)

    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = r
    return float(s[pad:-pad, pad:-pad].mean())
