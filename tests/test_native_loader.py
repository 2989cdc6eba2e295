"""Native C++ image loader (native/loader.cpp) vs the PIL reference path.

The loader implements decode + antialiased center-crop-resize with
_center_crop_resize semantics (= the reference transform
Resize(imsize*72/64) + CenterCrop, datasets.py:1558-1561). PIL is the
semantic oracle; the native separable resampler may differ by small
rounding, so parity is a tight mean/max bound, not bit-exactness.
"""

import numpy as np
import pytest

from tgsr_tpu import native

IMG = "/root/reference/data/face/000155.png"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader unavailable (no g++)")


def _pil_oracle(path, target, enlarge):
    from tgsr_tpu.data.datasets import _center_crop_resize, _load_image_rgb

    return _center_crop_resize(_load_image_rgb(path), target, enlarge)


@pytest.mark.parametrize("target,enlarge", [(256, 72 / 64), (64, 1.0)])
def test_native_matches_pil(target, enlarge):
    got = native.load_image(IMG, target, enlarge)
    ref = _pil_oracle(IMG, target, enlarge)
    assert got.shape == ref.shape == (target, target, 3)
    assert got.dtype == np.uint8
    d = np.abs(got.astype(np.int16) - ref.astype(np.int16))
    assert d.mean() < 1.5, d.mean()
    assert (d > 8).mean() < 0.01  # <1% of pixels differ noticeably


def test_enlarge_below_one_is_clamped():
    """ADVICE round-1: enlarge < 1.0 used to make the crop window read out
    of bounds; now clamped — must return a valid image, not crash."""
    got = native.load_image(IMG, 64, 0.5)
    assert got.shape == (64, 64, 3)
    assert got.dtype == np.uint8
    assert got.any()


def test_load_batch_consistent_with_single():
    batch = native.load_batch([IMG, IMG], 128, 72 / 64, threads=2)
    single = native.load_image(IMG, 128, 72 / 64)
    assert batch.shape == (2, 128, 128, 3)
    np.testing.assert_array_equal(batch[0], single)
    np.testing.assert_array_equal(batch[1], single)


def test_load_batch_failed_decode_falls_back_to_pil(tmp_path):
    """A file the C loader cannot decode must not yield a silent black
    image (zero-variance-BN hazard); the PIL fallback raises properly on
    unreadable files and decodes readable ones the C path missed."""
    bad = tmp_path / "corrupt.png"
    bad.write_bytes(b"not an image")
    with pytest.raises(Exception):
        native.load_batch([IMG, str(bad)], 64, 1.0, threads=2)
