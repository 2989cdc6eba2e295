"""ctypes bindings for the native C++ image loader.

Builds libtgsr_loader.so on first use (g++ + libjpeg/libpng are baked into
the image); caches next to the source. Every entry point has a PIL
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_SO = os.path.join(_HERE, "libtgsr_loader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO,
        "-ljpeg", "-lpng", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """Returns the loaded ctypes library, building it if needed, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        so = _SO if os.path.exists(_SO) else _build()
        if so is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _build_failed = True
            return None
        lib.tgsr_load_image.restype = ctypes.c_int
        lib.tgsr_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.tgsr_load_batch.restype = ctypes.c_int
        lib.tgsr_load_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_image(path: str, target: int, enlarge: float = 1.0) -> np.ndarray:
    """Decode + antialiased center-crop-resize to [target, target, 3] uint8
    (= _center_crop_resize semantics). Falls back to PIL."""
    lib = get_lib()
    if lib is not None:
        out = np.empty((target, target, 3), np.uint8)
        ok = lib.tgsr_load_image(
            path.encode(), target, ctypes.c_float(enlarge),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if ok:
            return out
    # PIL fallback
    from tgsr_tpu.data.datasets import _center_crop_resize, _load_image_rgb

    return _center_crop_resize(_load_image_rgb(path), target, enlarge)


def load_batch(paths: List[str], target: int, enlarge: float = 1.0,
               threads: int = 8) -> np.ndarray:
    """Threaded batch decode -> [N, target, target, 3] uint8."""
    lib = get_lib()
    if lib is None:
        return np.stack([load_image(p, target, enlarge) for p in paths])
    blob = b"".join(p.encode() + b"\0" for p in paths)
    offsets = np.zeros(len(paths), np.int64)
    pos = 0
    for i, p in enumerate(paths):
        offsets[i] = pos
        pos += len(p.encode()) + 1
    out = np.empty((len(paths), target, target, 3), np.uint8)
    n_ok = lib.tgsr_load_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(paths), target, ctypes.c_float(enlarge), threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if n_ok < len(paths):
        # the C loader zero-fills failed decodes; silently feeding black
        # (constant) images downstream is the zero-variance-BN NaN hazard
        # (CLAUDE.md), so retry the failed slots through the PIL fallback
        # (which raises a proper error on genuinely unreadable files)
        from tgsr_tpu.data.datasets import (_center_crop_resize,
                                            _load_image_rgb)

        for i in range(len(paths)):
            if not out[i].any():
                out[i] = _center_crop_resize(
                    _load_image_rgb(paths[i]), target, enlarge)
    return out
