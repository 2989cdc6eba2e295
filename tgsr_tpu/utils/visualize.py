"""Attention-map visualization.

= miscc/utils.py:31-451 (drawCaption, build_super_images/2/all): per-image
rows of [source image, per-word attention overlays] with the caption words
rendered above each column. The reference hardcodes a Windows font path
(miscc/utils.py:36); here PIL's portable default bitmap font is used.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

FONT_MAX = 50


def _font(size: int = 20):
    from PIL import ImageFont

    try:
        return ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", size)
    except Exception:
        return ImageFont.load_default()


def draw_caption(words: Sequence[str], n_cols: int, vis_size: int,
                 off1: int = 2) -> np.ndarray:
    """Render caption words into a [FONT_MAX, n_cols*(vis_size+off1), 3]
    strip (= drawCaption, miscc/utils.py:31-71)."""
    from PIL import Image, ImageDraw

    width = (vis_size + off1) * (n_cols + 1)
    canvas = Image.new("RGB", (width, FONT_MAX), (255, 255, 255))
    d = ImageDraw.Draw(canvas)
    fnt = _font(max(12, vis_size // 4))
    for i, w in enumerate(words):
        x = (vis_size + off1) * (i + 1) + off1
        d.text((x, FONT_MAX // 4), w[:12], font=fnt, fill=(0, 0, 0))
    return np.asarray(canvas, np.uint8)


def _to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float HWC -> uint8."""
    if img.dtype == np.uint8:
        return img
    return np.round(np.clip((img + 1.0) * 127.5, 0, 255)).astype(np.uint8)


def _resize_np(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((size, size), Image.BILINEAR), np.uint8)


def _colorize(attn: np.ndarray, size: int) -> np.ndarray:
    """Smooth + normalize one [h, w] attention map to an RGB heat overlay."""
    from PIL import Image

    a = np.asarray(
        Image.fromarray((attn * 255).astype(np.uint8)).resize(
            (size, size), Image.BILINEAR),
        np.float32) / 255.0
    # grayscale heat: emphasize attended regions
    heat = np.stack([a, a * 0.6, 1.0 - a], axis=-1)
    return (heat * 255).astype(np.uint8)


def build_super_images_all(
    images: np.ndarray,  # [B, H, W, 3] in [-1,1] or uint8
    captions: np.ndarray,  # [B, T] token ids
    cap_lens: Sequence[int],
    ixtoword: dict,
    attn_maps: np.ndarray,  # [B, T, h, w]
    vis_size: int = 256,
    alpha: float = 0.6,
) -> Tuple[Optional[np.ndarray], List[List[str]]]:
    """All-words attention grid (= build_super_imagesall,
    miscc/utils.py:328-451): row per image = [image | word overlays...],
    caption strip above. Returns (uint8 grid, sentences)."""
    b = images.shape[0]
    sentences = []
    rows = []
    # global attn min/max normalization (reference normalizes per map set)
    for i in range(b):
        n_words = int(cap_lens[i])
        words = [ixtoword.get(int(t), "?") for t in captions[i][:n_words]]
        sentences.append(words)
        img = _resize_np(_to_uint8(np.asarray(images[i])), vis_size)
        cells = [img]
        a = np.asarray(attn_maps[i][:n_words], np.float32)
        lo, hi = a.min(), a.max()
        a = (a - lo) / max(hi - lo, 1e-8)
        for j in range(n_words):
            overlay = _colorize(a[j], vis_size)
            blend = (img.astype(np.float32) * (1 - alpha)
                     + overlay.astype(np.float32) * alpha)
            cells.append(blend.astype(np.uint8))
        pad = np.full((vis_size, 2, 3), 255, np.uint8)
        row_cells = []
        for c in cells:
            row_cells.extend([c, pad])
        row = np.concatenate(row_cells[:-1], axis=1)
        strip = draw_caption(words, len(cells) - 1, vis_size)
        strip = _pad_to_width(strip, row.shape[1])
        rows.append(np.concatenate([strip, row], axis=0))
    width = max(r.shape[1] for r in rows)
    rows = [_pad_to_width(r, width) for r in rows]
    return np.concatenate(rows, axis=0), sentences


def build_super_images(
    images: np.ndarray, captions: np.ndarray, cap_lens: Sequence[int],
    ixtoword: dict, attn_maps: np.ndarray, vis_size: int = 256,
    top_k: Optional[int] = None,
) -> Tuple[Optional[np.ndarray], List[List[str]]]:
    """Training-time grid (= build_super_images, miscc/utils.py:74-199);
    `top_k` selects the K most-confident words (= build_super_images2's
    threshold-sum confidence ordering, miscc/utils.py:202-326)."""
    if top_k is None:
        return build_super_images_all(images, captions, cap_lens, ixtoword,
                                      attn_maps, vis_size)
    b = images.shape[0]
    new_caps = np.zeros((b, top_k), captions.dtype)
    new_lens = []
    new_attn = np.zeros(
        (b, top_k) + tuple(np.asarray(attn_maps).shape[2:]), np.float32)
    for i in range(b):
        n = int(cap_lens[i])
        a = np.asarray(attn_maps[i][:n], np.float32)
        thresh = 2.0 / max(n, 1)
        conf = (a * (a > 2 * thresh)).sum(axis=(1, 2))
        order = np.argsort(conf)[::-1][:top_k]
        order = np.sort(order)
        k = len(order)
        new_caps[i, :k] = np.asarray(captions[i])[order]
        new_attn[i, :k] = a[order]
        new_lens.append(k)
    return build_super_images_all(images, new_caps, new_lens, ixtoword,
                                  new_attn, vis_size)


def _pad_to_width(arr: np.ndarray, width: int) -> np.ndarray:
    if arr.shape[1] >= width:
        return arr[:, :width]
    pad = np.full((arr.shape[0], width - arr.shape[1], 3), 255, np.uint8)
    return np.concatenate([arr, pad], axis=1)
