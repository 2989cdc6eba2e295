"""Attention-map visualization -- exact reference semantics.

= miscc/utils.py:18-451 (COLOR_DIC, drawCaption/_no_order,
build_super_images / build_super_images2 / build_super_imagesall),
reimplemented host-side in numpy/PIL with two portability substitutions:

* the hardcoded Windows FreeMono path (miscc/utils.py:36) becomes DejaVu
  Sans Mono (a `font` parameter overrides; the oracle tests pin both sides
  to the same font file), and
* `skimage.transform.{resize, pyramid_expand}` (not installed here) are
  scipy-backed equivalents in utils/skimage_compat.py -- the same
  scipy.ndimage backend modern skimage itself delegates to.

Everything else is followed operation-for-operation, including the quirks:
pyramid_expand with multichannel=False doubles the CHANNEL axis too, and
the `np.resize(one_map, [256, 256, 3])` crop of the raveled buffer
(miscc/utils.py:286) then scrambles the upscaled map -- preserved because
it is the reference's observable output.

Input convention: images are NHWC float in [-1, 1] (the reference takes
NCHW torch tensors); attention maps are [T, h, w] per image.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

# = miscc/utils.py:18-28
COLOR_DIC = {
    0: [128, 64, 128], 1: [244, 35, 232],
    2: [70, 70, 70], 3: [102, 102, 156],
    4: [190, 153, 153], 5: [153, 153, 153],
    6: [250, 170, 30], 7: [220, 220, 0],
    8: [107, 142, 35], 9: [152, 251, 152],
    10: [70, 130, 180], 11: [220, 20, 60],
    12: [255, 0, 0], 13: [0, 0, 142],
    14: [119, 11, 32], 15: [0, 60, 100],
    16: [0, 80, 100], 17: [0, 0, 230],
    18: [0, 0, 70], 19: [0, 0, 0],
}
FONT_MAX = 50

_FONT_CANDIDATES = (
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
)


def default_font(size: int = 50):
    from PIL import ImageFont

    for path in _FONT_CANDIDATES:
        try:
            return ImageFont.truetype(path, size)
        except Exception:
            continue
    return ImageFont.load_default()


def draw_caption(convas: np.ndarray, captions: np.ndarray, ixtoword,
                 vis_size: int, off1: int = 2, off2: int = 2,
                 numbered: bool = True, font=None):
    """= drawCaption (numbered=True, miscc/utils.py:31-52) /
    drawCaption_no_order (numbered=False, miscc/utils.py:53-71): renders
    each caption's words onto row i of the canvas at column pitch
    (vis_size + off2), stopping at the <end>=0 token."""
    from PIL import Image, ImageDraw

    fnt = font or default_font(50)
    img_txt = Image.fromarray(convas)
    d = ImageDraw.Draw(img_txt)
    sentence_list = []
    for i in range(captions.shape[0]):
        cap = np.asarray(captions[i])
        sentence = []
        for j in range(len(cap)):
            if cap[j] == 0:
                break
            word = ixtoword[int(cap[j])].encode("ascii", "ignore").decode(
                "ascii")
            label = "%d:%s" % (j, word[:6]) if numbered else "%s" % word[:6]
            d.text(((j + off1) * (vis_size + off2), i * FONT_MAX), label,
                   font=fnt, fill=(255, 255, 255, 255))
            sentence.append(word)
        sentence_list.append(sentence)
    return img_txt, sentence_list


def _upsample_denorm(imgs: np.ndarray, vis_size: int) -> np.ndarray:
    """nn.Upsample(bilinear, align_corners=False) to (vis, vis) then
    [-1,1] -> [0,255] float (= miscc/utils.py:95-100). cv2 INTER_LINEAR
    uses the identical half-pixel mapping."""
    import cv2

    imgs = np.asarray(imgs, np.float32)
    out = np.empty((imgs.shape[0], vis_size, vis_size, 3), np.float32)
    for i in range(imgs.shape[0]):
        out[i] = cv2.resize(imgs[i], (vis_size, vis_size),
                            interpolation=cv2.INTER_LINEAR)
    return (out + 1.0) / 2.0 * 255.0


def _paste_overlay(img_u8: np.ndarray, att_u8: np.ndarray, vis_size: int,
                   alpha: int, resize_256: bool = False) -> np.ndarray:
    """PIL RGBA paste with a constant-L alpha mask (= miscc/utils.py
    171-178 at alpha 210; 287-294/413-419 at alpha 180 + .resize((256,256))).
    """
    from PIL import Image

    pil_im = Image.fromarray(img_u8)
    pil_att = Image.fromarray(att_u8)
    if resize_256:
        pil_im = pil_im.resize((256, 256))
        pil_att = pil_att.resize((256, 256))
    merged = Image.new("RGBA", (vis_size, vis_size), (0, 0, 0, 0))
    mask = Image.new("L", (vis_size, vis_size), alpha)
    merged.paste(pil_im, (0, 0))
    merged.paste(pil_att, (0, 0), mask)
    return np.array(merged)[:, :, :3]


def build_super_images(
    real_imgs: np.ndarray,  # [B, H, W, 3] float [-1, 1]
    captions: np.ndarray,  # [B, T] token ids (<end>=0)
    ixtoword: dict,
    attn_maps: Sequence[np.ndarray],  # per image [T, att_sze, att_sze]
    att_sze: int,
    lr_imgs: Optional[np.ndarray] = None,
    batch_size: Optional[int] = None,
    max_word_num: int = 18,
    font=None,
) -> Tuple[Optional[np.ndarray], List[List[str]]]:
    """Training-time attention grid (= build_super_images,
    miscc/utils.py:74-199): per image three stacked strips
    [caption text on COLOR_DIC column backgrounds; LR + raw maps;
    image + alpha-210 overlays], with a channelwise-max map prepended and
    GLOBAL min/max normalization across the maps of one image. Maps are
    upscaled by skimage-resize with anti_aliasing_sigma=20."""
    from tgsr_tpu.utils import skimage_compat as skc

    nvis = min(8, len(attn_maps))
    real_imgs = np.asarray(real_imgs)[:nvis]
    if batch_size is None:
        batch_size = real_imgs.shape[0]
    if att_sze == 17:
        vis_size = att_sze * 16
    else:
        vis_size = 256

    text_convas = np.ones(
        [batch_size * FONT_MAX, (max_word_num + 2) * (vis_size + 2), 3],
        dtype=np.uint8)
    for i in range(max_word_num):
        istart = (i + 2) * (vis_size + 2)
        iend = (i + 3) * (vis_size + 2)
        text_convas[:, istart:iend, :] = COLOR_DIC[i]

    real = _upsample_denorm(real_imgs, vis_size)
    middle_pad = np.zeros([vis_size, 2, 3])
    post_pad = np.zeros([vis_size, vis_size, 3])
    if lr_imgs is not None:
        lr = _upsample_denorm(np.asarray(lr_imgs)[:nvis], vis_size)
        lr = np.round(np.maximum(0, np.minimum(255, lr)))

    seq_len = max_word_num
    text_map, sentences = draw_caption(text_convas, captions, ixtoword,
                                       vis_size, font=font)
    text_map = np.asarray(text_map).astype(np.uint8)

    img_set = []
    for i in range(nvis):
        attn = np.asarray(attn_maps[i], np.float32).reshape(
            -1, att_sze, att_sze)
        attn = np.concatenate([attn.max(0, keepdims=True), attn], 0)
        attn = np.repeat(attn[:, :, :, None], 3, axis=-1)
        num_attn = attn.shape[0]

        img = np.round(np.maximum(0, np.minimum(255, real[i])))
        lrI = img if lr_imgs is None else lr[i]
        row = [lrI, middle_pad]
        row_merge = [img, middle_pad]
        row_beforeNorm = []
        minVglobal, maxVglobal = 1, 0
        for j in range(num_attn):
            one_map = attn[j]
            if (vis_size // att_sze) > 1:
                one_map = skc.resize(one_map, (vis_size, vis_size),
                                     anti_aliasing=True,
                                     anti_aliasing_sigma=20)
            row_beforeNorm.append(one_map)
            minVglobal = min(minVglobal, one_map.min())
            maxVglobal = max(maxVglobal, one_map.max())
        for j in range(seq_len + 1):
            if j < num_attn:
                one_map = (row_beforeNorm[j] - minVglobal) / (
                    maxVglobal - minVglobal) * 255
                merged = _paste_overlay(np.uint8(img), np.uint8(one_map),
                                        vis_size, alpha=210)
            else:
                one_map = post_pad
                merged = post_pad
            row.extend([one_map, middle_pad])
            row_merge.extend([merged, middle_pad])
        row = np.concatenate(row, 1)
        row_merge = np.concatenate(row_merge, 1)
        txt = text_map[i * FONT_MAX: (i + 1) * FONT_MAX]
        if txt.shape[1] != row.shape[1]:
            return None, sentences
        img_set.append(np.concatenate([txt, row, row_merge], 0))
    return np.concatenate(img_set, 0).astype(np.uint8), sentences


def _bilinear_align_false(maps: np.ndarray, out_h: int,
                          out_w: int) -> np.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) over a
    [N, h, w] stack -- the upsample the reference's shape-mismatch
    fallback uses (miscc/utils.py:241-242)."""
    n, h, w = maps.shape
    ys = np.maximum((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0.0)
    xs = np.maximum((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0.0)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0).astype(np.float32)[None, :, None]
    fx = (xs - x0).astype(np.float32)[None, None, :]
    top = maps[:, y0][:, :, x0] * (1 - fx) + maps[:, y0][:, :, x1] * fx
    bot = maps[:, y1][:, :, x0] * (1 - fx) + maps[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


def _build_super_images2_core(real_imgs, captions, cap_lens, ixtoword,
                              attn_maps, att_sze, att_sze1, vis_size, topK,
                              reorder, numbered, font):
    """Shared body of build_super_images2 (reorder=True, topK) and
    build_super_imagesall (reorder=False, all words)
    (= miscc/utils.py:202-326 and 328-451)."""
    from tgsr_tpu.utils import skimage_compat as skc

    real_imgs = np.asarray(real_imgs)
    batch_size = real_imgs.shape[0]
    if att_sze1 is None:
        att_sze1 = att_sze
    cap_lens = np.asarray(cap_lens)
    max_word_num = int(np.max(cap_lens))
    text_convas = np.ones(
        [batch_size * FONT_MAX, max_word_num * (vis_size + 2), 3],
        dtype=np.uint8)

    real = _upsample_denorm(real_imgs, vis_size)
    real = np.round(np.maximum(0, np.minimum(255, real)))
    middle_pad = np.zeros([vis_size, 2, 3])

    num = len(attn_maps)
    text_map, sentences = draw_caption(text_convas, captions, ixtoword,
                                       vis_size, off1=0, numbered=numbered,
                                       font=font)
    text_map = np.asarray(text_map).astype(np.uint8)

    img_set = []
    for i in range(num):
        a = np.asarray(attn_maps[i], np.float32)
        if a.size % (att_sze * att_sze1) == 0:
            attn = a.reshape(-1, att_sze, att_sze1)
        else:
            # Reference fallback (miscc/utils.py:236-247): a map whose
            # stored geometry disagrees with att_sze is bilinearly resized
            # (torch nn.Upsample, align_corners=False) per word instead of
            # raising.
            attn = _bilinear_align_false(
                a.reshape(-1, a.shape[-2], a.shape[-1]), att_sze, att_sze1)
        attn = np.repeat(attn[:, :, :, None], 3, axis=-1)
        num_attn = int(cap_lens[i])
        thresh = 2.0 / float(num_attn)
        img = real[i]
        row, row_merge, row_txt = [], [], []
        row_beforeNorm, conf_score = [], []
        for j in range(num_attn):
            one_map = attn[j]
            mask0 = one_map > (2.0 * thresh)
            conf_score.append(np.sum(one_map * mask0))
            mask = one_map > thresh
            one_map = one_map * mask
            if (vis_size // att_sze) > 1:
                # NOTE: multichannel-unaware pyramid_expand scales the
                # channel axis too ([h,w,3] -> [2h,2w,6] at upscale 2);
                # np.resize below then crops the raveled buffer -- the
                # reference's exact (scrambled) output, kept faithfully.
                one_map = skc.pyramid_expand(
                    one_map, sigma=20, upscale=vis_size // att_sze)
            minV, maxV = one_map.min(), one_map.max()
            one_map = (one_map - minV) / (maxV - minV)
            row_beforeNorm.append(one_map)
        sorted_indices = np.argsort(conf_score)[::-1]

        for j in range(num_attn):
            one_map = row_beforeNorm[j] * 255
            one_map = np.resize(one_map, [256, 256, 3])
            merged = _paste_overlay(np.uint8(img), np.uint8(one_map),
                                    vis_size, alpha=180, resize_256=True)
            row.append(np.concatenate([one_map, middle_pad], 1))
            row_merge.append(np.concatenate([merged, middle_pad], 1))
            row_txt.append(text_map[i * FONT_MAX:(i + 1) * FONT_MAX,
                                    j * (vis_size + 2):(j + 1) * (vis_size + 2),
                                    :])
        order = list(sorted_indices) if reorder else list(range(num_attn))
        k = topK if reorder else num_attn
        row = np.concatenate([row[idx] for idx in order][:k], 1)
        row_merge = np.concatenate([row_merge[idx] for idx in order][:k], 1)
        txt = np.concatenate([row_txt[idx] for idx in order][:k], 1)
        if txt.shape[1] != row.shape[1]:
            return None, sentences
        img_set.append(np.concatenate([txt, row_merge], 0))
    return np.concatenate(img_set, 0).astype(np.uint8), sentences


def build_super_images2(
    real_imgs: np.ndarray,  # [B, H, W, 3] float [-1, 1]
    captions: np.ndarray,
    cap_lens: Sequence[int],
    ixtoword: dict,
    attn_maps: Sequence[np.ndarray],  # per image [T, att_sze, att_sze1]
    att_sze: int,
    att_sze1: Optional[int] = None,
    vis_size: int = 256,
    topK: int = 5,
    font=None,
) -> Tuple[Optional[np.ndarray], List[List[str]]]:
    """Eval-time top-K grid (= build_super_images2, miscc/utils.py:202-326):
    per word, confidence = sum of attention above 2*(2/T); maps are
    thresholded at 2/T, pyramid_expand(sigma=20)-smoothed, per-map
    normalized, alpha-180 merged; columns sorted by confidence, top-K kept;
    output = [numbered caption strip; merged overlays]."""
    return _build_super_images2_core(real_imgs, captions, cap_lens, ixtoword,
                                     attn_maps, att_sze, att_sze1, vis_size,
                                     topK, reorder=True, numbered=True,
                                     font=font)


def build_super_imagesall(
    real_imgs: np.ndarray,
    captions: np.ndarray,
    cap_lens: Sequence[int],
    ixtoword: dict,
    attn_maps: Sequence[np.ndarray],
    att_sze: int,
    att_sze1: Optional[int] = None,
    vis_size: int = 256,
    font=None,
) -> Tuple[Optional[np.ndarray], List[List[str]]]:
    """All-words grid in caption order, un-numbered text
    (= build_super_imagesall, miscc/utils.py:328-451; used by
    gen_exampleSRHL, trainer_objective.py:159-165)."""
    return _build_super_images2_core(real_imgs, captions, cap_lens, ixtoword,
                                     attn_maps, att_sze, att_sze1, vis_size,
                                     topK=None, reorder=False, numbered=False,
                                     font=font)


def build_super_images_all(
    images: np.ndarray,
    captions: np.ndarray,
    cap_lens: Sequence[int],
    ixtoword: dict,
    attn_maps: np.ndarray,
    vis_size: int = 256,
) -> Tuple[Optional[np.ndarray], List[List[str]]]:
    """Back-compat adapter over build_super_imagesall for uint8 NHWC
    callers (cli/test.py)."""
    images = np.asarray(images)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 127.5 - 1.0
    attn = np.asarray(attn_maps)
    return build_super_imagesall(images, np.asarray(captions), cap_lens,
                                 ixtoword, attn, att_sze=attn.shape[-2],
                                 att_sze1=attn.shape[-1], vis_size=vis_size)
