"""Oracle tests for the attention-visualization layer.

Runs the reference build_super_images / build_super_images2 /
build_super_imagesall (miscc/utils.py:74-451) side by side with
tgsr_tpu.utils.visualize on identical fixed inputs. Both sides share the
same font file and the same scipy-backed skimage substitutes
(utils/skimage_compat.py), so these diffs pin everything else exactly:
COLOR_DIC canvas columns, the channelwise-max map, global vs per-map
normalization, threshold masks + confidence ordering, the alpha-210/180
paste layers, the multichannel-unaware pyramid_expand + np.resize
scramble quirk, and the strip layout.

The ONLY unshared numeric op is the image bilinear upsample (torch
nn.Upsample on the reference side, cv2.INTER_LINEAR here -- the same
half-pixel mapping), so assertions allow |diff| <= 1 on a tiny fraction of
pixels and demand the overwhelming majority match bitwise.
"""

import numpy as np
import pytest
import torch

from tests.reference_oracle import load_reference_utils

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf"


@pytest.fixture(scope="module")
def ref_utils():
    return load_reference_utils(FONT)


def _fixed_inputs(b, t, att, img_size=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(-1, 1, (b, img_size, img_size, 3)).astype(np.float32)
    captions = np.zeros((b, t), np.int64)
    cap_lens = rng.integers(3, t, b)
    for i in range(b):
        captions[i, : cap_lens[i]] = rng.integers(1, 30, cap_lens[i])
    attn = rng.uniform(0, 0.4, (b, t, att, att)).astype(np.float32)
    ixtoword = {i: f"w{i}" for i in range(30)}
    ixtoword[0] = "<end>"
    return imgs, captions, cap_lens, attn, ixtoword


def _assert_close(ours, theirs, what, frac_exact=0.985):
    assert theirs is not None, f"{what}: reference returned None"
    assert ours is not None, f"{what}: ours returned None"
    assert ours.shape == theirs.shape, (
        f"{what}: shape {ours.shape} vs {theirs.shape}")
    a, b = ours.astype(np.int32), theirs.astype(np.int32)
    diff = np.abs(a - b)
    exact = float((diff == 0).mean())
    assert exact >= frac_exact, f"{what}: only {exact:.4f} pixels bit-equal"
    assert diff.max() <= 1, (
        f"{what}: max abs diff {diff.max()} (beyond bilinear rounding)")


def test_build_super_images_oracle(ref_utils):
    """Training grid: COLOR_DIC columns, max-map prepend, AA-resize
    (sigma 20), global normalize, alpha-210 paste (miscc/utils.py:74-199).
    att_sze=16 -> vis 256 exercises the upscale path."""
    from tgsr_tpu.utils.visualize import build_super_images, default_font

    b, t, att = 2, 6, 16
    imgs, captions, cap_lens, attn, ixtoword = _fixed_inputs(b, t, att)

    ref_out = ref_utils.build_super_images(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        torch.from_numpy(captions),
        ixtoword,
        [torch.from_numpy(attn[i]) for i in range(b)],
        att, batch_size=b, max_word_num=t)
    assert ref_out is not None
    ref_grid, ref_sent = ref_out

    grid, sent = build_super_images(
        imgs, captions, ixtoword, [attn[i] for i in range(b)], att,
        batch_size=b, max_word_num=t, font=default_font(50))
    assert sent == ref_sent
    _assert_close(grid, ref_grid, "build_super_images")


def test_build_super_images_lr_and_17(ref_utils):
    """The att_sze==17 DAMSM branch (vis 272) with a separate lr_imgs
    strip (miscc/utils.py:81-83, 104-111)."""
    from tgsr_tpu.utils.visualize import build_super_images, default_font

    b, t, att = 2, 5, 17
    imgs, captions, cap_lens, attn, ixtoword = _fixed_inputs(
        b, t, att, img_size=34, seed=3)
    rng = np.random.default_rng(7)
    lr = rng.uniform(-1, 1, (b, 17, 17, 3)).astype(np.float32)

    ref_out = ref_utils.build_super_images(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        torch.from_numpy(captions), ixtoword,
        [torch.from_numpy(attn[i]) for i in range(b)],
        att, lr_imgs=torch.from_numpy(lr.transpose(0, 3, 1, 2)),
        batch_size=b, max_word_num=t)
    assert ref_out is not None
    ref_grid, _ = ref_out

    grid, _ = build_super_images(
        imgs, captions, ixtoword, [attn[i] for i in range(b)], att,
        lr_imgs=lr, batch_size=b, max_word_num=t, font=default_font(50))
    _assert_close(grid, ref_grid, "build_super_images att17+lr")


def test_build_super_images2_oracle(ref_utils):
    """Top-K eval grid: thresholds, confidence sort, pyramid_expand
    (sigma 20) incl. the channel-doubling + np.resize scramble, alpha-180
    (miscc/utils.py:202-326). att_sze=64 -> upscale 4."""
    from tgsr_tpu.utils.visualize import build_super_images2, default_font

    b, t, att = 2, 7, 64
    imgs, captions, cap_lens, attn, ixtoword = _fixed_inputs(
        b, t, att, seed=1)

    ref_out = ref_utils.build_super_images2(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        torch.from_numpy(captions), cap_lens, ixtoword,
        [torch.from_numpy(attn[i]) for i in range(b)], att, topK=5)
    assert ref_out is not None
    ref_grid, ref_sent = ref_out

    grid, sent = build_super_images2(
        imgs, captions, cap_lens, ixtoword, [attn[i] for i in range(b)],
        att, topK=5, font=default_font(50))
    assert sent == ref_sent
    _assert_close(grid, ref_grid, "build_super_images2")


def test_build_super_imagesall_oracle(ref_utils):
    """All-words grid, caption order, un-numbered labels
    (miscc/utils.py:328-451) -- the gen_exampleSRHL output surface."""
    from tgsr_tpu.utils.visualize import build_super_imagesall, default_font

    b, t, att = 2, 6, 64
    imgs, captions, cap_lens, attn, ixtoword = _fixed_inputs(
        b, t, att, seed=2)

    ref_out = ref_utils.build_super_imagesall(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        torch.from_numpy(captions), cap_lens, ixtoword,
        [torch.from_numpy(attn[i]) for i in range(b)], att)
    assert ref_out is not None
    ref_grid, ref_sent = ref_out

    grid, sent = build_super_imagesall(
        imgs, captions, cap_lens, ixtoword, [attn[i] for i in range(b)],
        att, font=default_font(50))
    assert sent == ref_sent
    _assert_close(grid, ref_grid, "build_super_imagesall")


def test_build_super_images2_shape_fallback(ref_utils):
    """Shape-mismatch fallback (miscc/utils.py:236-247): stored 32x32 maps
    with att_sze=64 fail the view and are bilinearly upsampled per word
    (nn.Upsample align_corners=False) instead of raising."""
    from tgsr_tpu.utils.visualize import build_super_images2, default_font

    b, t, att_stored, att = 1, 5, 32, 64
    imgs, captions, cap_lens, attn, ixtoword = _fixed_inputs(
        b, t, att_stored, seed=5)
    assert (t * att_stored * att_stored) % (att * att) != 0

    ref_out = ref_utils.build_super_images2(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        torch.from_numpy(captions), cap_lens, ixtoword,
        [torch.from_numpy(attn[i]) for i in range(b)], att, topK=4)
    assert ref_out is not None
    ref_grid, ref_sent = ref_out

    grid, sent = build_super_images2(
        imgs, captions, cap_lens, ixtoword, [attn[i] for i in range(b)],
        att, topK=4, font=default_font(50))
    assert sent == ref_sent
    _assert_close(grid, ref_grid, "build_super_images2 shape fallback")


def test_no_upscale_branch(ref_utils):
    """att_sze == vis_size skips smoothing entirely (both functions use
    `vis_size // att_sze > 1` gates) -- structural layout must still
    match."""
    from tgsr_tpu.utils.visualize import build_super_images2, default_font

    b, t, att = 1, 4, 256
    imgs, captions, cap_lens, attn, ixtoword = _fixed_inputs(
        b, t, att, img_size=64, seed=4)

    ref_out = ref_utils.build_super_images2(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        torch.from_numpy(captions), cap_lens, ixtoword,
        [torch.from_numpy(attn[i]) for i in range(b)], att, topK=3)
    assert ref_out is not None
    grid, _ = build_super_images2(
        imgs, captions, cap_lens, ixtoword, [attn[i] for i in range(b)],
        att, topK=3, font=default_font(50))
    _assert_close(grid, ref_out[0], "build_super_images2 no-upscale")
