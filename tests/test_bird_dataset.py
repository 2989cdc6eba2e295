"""TextDataset bird path: CUB layout, bbox crop, vocab cache, reweight loss."""

import os
import pickle

import numpy as np
import pytest


def _stage_cub(tmp_path):
    """Minimal CUB_200_2011-format dataset with 3 train + 1 test images."""
    from PIL import Image

    root = tmp_path / "birds"
    cub = root / "CUB_200_2011"
    (cub / "images" / "001.Black_footed_Albatross").mkdir(parents=True)
    names = [f"001.Black_footed_Albatross/bird_{i}" for i in range(4)]
    rng = np.random.default_rng(0)
    with open(cub / "images.txt", "w") as f:
        for i, n in enumerate(names):
            f.write(f"{i+1} {n}.jpg\n")
    with open(cub / "bounding_boxes.txt", "w") as f:
        for i in range(4):
            f.write(f"{i+1} 10.0 12.0 40.0 44.0\n")
    for n in names:
        arr = rng.integers(0, 255, (80, 90, 3)).astype(np.uint8)
        Image.fromarray(arr).save(cub / "images" / f"{n}.jpg")

    (root / "text" / "001.Black_footed_Albatross").mkdir(parents=True)
    for i, n in enumerate(names):
        with open(root / "text" / f"{n}.txt", "w") as f:
            for j in range(3):
                f.write(f"a small bird with {'red blue green'.split()[j]} "
                        f"wings number {i}\n")

    for split, sel in [("train", names[:3]), ("test", names[3:])]:
        (root / split).mkdir()
        with open(root / split / "filenames.pickle", "wb") as f:
            pickle.dump(sel, f)
    return str(root)


def test_bird_dataset_end_to_end(tmp_path):
    from tgsr_tpu.data.datasets import TextDataset, prepare_batch

    root = _stage_cub(tmp_path)
    ds = TextDataset(root, split="train", embeddings_num=3, imsize=64)
    assert len(ds) == 3
    assert ds.bbox is not None and len(ds.bbox) == 4
    ex = ds.__getitem__(0, sent_ix=0)
    assert ex.hr.shape == (64, 64, 3)
    words = ds.vocab.decode(ex.tokens[: ex.length])
    assert words[0] == "a" and "bird" in words
    # vocab cached
    assert os.path.exists(os.path.join(root, "captions.pickle"))
    ds2 = TextDataset(root, split="test", embeddings_num=3, imsize=64)
    assert len(ds2) == 1
    batch = prepare_batch([ds.__getitem__(i, sent_ix=0) for i in range(3)])
    assert batch["hr"].shape == (3, 64, 64, 3)


def test_bbox_crop_geometry():
    from tgsr_tpu.data.datasets import bbox_crop

    img = np.arange(100 * 120 * 3, dtype=np.uint8).reshape(100, 120, 3)
    # = get_imgs math (datasets.py:115-123): r=33, cx=30, cy=34
    out = bbox_crop(img, [10, 12, 40, 44])
    assert out.shape == (66, 63, 3)  # y 1:67, x 0:63 (clamped)


def test_reweighted_words_loss_integration():
    """generator_re_weight_loss path: confidence scores from generator attn
    maps rescale word features (losses.py:137-232 + :151-163)."""
    import jax
    import jax.numpy as jnp

    from tgsr_tpu.losses.damsm import word_confidence_scores, words_loss

    B, T, R, E = 3, 6, 9, 16
    k = jax.random.PRNGKey(0)
    feat = jax.random.normal(k, (B, R, E))
    words = jax.random.normal(jax.random.fold_in(k, 1), (B, T, E))
    lens = jnp.array([6, 4, 2])
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(k, 2), (B, T, 8, 8)), axis=1)
    conf = word_confidence_scores(attn, lens)
    assert conf.shape == (B, T)
    l0, l1, _ = words_loss(feat, words, lens, None, word_scale=conf)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    # scaling with ones == unscaled
    a0, a1, _ = words_loss(feat, words, lens, None,
                           word_scale=jnp.ones((B, T)))
    b0, b1, _ = words_loss(feat, words, lens, None)
    np.testing.assert_allclose(float(a0), float(b0), rtol=1e-6)
