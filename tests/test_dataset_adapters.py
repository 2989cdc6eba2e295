"""Synthetic-fixture tests for the dataset adapters that had no local data:
flower (Oxford-102 text_c10 layout), coco (train2014/val2014 layout),
SR-training variants (stopword/color caches, deterministic test caption),
SRGT (both caption-line formats), and the meaningless control variant.

The fixtures fabricate the exact file formats the reference consumes
(datasets.py:504-903, 1146-1345, 1348-1548, 1721-1885, 1888-1972), so these
pin the byte-level contracts without the real datasets.
"""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from tgsr_tpu.data.datasets import (
    TextCocoDataset,
    TextExampleSRDataset,
    TextFlowerDataset,
    TextSRDataset,
    TextSRGTDataset,
    Vocab,
    prepare_batch,
)


def _img(path, h=80, w=90, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(
        str(path))


def test_flower_dataset(tmp_path):
    root = tmp_path / "flowers"
    for cls in (1, 2):
        d = root / "text_c10" / f"class_{cls:05d}"
        d.mkdir(parents=True)
        for i in range(5):  # last 3 per class -> test split
            name = f"image_{cls:02d}{i:03d}"
            with open(d / f"{name}.txt", "w") as f:
                for j in range(2):
                    f.write(f"this flower has {cls} petals and "
                            f"{'red yellow'.split()[j]} color\n")
            _img(root / "jpg" / f"{name}.jpg", seed=cls * 10 + i)

    ds = TextFlowerDataset(str(root), split="train", imsize=64,
                           embeddings_num=2)
    assert len(ds) == 4  # 2 per class
    assert sorted(set(ds.class_id.tolist())) == [1, 2]
    ds_t = TextFlowerDataset(str(root), split="test", imsize=64,
                             embeddings_num=2)
    # reference eval protocol: filenames[::3] (one per class triple) with
    # ONE deterministic caption each (datasets.py:1294-1296,1341)
    assert len(ds_t) == 2
    assert ds_t.embeddings_num == 1 and len(ds_t.captions) == 2
    ex_t0 = ds_t.__getitem__(0)
    ex_t0b = ds_t.__getitem__(0)
    np.testing.assert_array_equal(ex_t0.tokens, ex_t0b.tokens)  # det.
    ex = ds.__getitem__(0, sent_ix=0)
    assert ex.hr.shape == (64, 64, 3)
    assert "flower" in ds.vocab.decode(ex.tokens[: ex.length])
    # cache round-trip
    assert (root / "captions_flower_v2.pickle").exists()
    ds2 = TextFlowerDataset(str(root), split="train", imsize=64)
    assert ds2.vocab.n_words == ds.vocab.n_words


def test_flower_brace_placeholder_duplicates_previous(tmp_path):
    """The reference treats a literal '{}' caption line as 'repeat the
    previous caption' (datasets.py:1201-1205) so every file still yields
    embeddings_num captions; dropping it would shift the flat
    index*embeddings_num addressing for every later image."""
    root = tmp_path / "flowers"
    d = root / "text_c10" / "class_00001"
    d.mkdir(parents=True)
    files = (["a purple flower", "{}"],
             ["a yellow flower", "a tall flower"],
             # last 3 (sorted) files land in the test split
             ["small flower", "white flower"],
             ["small flower", "white flower"],
             ["small flower", "white flower"])
    for i, lines in enumerate(files):
        name = f"image_01{i:03d}"
        (d / f"{name}.txt").write_text("\n".join(lines) + "\n")
        _img(root / "jpg" / f"{name}.jpg", seed=i)

    ds = TextFlowerDataset(str(root), split="train", imsize=64,
                           embeddings_num=2)
    assert len(ds.captions) == 4  # 2 per file, '{}' filled in
    assert ds.captions[1] == ds.captions[0]  # the duplicate
    # image 1's captions start at the right flat offset
    assert "yellow" in ds.vocab.decode(
        np.asarray(ds.captions[2], np.int32))


def _stage_coco(root, n_train=3, n_test=2):
    names_tr = [f"COCO_train2014_{i:012d}" for i in range(n_train)]
    names_te = [f"COCO_val2014_{i:012d}" for i in range(n_test)]
    for split, names in (("train", names_tr), ("test", names_te)):
        (root / split).mkdir(parents=True)
        with open(root / split / "filenames.pickle", "wb") as f:
            pickle.dump(names, f)
    os.makedirs(root / "text", exist_ok=True)
    for i, n in enumerate(names_tr + names_te):
        with open(root / "text" / f"{n}.txt", "w") as f:
            for j in range(5):
                f.write(f"a photo of {j} cats on object {i}\n")
    for n in names_tr:
        _img(root / "images" / "train2014" / f"{n}.jpg")
    for n in names_te:
        _img(root / "images" / "val2014" / f"{n}.jpg")
    # the SR-training variant reads flat images/<name>.jpg
    for n in names_tr + names_te:
        _img(root / "images" / f"{n}.jpg")
    return names_tr, names_te


def test_coco_dataset(tmp_path):
    root = tmp_path / "coco"
    _stage_coco(root)
    ds = TextCocoDataset(str(root), split="train", embeddings_num=5,
                         imsize=64)
    assert len(ds) == 3
    ex = ds.__getitem__(1, sent_ix=2)
    assert ex.hr.shape == (64, 64, 3)
    assert ds.vocab.decode(ex.tokens[: ex.length])[:3] == ["a", "photo", "of"]
    ds_t = TextCocoDataset(str(root), split="test", embeddings_num=5,
                           imsize=64)
    assert len(ds_t) == 2
    assert ds_t.__getitem__(0, sent_ix=0).hr.shape == (64, 64, 3)


def test_sr_dataset_variants(tmp_path):
    root = tmp_path / "coco"
    _stage_coco(root)
    ds = TextSRDataset(str(root), split="train", embeddings_num=5, imsize=64)
    assert os.path.exists(root / "captions5450.pickle")
    # stopword variant drops 'a'/'of' and caches separately
    ds_ns = TextSRDataset(str(root), split="train", embeddings_num=5,
                          imsize=64, no_stopwords=True)
    assert os.path.exists(root / "captions5450_nostop.pickle")
    words = ds.vocab.decode(ds.captions[0])
    words_ns = ds_ns.vocab.decode(ds_ns.captions[0])
    assert "a" in words and "a" not in words_ns
    # test split pins caption 0 regardless of rng
    ds_t = TextSRDataset(str(root), split="test", embeddings_num=5, imsize=64)
    e1 = ds_t[0]
    e2 = ds_t[0]
    np.testing.assert_array_equal(e1.tokens, e2.tokens)


def test_srgt_dataset_both_formats(tmp_path):
    # face attr names keep their original capitalization end-to-end
    vocab_words = ["<end>", "Big", "Nose", "Smiling", "a", "bird", "flying"]
    ix2w = dict(enumerate(vocab_words))
    w2ix = {w: i for i, w in ix2w.items()}
    vocab = Vocab(ix2w, w2ix)

    d = tmp_path / "gt"
    imd = tmp_path / "ims"
    d.mkdir()
    imd.mkdir()
    for n in ("x1.png", "x2.png"):
        _img(imd / n, h=70, w=70)

    # face format: header attr line, then 'name|<flags>'
    with open(d / "testset.txt", "w") as f:
        f.write("Big Nose Smiling \n")
        f.write("x1.png|0 1 0 1\n")
        f.write("x2.png|0 0 1 0\n")
    ds = TextSRGTDataset(vocab, str(d), str(imd), dataset="face", imsize=64)
    assert len(ds) == 2
    ex = ds.__getitem__(0, sent_ix=0)
    assert ds.vocab.decode(ex.tokens[: ex.length]) == ["Big", "Smiling"]
    assert ex.hr.shape == (64, 64, 3)

    # generic format: 'name|caption'
    with open(d / "other.txt", "w") as f:
        f.write("x1.png|A bird flying\n")
        f.write("x2.png|a big bird\n")
    ds2 = TextSRGTDataset(vocab, str(d), str(imd), txt="other.txt",
                          dataset="bird", imsize=64)
    ex2 = ds2.__getitem__(0, sent_ix=0)
    assert ds2.vocab.decode(ex2.tokens[: ex2.length]) == ["a", "bird",
                                                          "flying"]
    batch = prepare_batch([ds2.__getitem__(i, sent_ix=0) for i in range(2)])
    assert batch["hr"].shape == (2, 64, 64, 3)


def test_example_sr_meaningless_control(tmp_path):
    """= TextexampleSRDataset_meaningless (datasets.py:1888-1972): constant
    token-1 captions (the text-ablation control)."""
    caps = [[3, 4, 5], [6, 7]]
    ix2w = {i: f"w{i}" for i in range(8)}
    w2ix = {v: k for k, v in ix2w.items()}
    d = tmp_path / "ex"
    (d / "Img" / "changetxt_im1").mkdir(parents=True)
    for i in range(2):
        _img(d / "Img" / "changetxt_im1" / f"{i:06d}.png")
    with open(d / "caps.pickle", "wb") as f:
        pickle.dump([caps, ix2w, w2ix], f)

    ds = TextExampleSRDataset(str(d), str(d / "caps.pickle"), imsize=64,
                              meaningless=True)
    ex = ds.__getitem__(0, sent_ix=0)
    assert ex.tokens[0] == 1 and ex.length == 1
    ds_real = TextExampleSRDataset(str(d), str(d / "caps.pickle"), imsize=64)
    ex_r = ds_real.__getitem__(0, sent_ix=0)
    assert list(ex_r.tokens[: ex_r.length]) == [3, 4, 5]


def test_srgt_small_image_center_pad(tmp_path):
    """Images below imsize are zero-padded centered (= torchvision
    CenterCrop semantics, the reference's transform at datasets.py:1726) —
    the batching consumer (cli.eval_rank) relies on uniform shapes."""
    vocab = Vocab({0: "<end>", 1: "a"}, {"<end>": 0, "a": 1})
    d, imd = tmp_path / "gt", tmp_path / "ims"
    d.mkdir(), imd.mkdir()
    small = np.full((40, 60, 3), 200, np.uint8)
    Image.fromarray(small).save(str(imd / "s.png"))
    with open(d / "t.txt", "w") as f:
        f.write("s.png|a\n")
    ds = TextSRGTDataset(vocab, str(d), str(imd), txt="t.txt",
                         dataset="bird", imsize=64)
    hr = ds.__getitem__(0, sent_ix=0).hr
    assert hr.shape == (64, 64, 3)
    # content centered, border zero
    assert (hr[12:52, 2:62] == 200).all()
    assert (hr[:12] == 0).all() and (hr[52:] == 0).all()
    assert (hr[:, :2] == 0).all() and (hr[:, 62:] == 0).all()


def test_train_split_augmentation(tmp_path):
    """Train splits apply the reference training transform (Resize +
    RandomCrop + RandomHorizontalFlip, pretrain_DAMSM.py:237-240): the
    image varies with the rng stream, reproduces under the same stream
    (exact-resume contract), and eval splits stay deterministic."""
    from tests.conftest import make_celeba_fixture
    from tgsr_tpu.data.datasets import TextFaceDataset

    make_celeba_fixture(tmp_path, n_train=2, n_test=1, img_size=90)
    ds = TextFaceDataset(str(tmp_path), split="train", imsize=64)
    assert ds.augment
    a = ds.__getitem__(0, rng=np.random.default_rng(1), sent_ix=0).hr
    b = ds.__getitem__(0, rng=np.random.default_rng(2), sent_ix=0).hr
    c = ds.__getitem__(0, rng=np.random.default_rng(1), sent_ix=0).hr
    assert a.shape == (64, 64, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0  # crops differ
    np.testing.assert_array_equal(a, c)  # same stream -> same crop

    ds_t = TextFaceDataset(str(tmp_path), split="test", imsize=64)
    assert not ds_t.augment
    t1 = ds_t.__getitem__(0, rng=np.random.default_rng(1), sent_ix=0).hr
    t2 = ds_t.__getitem__(0, rng=np.random.default_rng(2), sent_ix=0).hr
    np.testing.assert_array_equal(t1, t2)  # eval: deterministic
