"""Data layer: tokenizer parity, caption encoding, CelebA attr parsing
against the real reference artifacts, device preprocessing."""

import os
import pickle

import numpy as np
import pytest

from tgsr_tpu.data.tokenizer import (
    build_dictionary,
    encode_caption,
    tokenize_caption,
)

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference not mounted")


def test_tokenizer_matches_nltk_regexp():
    nltk = pytest.importorskip("nltk")
    from nltk.tokenize import RegexpTokenizer

    tk = RegexpTokenizer(r"\w+")
    for cap in [
        "A bird with a RED head, and blue-ish wings!",
        "this.is;punctuated?text 123 mixed_CASE",
        "café résumé naïve",  # non-ascii filtered per-char
    ]:
        ref = []
        for t in tk.tokenize(cap.lower()):
            t = t.encode("ascii", "ignore").decode("ascii")
            if t:
                ref.append(t)
        assert tokenize_caption(cap) == ref


def test_encode_caption_pad_and_subsample():
    toks, length = encode_caption([5, 3, 9], 6)
    assert list(toks) == [5, 3, 9, 0, 0, 0]
    assert length == 3
    # longer than words_num: sorted random subsample, order preserved
    rng = np.random.default_rng(0)
    sent = list(range(1, 30))
    toks, length = encode_caption(sent, 10, rng)
    assert length == 10
    assert list(toks) == sorted(toks, key=lambda v: sent.index(v))
    assert all(t in sent for t in toks)


def test_build_dictionary_semantics():
    train = [["a", "bird", "red"], ["a", "blue", "bird"]]
    test = [["red", "flower"]]
    tr, te, vocab = build_dictionary(train, test)
    assert vocab.ixtoword[0] == "<end>"
    # insertion order over train+test
    assert vocab.wordtoix["a"] == 1
    assert vocab.wordtoix["bird"] == 2
    assert vocab.wordtoix["red"] == 3
    assert vocab.wordtoix["blue"] == 4
    assert vocab.wordtoix["flower"] == 5
    assert tr == [[1, 2, 3], [1, 4, 2]]
    assert te == [[3, 5]]
    assert vocab.n_words == 6


@needs_ref
def test_face_attr_parsing_matches_shipped_pickle(tmp_path):
    """Parse the real testset.txt (CelebA attr format) and check the decoded
    caption for 000155 matches the shipped testset.pickle tokens."""
    from tgsr_tpu.data.datasets import TextFaceDataset

    src = open(os.path.join(REF, "data/face/testset.txt")).read()
    (tmp_path / "list_attr_celeba.txt").write_text(src)

    train_caps, train_names = TextFaceDataset.load_attr_captions(
        str(tmp_path), train=True)
    test_caps, test_names = TextFaceDataset.load_attr_captions(
        str(tmp_path), train=False)

    with open(os.path.join(REF, "data/face/testset.pickle"), "rb") as f:
        caps, ixtoword, wordtoix = pickle.load(f)
    assert len(train_caps) + len(test_caps) == len(caps)

    all_names = train_names + test_names
    all_caps = train_caps + test_caps
    i155 = all_names.index("000155.png")
    expected = [ixtoword[t] for t in caps[0]]  # first pickle row = 000155
    assert all_caps[i155] == expected


def test_device_preprocess_contract():
    from tgsr_tpu.data.pipeline import device_preprocess

    hr = (np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3))
          .astype(np.uint8))
    out = device_preprocess(hr, n_branches=4, base_size=8, with_blur=True)
    sizes = [p.shape[1] for p in out["pyramid"]]
    assert sizes == [8, 16, 32, 64]
    assert out["lr"].shape == (2, 8, 8, 3)
    assert [b.shape[1] for b in out["bic"]] == [8, 16, 32, 64]
    assert len(out["blur_pyramid"]) == 4
    # normalized domain
    assert float(np.asarray(out["pyramid"][-1]).min()) >= -1.0 - 1e-5
    assert float(np.asarray(out["pyramid"][-1]).max()) <= 1.0 + 1e-5


@needs_ref
def test_resize_close_to_pil():
    """Antialiased jax resize vs PIL (the reference's preprocessing)."""
    from PIL import Image

    from tgsr_tpu.ops.image import resize

    img = Image.open(os.path.join(REF, "data/face/000155.png")).convert("RGB")
    arr = np.asarray(img, np.float32)[None]
    for size, method, pil_m in [((32, 32), "bilinear", Image.BILINEAR),
                                ((128, 128), "cubic", Image.BICUBIC)]:
        ref = np.asarray(img.resize(size, pil_m), np.float32)
        got = np.asarray(resize(arr, size, method))[0]
        err = np.abs(ref - got).mean()
        assert err < 1.5, f"{method} mean abs err {err} (0-255 scale)"


@needs_ref
def test_example_sr_dataset_with_real_pickle(tmp_path):
    from tgsr_tpu.data.datasets import TextExampleSRDataset, prepare_batch

    # stage a data dir with the one real image
    import shutil

    (tmp_path / "Img" / "changetxt_im1").mkdir(parents=True)
    shutil.copy(os.path.join(REF, "data/face/000155.png"),
                tmp_path / "Img" / "changetxt_im1" / "000155.png")
    ds = TextExampleSRDataset(
        str(tmp_path),
        os.path.join(REF, "data/face/testset.pickle"),
        imsize=256,
    )
    assert ds.n_words == 41
    ex = ds.__getitem__(0, sent_ix=0)
    assert ex.hr.shape == (256, 256, 3)
    assert ex.length > 0
    batch = prepare_batch([ex])
    assert batch["captions"].shape == (1, 18)


def test_face_sentence_captions(tmp_path):
    """load_caps variant (datasets.py:1002-1026): caps.txt sentences."""
    from tgsr_tpu.data.datasets import TextFaceDataset

    (tmp_path / "caps.txt").write_text(
        "000155 x\tA young woman, smiling.|She wears  lipstick\n"
        "000249 x\tA man with a beard.\n")
    caps, names = TextFaceDataset.load_sentence_captions(str(tmp_path))
    # = reference name rule: first 7 chars + 'png' (datasets.py:1011)
    assert names == ["000155 png", "000249 png"]
    assert len(caps) == 10  # 5 per image, cycled
    assert caps[0] == ["a", "young", "woman", "smiling"]
    # faithful quirks (datasets.py:1014-1016): exactly ONE trailing char
    # is chopped — here the final letter 'k' (no period) — and the double
    # space yields an ''-word that enters the vocab
    assert caps[1] == ["she", "wears", "", "lipstic"]
    assert caps[2] == caps[0]  # cycling, no re-chop
    assert caps[3] == caps[1]
    assert caps[5] == ["a", "man", "with", "a", "beard"]


def test_batch_loader_worker_error_propagates():
    """A decode error in the worker thread must surface in the consumer,
    not deadlock the epoch() loop (round-2 review finding)."""
    import pytest as _pytest

    from tgsr_tpu.data.pipeline import BatchLoader

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i, rng=None, sent_ix=None):
            raise IOError(f"corrupt image {i}")

    loader = BatchLoader(Broken(), batch_size=2, shuffle=False)
    with _pytest.raises(IOError, match="corrupt image"):
        next(iter(loader.epoch(0)))


def test_batch_loader_abandoned_generator_releases_worker():
    """Breaking out of epoch() early (eval loops) must not leave the worker
    blocked on q.put forever (round-2 review finding)."""
    import threading
    import time

    from tgsr_tpu.data.datasets import Example
    from tgsr_tpu.data.pipeline import BatchLoader

    class Tiny:
        def __len__(self):
            return 64

        def __getitem__(self, i, rng=None, sent_ix=None):
            return Example(hr=np.zeros((8, 8, 3), np.uint8),
                           tokens=np.zeros((18,), np.int32),
                           length=1, class_id=0, key=str(i))

    n0 = threading.active_count()
    for _ in range(5):
        gen = BatchLoader(Tiny(), batch_size=2, shuffle=False,
                          prefetch=1).epoch(0)
        next(gen)
        gen.close()  # abandon after one batch
    deadline = time.time() + 5.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0 + 1, (
        f"{threading.active_count() - n0} leaked worker threads")
