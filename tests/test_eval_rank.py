"""CPU smoke for the retrieval-ranking CLI (cli/eval_rank.py), the
consumer of TextSRGTDataset (reference datasets.py:1721-1885 — the
reference ships the dataset but no driver for it)."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from tgsr_tpu.cli.eval_rank import load_vocab, main


@pytest.fixture
def fixture_dir(tmp_path):
    words = ["<end>", "a", "bird", "flying", "big", "red", "nose"]
    ix2w = dict(enumerate(words))
    w2ix = {w: i for i, w in ix2w.items()}

    d = tmp_path / "gt"
    imd = tmp_path / "ims"
    d.mkdir()
    imd.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        name = f"im{i}.png"
        Image.fromarray(rng.integers(0, 255, (70, 70, 3), endpoint=True)
                        .astype(np.uint8)).save(str(imd / name))
        lines.append(f"{name}|a {'big red'.split()[i % 2]} bird\n")
    with open(d / "testset.txt", "w") as f:
        f.writelines(lines)
    # testset.pickle layout: [caps, ixtoword, wordtoix] (test1.py:117-120)
    vp = tmp_path / "testset.pickle"
    with open(vp, "wb") as f:
        pickle.dump([[[1, 2]], ix2w, w2ix], f, protocol=2)
    return d, imd, vp


def test_eval_rank_smoke(fixture_dir, tmp_path, capsys):
    d, imd, vp = fixture_dir
    out = tmp_path / "rank.json"
    res = main(["--data_dir", str(d), "--image_dir", str(imd),
                "--vocab_pickle", str(vp), "--dataset", "bird",
                "--simple-cnn", "--imsize", "64", "--batch", "4",
                "--out", str(out)])
    assert res["n"] == 6
    assert set(res["seeded_encoders"]) == {"text", "image"}
    for k in ("word_r@1", "sent_r@1", "word_r@5", "sent_r@5"):
        assert 0.0 <= res[k] <= 1.0, (k, res[k])
    # batch 4 over 6 items exercises the padded tail; the JSON artifact
    # round-trips
    assert json.loads(out.read_text())["n"] == 6
    assert "pipeline smoke" in capsys.readouterr().out


def test_load_vocab_both_layouts(tmp_path):
    ix2w = {0: "<end>", 1: "a"}
    w2ix = {"<end>": 0, "a": 1}
    p1 = tmp_path / "testset.pickle"
    with open(p1, "wb") as f:
        pickle.dump([[[1]], ix2w, w2ix], f)
    p2 = tmp_path / "captions.pickle"
    with open(p2, "wb") as f:
        pickle.dump([[[1]], [[1]], ix2w, w2ix], f)
    # swapped dict order must also resolve (keys disambiguate)
    p3 = tmp_path / "swapped.pickle"
    with open(p3, "wb") as f:
        pickle.dump([[[1]], w2ix, ix2w], f)
    for p in (p1, p2, p3):
        v = load_vocab(str(p))
        assert v.n_words == 2 and v.wordtoix["a"] == 1, p
