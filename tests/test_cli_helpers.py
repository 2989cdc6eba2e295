"""CLI helper coverage: gen_example_pickle roundtrip + TextSRGTDataset."""

import os
import pickle

import numpy as np
import pytest

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference not mounted")


@needs_ref
def test_gen_example_pickle_face(tmp_path):
    from tgsr_tpu.cli.test import gen_example_pickle
    from tgsr_tpu.data.tokenizer import Vocab

    # stage a data dir with the real attr table
    src = open(os.path.join(REF, "data/face/testset.txt")).read()
    (tmp_path / "testset.txt").write_text(src)

    with open(os.path.join(REF, "data/face/testset.pickle"), "rb") as f:
        _, ixtoword, wordtoix = pickle.load(f)
    vocab = Vocab(ixtoword, wordtoix)

    out = gen_example_pickle(str(tmp_path), vocab, dataset="face")
    with open(out, "rb") as f:
        caps, ix2w, w2ix = pickle.load(f)
    assert len(caps) == 21
    assert w2ix == wordtoix
    # every produced caption decodes to valid attribute names
    for c in caps:
        assert all(t in ixtoword for t in c)
        assert len(c) > 0
    # idempotent: existing pickle is reused
    assert gen_example_pickle(str(tmp_path), vocab, dataset="face") == out


@needs_ref
def test_srgt_dataset_bird_format(tmp_path):
    from tgsr_tpu.data.datasets import TextSRGTDataset
    from tgsr_tpu.data.tokenizer import Vocab, build_dictionary

    _, _, vocab = build_dictionary(
        [["a", "red", "bird"], ["small", "blue", "bird"]], [])
    (tmp_path / "testset.txt").write_text(
        "img1.png|a red bird\nimg2.png|small blue bird\n")
    import shutil

    shutil.copy(os.path.join(REF, "data/face/000155.png"),
                tmp_path / "img1.png")
    shutil.copy(os.path.join(REF, "data/face/000155.png"),
                tmp_path / "img2.png")
    ds = TextSRGTDataset(vocab, str(tmp_path), str(tmp_path),
                         dataset="bird", imsize=128)
    assert len(ds) == 2
    ex = ds.__getitem__(0, sent_ix=0)
    assert ex.hr.shape == (128, 128, 3)
    assert vocab.decode(ex.tokens[: ex.length]) == ["a", "red", "bird"]


def test_rank_r_precision():
    """Matched pairs must rank above mismatched ones on a separable task."""
    import jax
    import jax.numpy as jnp

    from tgsr_tpu.engine.evaluator import rank_r_precision

    N, R, T, E = 6, 4, 5, 8
    k = jax.random.PRNGKey(0)
    # construct correlated image/caption features: shared per-pair basis
    base = jax.random.normal(k, (N, E))
    img_feat = base[:, None, :] + 0.05 * jax.random.normal(
        jax.random.fold_in(k, 1), (N, R, E))
    words = base[:, None, :] + 0.05 * jax.random.normal(
        jax.random.fold_in(k, 2), (N, T, E))
    out = rank_r_precision(img_feat, base, words, base,
                           jnp.full((N,), T, jnp.int32))
    assert out["sent_r@1"] == 1.0
    assert out["word_r@1"] == 1.0
    assert out["n"] == N


def test_parse_mesh_arg():
    from tgsr_tpu.parallel.mesh import parse_mesh_arg

    assert parse_mesh_arg("8x1") == (8, 1)
    assert parse_mesh_arg("4X2") == (4, 2)
    for bad in ("8", "8x1x1", "ax1", "0x1", "8x-1", ""):
        with pytest.raises(ValueError):
            parse_mesh_arg(bad)


def test_fast_forward_key_matches_chained_splits():
    import jax

    from tgsr_tpu.parallel.mesh import fast_forward_key

    for index in (0, 1):
        k = jax.random.PRNGKey(7)
        for _ in range(5):
            k = jax.random.split(k)[index]
        np.testing.assert_array_equal(
            np.asarray(fast_forward_key(jax.random.PRNGKey(7), 5, index)),
            np.asarray(k))
