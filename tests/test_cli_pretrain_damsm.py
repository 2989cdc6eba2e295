"""End-to-end CPU smoke of the DAMSM pretraining CLI (cli/pretrain_damsm):
synthetic CelebA-format fixture, one epoch with the SimpleCNN backbone,
snapshots + attention-grid dump per the reference protocol."""

import glob
import os

import numpy as np
import pytest


@pytest.fixture()
def face_fixture(tmp_path):
    from tests.conftest import make_celeba_fixture

    make_celeba_fixture(tmp_path, n_train=4, n_test=2, img_size=48)
    cfg = tmp_path / "damsm_face.yml"
    cfg.write_text(
        "CONFIG_NAME: 'smoke'\n"
        "DATASET_NAME: 'face'\n"
        f"DATA_DIR: '{tmp_path}'\n"
        "TREE:\n    BRANCH_NUM: 1\n    BASE_SIZE: 32\n"
        "TRAIN:\n    FLAG: True\n    BATCH_SIZE: 2\n    MAX_EPOCH: 1\n"
        "    SNAPSHOT_INTERVAL: 1\n"
    )
    return tmp_path, cfg


def test_pretrain_damsm_cli_end_to_end(face_fixture, tmp_path):
    data_dir, cfg = face_fixture
    out = tmp_path / "out"

    from tgsr_tpu.cli.pretrain_damsm import main

    main(["--cfg", str(cfg), "--data_dir", str(data_dir),
          "--out_dir", str(out), "--epochs", "1", "--simple-cnn"])

    runs = glob.glob(str(out / "face_DAMSM_*"))
    assert len(runs) == 1
    model_dir = os.path.join(runs[0], "Model")
    snaps = sorted(os.listdir(model_dir))
    assert any(s.startswith("text_encoder") for s in snaps), snaps
    assert any(s.startswith("image_encoder") for s in snaps), snaps


@pytest.mark.slow
def test_pretrain_damsm_cli_resume_matches_uninterrupted(face_fixture,
                                                         tmp_path):
    """--resume_from text_encoder<N> continues at epoch N+1 (the
    reference's NET_E convention, pretrain_DAMSM.py:177-185) and is EXACT:
    per-epoch optimizer reset + deterministic loader + fast-forwarded
    dropout rng make the resumed epoch-1 weights equal the uninterrupted
    run's."""
    import jax
    import numpy as np

    from tgsr_tpu.checkpoints.io import load_variables
    from tgsr_tpu.cli.pretrain_damsm import main

    data_dir, cfg = face_fixture

    def run_dir(out):
        runs = glob.glob(str(out / "face_DAMSM_*"))
        assert len(runs) == 1
        return runs[0]

    base = ["--cfg", str(cfg), "--data_dir", str(data_dir), "--simple-cnn"]

    out_a = tmp_path / "a"
    main(base + ["--out_dir", str(out_a), "--epochs", "2"])
    snap_a = load_variables(
        os.path.join(run_dir(out_a), "Model", "text_encoder1.msgpack"))

    out_b = tmp_path / "b"
    main(base + ["--out_dir", str(out_b), "--epochs", "1"])
    resume = os.path.join(run_dir(out_b), "Model", "text_encoder0.msgpack")
    out_c = tmp_path / "c"
    main(base + ["--out_dir", str(out_c), "--epochs", "2",
                 "--resume_from", resume])
    snap_c = load_variables(
        os.path.join(run_dir(out_c), "Model", "text_encoder1.msgpack"))

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        snap_a, snap_c)

    # encoder pairing substitutes in the BASENAME only: a directory
    # component containing 'text_encoder' must not be rewritten when
    # resolving the paired image-encoder path (a silent text-only resume)
    import shutil

    sweep = tmp_path / "text_encoder_sweep"
    sweep.mkdir()
    for n in ("text_encoder0.msgpack", "image_encoder0.msgpack"):
        shutil.copy(os.path.join(run_dir(out_b), "Model", n),
                    str(sweep / n))
    out_d = tmp_path / "d"
    main(base + ["--out_dir", str(out_d), "--epochs", "2",
                 "--resume_from", str(sweep / "text_encoder0.msgpack")])
    snap_d = load_variables(
        os.path.join(run_dir(out_d), "Model", "text_encoder1.msgpack"))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        snap_a, snap_d)

    # malformed snapshot name fails fast
    import pytest

    with pytest.raises(SystemExit, match="resume_from"):
        main(base + ["--out_dir", str(tmp_path / "x"),
                     "--resume_from", "weights.msgpack"])


@pytest.mark.slow
def test_pretrain_damsm_cli_mesh_dp(face_fixture, tmp_path):
    """--mesh 2x1 runs the same epoch data-parallel (8 virtual CPU
    devices from conftest); snapshots still land."""
    data_dir, cfg = face_fixture
    out = tmp_path / "out_mesh"

    from tgsr_tpu.cli.pretrain_damsm import main

    main(["--cfg", str(cfg), "--data_dir", str(data_dir),
          "--out_dir", str(out), "--epochs", "1", "--simple-cnn",
          "--mesh", "2x1"])

    runs = glob.glob(str(out / "face_DAMSM_*"))
    assert len(runs) == 1
    snaps = sorted(os.listdir(os.path.join(runs[0], "Model")))
    assert any(s.startswith("text_encoder") for s in snaps), snaps


def test_pretrain_damsm_cli_mesh_validation(face_fixture, tmp_path):
    """Bad --mesh values fail at argparse time with actionable messages."""
    import pytest

    data_dir, cfg = face_fixture
    from tgsr_tpu.cli.pretrain_damsm import main

    for bad in ("2x2",      # DAMSM has no model axis
                "3x1",      # BATCH_SIZE=2 not divisible by 3
                "banana"):  # unparseable
        with pytest.raises(SystemExit):
            main(["--cfg", str(cfg), "--data_dir", str(data_dir),
                  "--out_dir", str(tmp_path / "x"), "--epochs", "1",
                  "--simple-cnn", "--mesh", bad])


def test_resume_encoder_family_mismatch_refused():
    """A family-mismatched --resume_from image encoder must refuse loudly:
    the resume merge is a dict union (keeps initialized heads for bare zoo
    backbones), so Inception params over a SimpleCNN run (or vice versa)
    would silently build a union tree matching neither the model nor the
    optimizer state."""
    import pytest

    from tgsr_tpu.cli.pretrain_damsm import check_encoder_family

    inception = {"inception": {}, "emb_features": {}}
    simple = {"conv0": {}, "emb_features": {}}
    check_encoder_family(inception, inception, "x")   # matched: fine
    check_encoder_family(simple, simple, "x")
    with pytest.raises(SystemExit, match="pass --simple-cnn"):
        check_encoder_family(simple, inception, "img0.msgpack")
    with pytest.raises(SystemExit, match="drop --simple-cnn"):
        check_encoder_family(inception, simple, "img0.msgpack")
