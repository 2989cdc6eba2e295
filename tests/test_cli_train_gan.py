"""End-to-end smoke of the GAN training CLI (cli/train_gan) on CPU.

Drives the full stack the CLI wires together -- TextFaceDataset over a
synthetic CelebA-format fixture, BatchLoader, on-device preprocess,
GANTrainer, msgpack snapshots, orbax checkpoints -- for one tiny epoch,
then resumes from the checkpoint (the --resume path).
"""

import os

import numpy as np
import pytest


@pytest.fixture()
def face_fixture(tmp_path):
    """Synthetic CelebA attr table + noise images (tests.conftest builder;
    4 train / 2 test via the Blurry attr)."""
    from tests.conftest import make_celeba_fixture

    make_celeba_fixture(tmp_path, n_train=4, n_test=2, img_size=64)
    cfg = tmp_path / "train_face.yml"
    cfg.write_text(
        "CONFIG_NAME: 'smoke'\n"
        "DATASET_NAME: 'face'\n"
        f"DATA_DIR: '{tmp_path}'\n"
        "TREE:\n    BRANCH_NUM: 4\n    BASE_SIZE: 8\n"
        "GAN:\n    GF_DIM: 16\n    DF_DIM: 16\n"
        "TRAIN:\n    FLAG: True\n    BATCH_SIZE: 2\n    MAX_EPOCH: 1\n"
        "    SNAPSHOT_INTERVAL: 1\n"
    )
    return tmp_path, cfg


@pytest.mark.slow
def test_train_gan_cli_end_to_end_and_resume(face_fixture, tmp_path):
    data_dir, cfg = face_fixture
    out = tmp_path / "out"

    from tgsr_tpu.cli.train_gan import main

    main(["--cfg", str(cfg), "--data_dir", str(data_dir),
          "--out_dir", str(out), "--epochs", "1", "--log_every", "1",
          "--eval_every", "1"])

    model_dir = out / "Model"
    snaps = sorted(os.listdir(model_dir))
    assert any("netG" in s for s in snaps), snaps
    assert any("netGH" in s for s in snaps), snaps
    assert (out / "Log").exists()
    # --eval_every logged EMA validation quality on the test split
    import json

    rows = [json.loads(l)
            for l in open(out / "Log" / "metrics.jsonl")]
    vals = [r["val_psnr_y"] for r in rows if "val_psnr_y" in r]
    assert len(vals) == 2 and all(np.isfinite(v) for v in vals), rows
    assert all(-1 <= r["val_ssim_y"] <= 1 for r in rows
               if "val_ssim_y" in r)  # SSIM range (can be ~0 at init)
    from tgsr_tpu.checkpoints.orbax_io import latest_step

    first = latest_step(str(out / "ckpt"))
    assert first and first >= 2  # 4 images / batch 2 = 2 steps

    # resume: second invocation continues from the saved step to the new
    # TOTAL epoch count (--epochs is total training length, so resuming
    # with the same --epochs 1 would correctly be a no-op)
    main(["--cfg", str(cfg), "--data_dir", str(data_dir),
          "--out_dir", str(out), "--epochs", "2", "--log_every", "1",
          "--resume"])
    assert latest_step(str(out / "ckpt")) >= first + 2


@pytest.mark.slow
def test_train_gan_cli_resume_exact_equivalence(face_fixture, tmp_path):
    """--resume continues the EXACT uninterrupted run: same data order
    (deterministic loader + batch skip) and same rng stream
    (fast-forwarded), so interrupted+resumed final weights match the
    uninterrupted run's — at an epoch boundary AND mid-epoch."""
    import shutil

    import jax

    from tgsr_tpu.checkpoints.io import load_variables
    from tgsr_tpu.cli.train_gan import main

    data_dir, cfg = face_fixture
    base = ["--cfg", str(cfg), "--data_dir", str(data_dir),
            "--log_every", "1"]

    def final_snap(out):
        # 4 images / batch 2 = 2 steps/epoch; 2 epochs -> netG_it4
        return load_variables(str(out / "Model" / "netG_it4.msgpack"))

    def assert_tree_equal(a, b):
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7),
            a, b)

    # A: 2 epochs uninterrupted
    out_a = tmp_path / "a"
    main(base + ["--out_dir", str(out_a), "--epochs", "2"])

    # B: 1 epoch, then resume to the same total (epoch-boundary resume)
    out_b = tmp_path / "b"
    main(base + ["--out_dir", str(out_b), "--epochs", "1"])
    main(base + ["--out_dir", str(out_b), "--epochs", "2", "--resume"])
    assert_tree_equal(final_snap(out_a), final_snap(out_b))

    # C: mid-epoch resume -- restore from step 3 (epoch 1, batch 1); only
    # step 4 should run, on the SAME batch + rng the uninterrupted run
    # used (the skipped batch replays through the loader, not the device)
    out_c = tmp_path / "c"
    shutil.copytree(out_a / "ckpt", out_c / "ckpt")
    shutil.rmtree(out_c / "ckpt" / "4")
    from tgsr_tpu.checkpoints.orbax_io import latest_step

    assert latest_step(str(out_c / "ckpt")) == 3
    main(base + ["--out_dir", str(out_c), "--epochs", "2", "--resume"])
    assert_tree_equal(final_snap(out_a), final_snap(out_c))
    # exactly one snapshot was written by the resumed leg (step 4 only)
    snaps_c = sorted(p for p in os.listdir(out_c / "Model") if "netG_" in p)
    assert snaps_c == ["netG_it4.msgpack"], snaps_c


@pytest.mark.slow
def test_train_gan_cli_warm_start_from_reference(face_fixture, tmp_path):
    """--init_netg loads the REAL face_S8 checkpoints into the trainer
    (finetune workflow; = the reference's cfg.TRAIN.NET_G resume
    convention). Conv trees are size-agnostic, so the 8px smoke geometry
    accepts the 32px-trained weights as long as GF_DIM matches."""
    REF = "/root/reference/Checkpoint/face_S8/netG_epoch_7.pth"
    if not os.path.exists(REF):
        pytest.skip("reference checkpoints not mounted")
    data_dir, _ = face_fixture
    cfg = data_dir / "train_face32.yml"
    cfg.write_text(
        "CONFIG_NAME: 'warm'\n"
        "DATASET_NAME: 'face'\n"
        f"DATA_DIR: '{data_dir}'\n"
        "TREE:\n    BRANCH_NUM: 4\n    BASE_SIZE: 8\n"
        "GAN:\n    GF_DIM: 32\n    DF_DIM: 16\n"
        "TRAIN:\n    FLAG: True\n    BATCH_SIZE: 2\n    MAX_EPOCH: 1\n"
        "    SNAPSHOT_INTERVAL: 1\n"
    )
    out = tmp_path / "warm_out"

    from tgsr_tpu.checkpoints.convert_torch import (convert_netg_low,
                                                    load_torch_state_dict)
    from tgsr_tpu.checkpoints.io import load_variables
    from tgsr_tpu.cli.train_gan import main

    main(["--cfg", str(cfg), "--data_dir", str(data_dir),
          "--out_dir", str(out), "--epochs", "1", "--log_every", "1",
          "--init_netg", REF])

    # the run's first snapshot must carry the reference weights, not a
    # random init: compare one conv kernel (trained for 1 epoch of 2
    # steps -> within an lr-scale distance of the loaded values)
    ref_k = np.asarray(convert_netg_low(load_torch_state_dict(REF))
                       ["params"]["h_net1"]["residual_0"]["conv1"]["kernel"])
    snaps = sorted(p for p in os.listdir(out / "Model") if "netG_" in p)
    got = load_variables(str(out / "Model" / snaps[-1]))
    got_k = np.asarray(got["params"]["h_net1"]["residual_0"]["conv1"]
                       ["kernel"])
    assert np.abs(got_k - ref_k).max() < 0.05, "warm start not applied"

    with pytest.raises(SystemExit):
        main(["--cfg", str(cfg), "--data_dir", str(data_dir),
              "--out_dir", str(out), "--init_netg", "/nonexistent.pth"])


@pytest.mark.slow
def test_train_gan_cli_nan_abort(face_fixture, tmp_path):
    """Failure detection: a diverging run (absurd lr) must abort with a
    clear message pointing at the last periodic checkpoint instead of
    training garbage."""
    data_dir, _ = face_fixture
    cfg = data_dir / "train_nan.yml"
    cfg.write_text(
        "CONFIG_NAME: 'nan'\n"
        "DATASET_NAME: 'face'\n"
        f"DATA_DIR: '{data_dir}'\n"
        "TREE:\n    BRANCH_NUM: 4\n    BASE_SIZE: 8\n"
        "GAN:\n    GF_DIM: 16\n    DF_DIM: 16\n"
        "TRAIN:\n    FLAG: True\n    BATCH_SIZE: 2\n    MAX_EPOCH: 50\n"
        "    SNAPSHOT_INTERVAL: 1000\n"
        "    GENERATOR_LR: 1000000.0\n"
        "    DISCRIMINATOR_LR: 1000000.0\n"
    )
    from tgsr_tpu.cli.train_gan import main

    with pytest.raises(SystemExit) as e:
        main(["--cfg", str(cfg), "--data_dir", str(data_dir),
              "--out_dir", str(tmp_path / "nan_out"), "--epochs", "50",
              "--log_every", "1000", "--nan_check_every", "1"])
    assert "NaN/Inf" in str(e.value)


@pytest.mark.slow
def test_train_gan_cli_mesh_fsdp(face_fixture, tmp_path):
    """--mesh 2x1 --fsdp: the CLI trains DP-sharded with FSDP state
    storage, checkpoints, and resumes back into the same layout (the
    resume template carries the FSDP shardings)."""
    data_dir, cfg = face_fixture
    out = tmp_path / "out_mesh"
    from tgsr_tpu.cli.train_gan import main

    main(["--cfg", str(cfg), "--data_dir", str(data_dir),
          "--out_dir", str(out), "--epochs", "1", "--log_every", "1",
          "--mesh", "2x1", "--fsdp", "--eval_every", "2"])
    from tgsr_tpu.checkpoints.orbax_io import latest_step

    first = latest_step(str(out / "ckpt"))
    assert first and first >= 2

    main(["--cfg", str(cfg), "--data_dir", str(data_dir),
          "--out_dir", str(out), "--epochs", "2", "--log_every", "1",
          "--mesh", "2x1", "--fsdp", "--resume"])
    assert latest_step(str(out / "ckpt")) >= first + 2

    # arg validation: --fsdp without --mesh, malformed --mesh, indivisible
    # batch all fail fast
    import pytest

    for bad in (["--fsdp"], ["--mesh", "nope"], ["--mesh", "3x1"]):
        with pytest.raises(SystemExit):
            main(["--cfg", str(cfg), "--data_dir", str(data_dir),
                  "--out_dir", str(tmp_path / "bad")] + bad)
