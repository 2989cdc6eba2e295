"""End-to-end smoke of the GAN training CLI (cli/train_gan) on CPU.

Drives the full stack the CLI wires together -- TextFaceDataset over a
synthetic CelebA-format fixture, BatchLoader, on-device preprocess,
GANTrainer, msgpack snapshots, orbax checkpoints -- for one tiny epoch,
then resumes from the checkpoint (the --resume path).
"""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def face_fixture(tmp_path):
    """Synthetic CelebA attr table + noise images (constant images NaN
    through train-mode BN -- CLAUDE.md trap)."""
    attrs = ["Attractive", "Young", "Smiling", "Male", "BlackHair",
             "BlondHair", "Eyeglasses", "Bangs", "BigLips", "BigNose",
             "Blurry", "Chubby"]
    rng = np.random.RandomState(0)
    rows = [" ".join(attrs) + " "]
    img_dir = tmp_path / "Img"
    img_dir.mkdir()
    for i in range(4):
        vals = ["1" if rng.rand() < 0.5 else "0" for _ in attrs]
        vals[10] = "0"  # attr[11] == Blurry: 0 -> train split
        vals[0] = "1"    # at least one positive attribute (caption nonempty)
        rows.append(f"{i:06d}.jpg " + " ".join(vals))
        im = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(im).save(img_dir / f"{i:06d}.png")
    (tmp_path / "list_attr_celeba.txt").write_text("\n".join(rows) + "\n")

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


def test_train_gan_cli_end_to_end_and_resume(face_fixture, tmp_path):
    data_dir, cfg = face_fixture
    out = tmp_path / "out"

    from tgsr_tpu.cli.train_gan import main

    main(["--cfg", str(cfg), "--data_dir", str(data_dir),
          "--out_dir", str(out), "--epochs", "1", "--log_every", "1"])

    model_dir = out / "Model"
    snaps = sorted(os.listdir(model_dir))
    assert any("netG" in s for s in snaps), snaps
    assert any("netGH" in s for s in snaps), snaps
    assert (out / "Log").exists()
    from tgsr_tpu.checkpoints.orbax_io import latest_step

    first = latest_step(str(out / "ckpt"))
    assert first and first >= 2  # 4 images / batch 2 = 2 steps

    # resume: second invocation continues from the saved step
    main(["--cfg", str(cfg), "--data_dir", str(data_dir),
          "--out_dir", str(out), "--epochs", "1", "--log_every", "1",
          "--resume"])
    assert latest_step(str(out / "ckpt")) >= first + 2
