"""tgsr-calibrate: robust multi-batch int8 calibration CLI.

End-to-end on the real reference snapshot (CPU): calibrate scales for the
face_S8 checkpoints, verify the artifact feeds cli.test --scales, and that
the fidelity gate refuses to write an artifact it cannot vouch for."""

import json
import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not mounted")


def test_augmented_lr_batch_contract():
    from tgsr_tpu.cli.calibrate import augmented_lr_batch

    rng = np.random.default_rng(0)
    hr = (np.random.default_rng(1).random((3, 70, 60, 3)) * 255
          ).astype(np.uint8)
    lr = augmented_lr_batch(hr, 32, rng)
    assert lr.shape == (3, 32, 32, 3) and lr.dtype == np.float32
    assert lr.min() >= -1.0 and lr.max() <= 1.0
    # different rng draws -> genuinely varied views
    lr2 = augmented_lr_batch(hr, 32, rng)
    assert np.abs(lr - lr2).max() > 1e-3


@pytest.mark.slow
def test_calibrate_cli_end_to_end(tmp_path):
    from tgsr_tpu.cli.calibrate import main as calibrate_main
    from tgsr_tpu.cli.test import main as eval_main

    scales_path = tmp_path / "face_scales.json"
    calibrate_main([
        "--cfg", os.path.join(REF, "cfg/eval_faceSR_attn2.yml"),
        "--data_dir", os.path.join(REF, "data/face"),
        "--ckpt_dir", os.path.join(REF, "Checkpoint/face_S8"),
        "--out", str(scales_path), "--batch", "2", "--batches", "2",
    ])
    assert scales_path.exists()
    raw = json.loads(scales_path.read_text())
    assert set(raw) == {"netg", "netgh", "_meta"}
    # provenance binds the artifact to the calibrated checkpoint
    # (engine.quant.check_scales refuses it on other weights)
    assert raw["_meta"]["weights_fingerprint"]
    assert raw["_meta"]["checkpoint"] == "netG_epoch_7.pth"
    assert raw["_meta"]["gate_db"] > 30
    scales = {k: v for k, v in raw.items() if k != "_meta"}
    for group in scales.values():
        assert group and all(
            isinstance(v, float) and v > 0 for v in group.values())
    # int8 heads are the shipped default: the image-head convs are scaled
    assert any("img" in k or "conv_output" in k
               for g in scales.values() for k in g)

    # the artifact drives cli.test --scales (no batch-0 recalibration)
    out = tmp_path / "out"
    eval_main(["--cfg", os.path.join(REF, "cfg/eval_faceSR_attn2.yml"),
               "--data_dir", os.path.join(REF, "data/face"),
               "--ckpt_dir", os.path.join(REF, "Checkpoint/face_S8"),
               "--out_dir", str(out), "--batch", "1",
               "--scales", str(scales_path)])
    from PIL import Image

    sr = np.asarray(Image.open(out / "testset" / "000155_SR.png"))
    assert sr.shape == (256, 256, 3) and sr.std() > 10


@pytest.mark.slow
def test_calibrate_gate_refuses_to_write(tmp_path):
    from tgsr_tpu.cli.calibrate import main as calibrate_main

    scales_path = tmp_path / "never.json"
    with pytest.raises(SystemExit, match="fidelity gate failed"):
        calibrate_main([
            "--cfg", os.path.join(REF, "cfg/eval_faceSR_attn2.yml"),
            "--data_dir", os.path.join(REF, "data/face"),
            "--ckpt_dir", os.path.join(REF, "Checkpoint/face_S8"),
            "--out", str(scales_path), "--batch", "1", "--batches", "1",
            "--gate_db", "1000",
        ])
    assert not scales_path.exists()
