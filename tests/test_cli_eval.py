"""End-to-end CPU smoke of the eval CLI (cli/test = the reference's
test1.py protocol) against the real reference snapshot: loads the shipped
checkpoints, evaluates the present test image, writes <key>_SR.png plus an
attention grid."""

import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not mounted")


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path):
    from PIL import Image

    from tgsr_tpu.cli.test import main

    out = tmp_path / "out"
    bundle = tmp_path / "bundle"
    main(["--cfg", os.path.join(REF, "cfg/eval_faceSR_attn2.yml"),
          "--data_dir", os.path.join(REF, "data/face"),
          "--ckpt_dir", os.path.join(REF, "Checkpoint/face_S8"),
          "--out_dir", str(out), "--batch", "1",
          "--save_artifact", str(bundle)])

    sr_path = out / "testset" / "000155_SR.png"
    assert sr_path.exists()
    sr = np.asarray(Image.open(sr_path))
    assert sr.shape == (256, 256, 3)
    assert sr.std() > 10  # a real image, not a constant
    att = list((out / "testset" / "att").glob("*.png"))
    assert att, "attention grid not written"

    # --save_artifact produced a loadable deployment bundle with the vocab
    from tgsr_tpu.engine.inference import SRPipeline

    pipe, vocab = SRPipeline.load_artifact(str(bundle))
    assert vocab is not None and vocab.n_words > 1
    assert pipe.cfg.scale == 8
