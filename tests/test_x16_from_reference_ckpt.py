"""from_reference_checkpoints is family-aware: a BRANCH_NUM=5 config must
route .pth files through the models16 converters (the reference ships no
x16 checkpoint, but user-trained ones follow the same state-dict layout —
models16.py:5-179)."""

import dataclasses
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_oracle import load_reference  # noqa: E402
from tgsr_tpu.config import Config  # noqa: E402
from tgsr_tpu.engine.inference import SRPipeline  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted")


@pytest.mark.slow
def test_x16_pipeline_from_torch_checkpoints(tmp_path):
    load_reference()
    import models16

    torch.manual_seed(7)
    netg = models16.G_SR_NET_low()
    netgh = models16.NetG_highweight()
    netg_path = tmp_path / "netG_epoch_1.pth"
    torch.save(netg.state_dict(), str(netg_path))
    torch.save(netgh.state_dict(), str(tmp_path / "netGH_epoch_1.pth"))

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, METHOD="S16",
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=5, BASE_SIZE=32),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=32))
    pipe = SRPipeline.from_reference_checkpoints(cfg, 41, str(netg_path))

    rng = np.random.default_rng(0)
    lr = rng.normal(0, 0.3, (1, 32, 32, 3)).astype(np.float32)
    caps = np.zeros((1, 18), np.int32)
    caps[0, :4] = [1, 2, 3, 4]
    out = pipe.sr_uint8(lr, caps, np.asarray([4], np.int32))
    assert out.shape == (1, 512, 512, 3)  # x16: 32 -> 512
