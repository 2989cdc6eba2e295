"""North-star e2e quality: BOTH full pipelines (text encoder included) on
the real test image + real testset caption, PSNR-Y/SSIM side by side.

= the gen_exampleSRHL protocol (trainer_objective.py:55-165) with metrics per
trainer_objective.py:168-181 (BT.601 rgb2y, uint8 PSNR). The reference ships
no NET_E text-encoder weights, so a seeded random-init torch RNN_ENCODER is
converted into the jax pipeline -- the SAME weights drive both sides, making
this an end-to-end equivalence statement:

    |PSNR_Y(ref SR, GT) - PSNR_Y(tgsr SR, GT)| <= 0.1 dB  (BASELINE.md bar)
    SR-vs-SR PSNR-Y >= 40 dB, SSIM delta <= 1e-3

Numbers are printed so the driver log records them.
"""

import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.reference_oracle import load_reference  # noqa: E402

CKPT_G = "/root/reference/Checkpoint/face_S8/netG_epoch_7.pth"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT_G), reason="reference checkpoints not mounted"
)


def _rgb2y_uint8(rgb):
    """= trainer_objective.py:168-174 (BT.601 Y, uint8 rounding)."""
    rgb = np.float32(rgb) / 255.0
    y = (rgb * (np.reshape([65.481, 128.553, 24.966], [1, 1, 3]) / 255.0)).sum(-1)
    return np.uint8((y + 16 / 255.0) * 255 + 0.5)


def _psnr(im1, im2):
    """= trainer_objective.py:177-181."""
    diff = np.float64(im1) - np.float64(im2)
    rmse = np.sqrt(np.mean(diff ** 2))
    return 20 * np.log10(255.0 / rmse)


def test_e2e_quality_parity():
    ref = load_reference()
    model, util = ref["model"], ref["util"]
    from PIL import Image

    with open("/root/reference/data/face/testset.pickle", "rb") as f:
        caps, ixtoword, _ = pickle.load(f)
    vocab = len(ixtoword)

    img = Image.open("/root/reference/data/face/000155.png").convert("RGB")
    gt = np.asarray(img.resize((256, 256), Image.BICUBIC))
    lr = np.asarray(img.resize((32, 32), Image.BICUBIC), np.float32) / 127.5 - 1

    T = 18
    L = min(len(caps[0]), T)
    tok = np.zeros((1, T), np.int64)
    tok[0, :L] = caps[0][:L]
    lens = np.asarray([L], np.int64)

    # ---- torch reference pipeline (gen_exampleSRHL compute path) ----
    torch.manual_seed(55)
    text_enc = util.RNN_ENCODER(vocab, nhidden=256)
    text_enc.eval()
    netGL = model.G_SR_NET_low()
    netGL.load_state_dict(torch.load(CKPT_G, map_location="cpu",
                                     weights_only=True), strict=True)
    netGL.eval()
    netGH = model.NetG_highweight(weightmap=False, low="lr")
    netGH.load_state_dict(
        torch.load(CKPT_G.replace("netG", "netGH"), map_location="cpu",
                   weights_only=True), strict=False)
    netGH.eval()

    captions_t = torch.from_numpy(tok)
    lens_t = torch.from_numpy(lens)
    lr_t = torch.from_numpy(lr.transpose(2, 0, 1))[None]
    with torch.no_grad():
        hidden = text_enc.init_hidden(1)
        words_t, sent_t = text_enc(captions_t, lens_t, hidden)
        mask_t = (captions_t == 0)[:, : words_t.size(2)]
        fake_t, _, _, _ = netGL(lr_t, sent_t, words_t, mask_t)
        fine_t, _, _ = netGH(lr_t, fake_t, lr_t)
    sr_ref = np.round(np.clip(
        (fine_t[-1][0].numpy().transpose(1, 2, 0) + 1) * 127.5, 0, 255)
    ).astype(np.uint8)

    # ---- tgsr_tpu pipeline with the SAME converted weights ----
    from tgsr_tpu.checkpoints.convert_torch import convert_text_encoder
    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.engine.inference import SRPipeline

    cfg = config_from_file("/root/reference/cfg/eval_faceSR_attn2.yml")
    pipe = SRPipeline.from_reference_checkpoints(cfg, vocab, CKPT_G)
    pipe.variables["text"] = convert_text_encoder(
        {k: v.numpy() for k, v in text_enc.state_dict().items()})
    sr_tpu = pipe.sr_uint8(lr[None], tok.astype(np.int32),
                           lens.astype(np.int32))[0]

    # ---- metrics (reference protocol) ----
    from tgsr_tpu.ops.image import ssim

    y_ref, y_tpu, y_gt = map(_rgb2y_uint8, (sr_ref, sr_tpu, gt))
    psnr_ref_gt = _psnr(y_ref, y_gt)
    psnr_tpu_gt = _psnr(y_tpu, y_gt)
    psnr_cross = _psnr(y_ref, y_tpu)
    ssim_ref_gt = float(ssim(
        jnp.asarray(y_ref, jnp.float32)[None, ..., None],
        jnp.asarray(y_gt, jnp.float32)[None, ..., None])[0])
    ssim_tpu_gt = float(ssim(
        jnp.asarray(y_tpu, jnp.float32)[None, ..., None],
        jnp.asarray(y_gt, jnp.float32)[None, ..., None])[0])

    print(f"\nE2E quality (000155.png, real caption, seeded NET_E):"
          f"\n  reference: PSNR-Y {psnr_ref_gt:.3f} dB, SSIM {ssim_ref_gt:.4f}"
          f"\n  tgsr_tpu : PSNR-Y {psnr_tpu_gt:.3f} dB, SSIM {ssim_tpu_gt:.4f}"
          f"\n  SR-vs-SR : PSNR-Y {psnr_cross:.2f} dB")

    assert abs(psnr_ref_gt - psnr_tpu_gt) <= 0.1, (
        f"quality delta {abs(psnr_ref_gt - psnr_tpu_gt):.3f} dB > 0.1")
    assert abs(ssim_ref_gt - ssim_tpu_gt) <= 1e-3
    assert psnr_cross >= 40.0, f"cross PSNR {psnr_cross:.2f} < 40"

    # ---- int8 serving mode under the SAME protocol (backs the bench's
    # quality gate: the quantized pipeline must stay within the 0.1 dB
    # north-star bar of the torch reference) ----
    scales = pipe.calibrate_quant(lr[None], tok.astype(np.int32),
                                  lens.astype(np.int32))
    qpipe = SRPipeline(cfg, vocab, pipe.variables["text"],
                       pipe.variables["netg"], pipe.variables["netgh"],
                       quant_scales=scales)
    sr_q = qpipe.sr_uint8(lr[None], tok.astype(np.int32),
                          lens.astype(np.int32))[0]
    psnr_q_gt = _psnr(_rgb2y_uint8(sr_q), y_gt)
    print(f"  int8     : PSNR-Y {psnr_q_gt:.3f} dB "
          f"(delta {abs(psnr_ref_gt - psnr_q_gt):.3f})")
    assert abs(psnr_ref_gt - psnr_q_gt) <= 0.1, (
        f"int8 quality delta {abs(psnr_ref_gt - psnr_q_gt):.3f} dB > 0.1")
