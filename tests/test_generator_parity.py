"""End-to-end parity: GSRNetLow + NetGHighWeight with the shipped face_S8
checkpoints vs. the unmodified reference forward (torch CPU oracle).

This is the strongest correctness statement in the suite: identical weights,
identical inputs (the real 000155.png test image + a real testset caption),
outputs must match to float tolerance through ~25 conv layers and 3
attention stages.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tgsr_tpu.checkpoints.convert_torch import (  # noqa: E402
    convert_netg_low,
    convert_netgh_weight,
)
from tgsr_tpu.models.generator import GSRNetLow  # noqa: E402
from tgsr_tpu.models.generator_hf import NetGHighWeight  # noqa: E402
from tests.reference_oracle import load_reference  # noqa: E402

CKPT_G = "/root/reference/Checkpoint/face_S8/netG_epoch_7.pth"
CKPT_GH = "/root/reference/Checkpoint/face_S8/netGH_epoch_7.pth"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT_G), reason="reference checkpoints not mounted"
)


@pytest.fixture(scope="module")
def setup():
    ref = load_reference()
    model = ref["model"]
    sd_g = torch.load(CKPT_G, map_location="cpu", weights_only=True)
    sd_gh = torch.load(CKPT_GH, map_location="cpu", weights_only=True)

    netGL = model.G_SR_NET_low()
    netGL.load_state_dict(sd_g, strict=True)
    netGL.eval()
    netGH = model.NetG_highweight(weightmap=False, low="lr")
    missing, unexpected = netGH.load_state_dict(sd_gh, strict=False)
    assert unexpected == []
    netGH.eval()

    # Real LR input: 000155.png resized to 32x32, normalized to [-1, 1]
    from PIL import Image

    img = Image.open("/root/reference/data/face/000155.png").convert("RGB")
    img = img.resize((32, 32), Image.BILINEAR)
    lr = np.asarray(img, np.float32) / 127.5 - 1.0  # HWC

    # Word embeddings: the DAMSM text-encoder weights are absent from the
    # snapshot, so use fixed random embeddings -- parity only concerns the
    # generators here.
    g = torch.Generator().manual_seed(7)
    T = 14
    words = torch.randn(1, 256, T, generator=g)
    sent = torch.randn(1, 256, generator=g)
    mask = torch.zeros(1, T, dtype=torch.bool)
    mask[0, 10:] = True  # last 4 "words" padded

    return dict(
        netGL=netGL, netGH=netGH, sd_g=sd_g, sd_gh=sd_gh, lr=lr, words=words,
        sent=sent, mask=mask,
    )


def test_full_pipeline_parity(setup):
    s = setup
    lr_t = torch.from_numpy(s["lr"].transpose(2, 0, 1))[None]  # NCHW

    with torch.no_grad():
        fake_imgs, att_maps, mu_t, logvar_t = s["netGL"](
            lr_t, s["sent"], s["words"], s["mask"]
        )
        fine, a, one = s["netGH"](lr_t, fake_imgs, lr_t)

    variables_g = convert_netg_low(s["sd_g"])
    variables_gh = convert_netgh_weight(s["sd_gh"])

    lr_j = jnp.asarray(s["lr"])[None]  # NHWC
    words_j = jnp.asarray(s["words"].numpy().transpose(0, 2, 1))
    sent_j = jnp.asarray(s["sent"].numpy())
    mask_j = jnp.asarray(s["mask"].numpy())

    gl = GSRNetLow(ngf=32, n_stages=3)
    fake_j, att_j, mu_j, logvar_j = gl.apply(
        variables_g, lr_j, sent_j, words_j, mask_j
    )
    gh = NetGHighWeight(ngf=32, weightmap=False, low="lr")
    fine_j, a_j, one_j = gh.apply(variables_gh, lr_j, fake_j, lr_j)

    # CA-Net mu/logvar
    np.testing.assert_allclose(mu_t.numpy(), np.asarray(mu_j), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        logvar_t.numpy(), np.asarray(logvar_j), rtol=1e-4, atol=1e-4
    )

    # pyramid shapes + values
    for i, (ft, fj) in enumerate(zip(fake_imgs, fake_j)):
        ft = ft.numpy()
        fj = np.asarray(fj).transpose(0, 3, 1, 2)
        assert ft.shape == fj.shape
        np.testing.assert_allclose(ft, fj, rtol=1e-3, atol=2e-4,
                                   err_msg=f"low pyramid stage {i}")

    # attention maps
    for i, (at, aj) in enumerate(zip(att_maps, att_j)):
        np.testing.assert_allclose(
            at.numpy(), np.asarray(aj), rtol=1e-3, atol=1e-5,
            err_msg=f"attn map stage {i}",
        )

    # high-frequency refined pyramid (final SR output)
    for i, (ft, fj) in enumerate(zip(fine, fine_j)):
        ft = ft.numpy()
        fj = np.asarray(fj).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ft, fj, rtol=1e-3, atol=5e-4,
                                   err_msg=f"high pyramid stage {i}")

    # uint8 image-level check: final saved SR must be pixel-identical
    im_t = np.round(
        np.clip((fine[-1][0].numpy() + 1.0) * 127.5, 0, 255)
    ).astype(np.uint8)
    im_j = np.round(
        np.clip((np.asarray(fine_j[-1][0]).transpose(2, 0, 1) + 1.0) * 127.5, 0, 255)
    ).astype(np.uint8)
    mismatch = (im_t != im_j).mean()
    assert mismatch < 0.01, f"uint8 pixel mismatch ratio {mismatch}"


def test_netg_high_additive_parity(setup):
    """NetG_high (additive variant, model.py:133-209) vs the reference with
    randomly initialized weights converted both ways."""
    from tests.reference_oracle import load_reference

    from tgsr_tpu.checkpoints.convert_torch import convert_netgh_weight
    from tgsr_tpu.models.generator_hf import NetGHigh

    ref = load_reference()
    torch.manual_seed(11)
    net = ref["model"].NetG_high(cat=False)
    net.eval()
    # randomize BN stats so eval BN actually transforms
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    g = torch.Generator().manual_seed(12)
    lr_t = torch.randn(1, 3, 32, 32, generator=g) * 0.5
    srb_t = [torch.randn(1, 3, s, s, generator=g) * 0.5
             for s in (64, 128, 256)]
    with torch.no_grad():
        ims_t = net(lr_t, srb_t, lr_t, low=True)  # convin(LRb) path

    variables = convert_netgh_weight(net.state_dict())
    variables["params"].pop("a", None)  # NetGHigh has no blend param
    m = NetGHigh(ngf=32)
    to_nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    ims_j = m.apply(variables, to_nhwc(lr_t), [to_nhwc(s) for s in srb_t],
                    to_nhwc(lr_t), low=True)
    for i, (t, j) in enumerate(zip(ims_t, ims_j)):
        np.testing.assert_allclose(
            t.numpy(), np.asarray(j).transpose(0, 3, 1, 2),
            rtol=1e-3, atol=1e-4, err_msg=f"scale {i}")


def test_stage1_variant_parity(setup):
    """G_SR_NET_low_stage1 (model.py:81-130) vs reference with random
    weights -- includes the shared-up1 quirk (up2 declared but unused)."""
    from tests.reference_oracle import load_reference

    from tgsr_tpu.checkpoints.convert_torch import convert_netg_low_stage1
    from tgsr_tpu.models.generator import GSRNetLowStage1

    ref = load_reference()
    torch.manual_seed(21)
    net = ref["model"].G_SR_NET_low_stage1()
    net.eval()

    s = setup
    lr_t = torch.from_numpy(s["lr"].transpose(2, 0, 1))[None]
    with torch.no_grad():
        fake_t, atts_t, mu_t, logvar_t = net(
            lr_t, s["sent"], s["words"], s["mask"])

    variables = convert_netg_low_stage1(net.state_dict())
    m = GSRNetLowStage1(ngf=32)
    lr_j = jnp.asarray(s["lr"])[None]
    words_j = jnp.asarray(s["words"].numpy().transpose(0, 2, 1))
    sent_j = jnp.asarray(s["sent"].numpy())
    mask_j = jnp.asarray(s["mask"].numpy())
    fake_j, atts_j, mu_j, logvar_j = m.apply(
        variables, lr_j, sent_j, words_j, mask_j)

    np.testing.assert_allclose(mu_t.numpy(), np.asarray(mu_j),
                               rtol=1e-4, atol=1e-4)
    for i, (t, j) in enumerate(zip(fake_t, fake_j)):
        np.testing.assert_allclose(
            t.numpy(), np.asarray(j).transpose(0, 3, 1, 2),
            rtol=1e-3, atol=1e-4, err_msg=f"stage1 scale {i}")
    for i, (t, j) in enumerate(zip(atts_t, atts_j)):
        np.testing.assert_allclose(
            t.numpy(), np.asarray(j), rtol=1e-3, atol=1e-5,
            err_msg=f"stage1 attn {i}")


def test_netgh_sr_weight_parity(setup):
    """NetG_high_SR_weight (model.py:301-336): space-to-depth fusion with
    tied residual1==residual and a 256x256 weight map."""
    from tests.reference_oracle import load_reference

    from tgsr_tpu.checkpoints.convert_torch import convert_netgh_sr_weight
    from tgsr_tpu.models.generator_hf import NetGHighSRWeight

    ref = load_reference()
    torch.manual_seed(31)
    net = ref["model"].NetG_high_SR_weight()
    net.eval()
    with torch.no_grad():
        for mm in net.modules():
            if isinstance(mm, torch.nn.BatchNorm2d):
                mm.running_mean.normal_(0, 0.3)
                mm.running_var.uniform_(0.5, 2.0)
        net.a.normal_(0.5, 0.1)

    g = torch.Generator().manual_seed(32)
    lr_t = torch.randn(1, 3, 32, 32, generator=g) * 0.5  # LR = SR/8
    srb_t = [torch.randn(1, 3, 256, 256, generator=g) * 0.5]
    with torch.no_grad():
        ims_t, a_t = net(lr_t, srb_t, lr_t)

    variables = convert_netgh_sr_weight(net.state_dict())
    m = NetGHighSRWeight(ngf=32, size=256)
    to_nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    ims_j, a_j = m.apply(variables, to_nhwc(lr_t), [to_nhwc(srb_t[0])],
                         to_nhwc(lr_t))
    np.testing.assert_allclose(
        ims_t[0].numpy(), np.asarray(ims_j[0]).transpose(0, 3, 1, 2),
        rtol=1e-3, atol=1e-3)
