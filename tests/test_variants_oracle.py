"""Numeric oracle parity for the ablation/variant modules vs the reference
util.py classes (random torch weights converted test-locally -- the
reference ships no checkpoints for these)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.reference_oracle import load_reference  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted"
)


def _conv(t):
    return t.detach().numpy().transpose(2, 3, 1, 0)


def _bn(seq, i):
    bn = seq[i]
    return ({"scale": bn.weight.detach().numpy(),
             "bias": bn.bias.detach().numpy()},
            {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()})


def _randomize_bn(net):
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)


def _resblock_vars(rb):
    p = {"conv1": {"kernel": _conv(rb.block[0].weight)},
         "conv2": {"kernel": _conv(rb.block[3].weight)}}
    bp1, bs1 = _bn(rb.block, 1)
    bp2, bs2 = _bn(rb.block, 4)
    p["bn1"], p["bn2"] = bp1, bp2
    return p, {"bn1": bs1, "bn2": bs2}


def to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def test_next_stage_noattn_oracle():
    from tgsr_tpu.models.variants import NextStageGNoAttn

    ref = load_reference()
    torch.manual_seed(41)
    net = ref["util"].NEXT_STAGE_G_noAttn(32, 256).eval()
    _randomize_bn(net)

    params, stats = {}, {}
    params["noatt"] = {"conv": {"kernel": _conv(net.noatt[0].weight)}}
    bp, bs = _bn(net.noatt, 1)
    params["noatt"]["bn"], stats["noatt"] = bp, {"bn": bs}
    stats["noatt"] = {"bn": bs}
    for j, rb in enumerate(net.residual):
        params[f"residual_{j}"], stats[f"residual_{j}"] = _resblock_vars(rb)
    params["upsample"] = {"conv": {"kernel": _conv(net.upsample[1].weight)}}
    bp, bs = _bn(net.upsample, 2)
    params["upsample"]["bn"] = bp
    stats["upsample"] = {"bn": bs}

    g = torch.Generator().manual_seed(42)
    x = torch.randn(2, 32, 8, 8, generator=g)
    with torch.no_grad():
        ref_out = net(x)
    got = NextStageGNoAttn(ngf=32).apply(
        {"params": params, "batch_stats": stats}, to_nhwc(x))
    np.testing.assert_allclose(ref_out.numpy(),
                               np.asarray(got).transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-4)


def test_iawd_oracle():
    from tgsr_tpu.models.variants import IAWD

    ref = load_reference()
    torch.manual_seed(43)
    net = ref["util"].IAWD(16).eval()
    g = torch.Generator().manual_seed(44)
    # reference reshapes attention to [B, 256, 256]: needs queryL == 256
    imf = torch.randn(2, 16, 16, 16, generator=g)
    wf = torch.randn(2, 256, 5, generator=g)
    with torch.no_grad():
        ref_out = net(imf, wf)
    params = {"conv1": {"kernel": _conv(net.conv1.weight)},
              "conv2": {"kernel": _conv(net.conv2.weight)}}
    got = IAWD().apply({"params": params}, to_nhwc(imf),
                       jnp.asarray(wf.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(ref_out.numpy().transpose(0, 2, 1),
                               np.asarray(got), rtol=1e-3, atol=1e-5)


def test_init_stage_gimg_oracle():
    from tgsr_tpu.models.variants import InitStageGImg

    ref = load_reference()
    torch.manual_seed(45)
    net = ref["util"].INIT_STAGE_GImg(32, 100, 256).eval()
    _randomize_bn(net)

    params, stats = {}, {}
    params["im2f_conv"] = {"kernel": _conv(net.im2f[0].weight)}
    bp, bs = _bn(net.im2f, 1)
    params["im2f_bn"] = bp
    stats["im2f_bn"] = bs
    w = net.att.conv_context.weight.detach().numpy()[:, :, 0, 0]
    params["att"] = {"conv_context": {"kernel": w.T}}
    for j, rb in enumerate(net.residual):
        params[f"residual_{j}"], stats[f"residual_{j}"] = _resblock_vars(rb)
    params["fout"] = {"conv": {"kernel": _conv(net.fout[0].weight)}}
    bp, bs = _bn(net.fout, 1)
    params["fout"]["bn"] = bp
    stats["fout"] = {"bn": bs}

    g = torch.Generator().manual_seed(46)
    lr = torch.randn(1, 3, 16, 16, generator=g) * 0.5
    words = torch.randn(1, 256, 6, generator=g)
    mask = torch.zeros(1, 6, dtype=torch.bool)
    mask[0, 4:] = True
    net.att.applyMask(mask)
    with torch.no_grad():
        ref_out = net(None, None, lr, words, mask)
    got = InitStageGImg(ngf=32).apply(
        {"params": params, "batch_stats": stats},
        to_nhwc(lr), jnp.asarray(words.numpy().transpose(0, 2, 1)),
        jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(ref_out.numpy(),
                               np.asarray(got).transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-4)


def test_init_stage_g_fc_oracle():
    """The fc-seeded family (INIT_STAGE_G, util.py:404-443): torch views
    the fc output CHANNEL-major (view(-1, ngf, 4, 4)); the NHWC reshape
    must transpose accordingly or converted fc weights scramble the 4x4
    seed grid (round-4 review finding)."""
    from tgsr_tpu.models.variants import InitStageG

    ref = load_reference()
    torch.manual_seed(47)
    ngf, ncf = 32, 6
    net = ref["util"].INIT_STAGE_G(ngf, ncf).eval()
    _randomize_bn(net)
    for m in net.modules():  # BN1d too
        if isinstance(m, torch.nn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    params = {"_FcEntry_0": {
        "fc": {"kernel": net.fc[0].weight.detach().numpy().T},
        "fc_bn": {"scale": net.fc[1].weight.detach().numpy(),
                  "bias": net.fc[1].bias.detach().numpy()},
    }}
    stats = {"_FcEntry_0": {
        "fc_bn": {"mean": net.fc[1].running_mean.numpy(),
                  "var": net.fc[1].running_var.numpy()},
    }}
    for i in range(1, 5):
        up = getattr(net, f"upsample{i}")
        bp, bs = _bn(up, 2)
        params[f"upsample{i}"] = {
            "conv": {"kernel": _conv(up[1].weight)}, "bn": bp}
        stats[f"upsample{i}"] = {"bn": bs}

    g = torch.Generator().manual_seed(48)
    z = torch.randn(1, 100, generator=g)
    c = torch.randn(1, ncf, generator=g)
    with torch.no_grad():
        ref_out = net(z, c)
    got = InitStageG(ngf=ngf).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(z.numpy()), jnp.asarray(c.numpy()))
    np.testing.assert_allclose(ref_out.numpy(),
                               np.asarray(got).transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-4)


def test_word_atten_oracle():
    """Word_atten (util.py:963-987) incl. its Softmax(dim=1)-over-features
    quirk: the per-word weights degenerate to 1/256 so the module returns
    wf/256 — preserved faithfully (round-4 review finding)."""
    from tgsr_tpu.models.variants import WordAtten

    ref = load_reference()
    torch.manual_seed(49)
    net = ref["util"].Word_atten(32, 256).eval()

    params = {
        "conv1": {"kernel": _conv(net.conv1.weight)},
        "conv2": {"kernel": _conv(net.conv2.weight)},
    }
    g = torch.Generator().manual_seed(50)
    imf = torch.randn(1, 32, 8, 8, generator=g) * 0.5
    wf = torch.randn(1, 256, 6, generator=g)
    with torch.no_grad():
        ref_out = net(imf, wf)  # [1, 256, 6]
    got = WordAtten(out_features=256).apply(
        {"params": params},
        jnp.asarray(imf.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(wf.numpy().transpose(0, 2, 1)))  # [1, 6, 256]
    np.testing.assert_allclose(ref_out.numpy(),
                               np.asarray(got).transpose(0, 2, 1),
                               rtol=1e-3, atol=1e-5)
