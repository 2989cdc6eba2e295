"""Unit parity of L1 blocks vs. tiny PyTorch oracles (torch CPU)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tgsr_tpu.ops.blocks import (  # noqa: E402
    ResBlock,
    UpBlock,
    DownBlock,
    glu,
    upsample_nearest2x,
    depth_to_space,
    space_to_depth,
)

RTOL, ATOL = 1e-5, 1e-5


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return x_nchw.transpose(0, 2, 3, 1)


def conv_w(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(2, 3, 1, 0)


def bn_vars(bn: tnn.BatchNorm2d):
    return (
        {"scale": bn.weight.detach().numpy(), "bias": bn.bias.detach().numpy()},
        {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()},
    )


def rand_nchw(*shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


def torch_glu(x):
    nc = x.size(1) // 2
    return x[:, :nc] * torch.sigmoid(x[:, nc:])


def test_glu():
    x = rand_nchw(2, 8, 5, 5)
    ref = torch_glu(x).numpy()
    got = glu(jnp.asarray(to_nhwc(x.numpy())))
    np.testing.assert_allclose(to_nhwc(ref), np.asarray(got), rtol=RTOL, atol=ATOL)


def test_upsample_nearest():
    x = rand_nchw(2, 3, 4, 4)
    ref = tnn.Upsample(scale_factor=2, mode="nearest")(x).numpy()
    got = upsample_nearest2x(jnp.asarray(to_nhwc(x.numpy())))
    np.testing.assert_allclose(to_nhwc(ref), np.asarray(got), rtol=RTOL, atol=ATOL)


def test_depth_space_roundtrip_vs_torch():
    # oracle = util.py:16-41 semantics
    x = rand_nchw(2, 48, 4, 6)
    N, C, H, W = x.shape
    bs = 4
    v = x.view(N, bs, bs, C // bs**2, H, W).permute(0, 3, 4, 1, 5, 2).contiguous()
    ref_d2s = v.view(N, C // bs**2, H * bs, W * bs).numpy()
    got = depth_to_space(jnp.asarray(to_nhwc(x.numpy())), bs)
    np.testing.assert_allclose(to_nhwc(ref_d2s), np.asarray(got), rtol=RTOL, atol=ATOL)

    y = rand_nchw(2, 3, 8, 12, seed=1)
    N, C, H, W = y.shape
    v = y.view(N, C, H // bs, bs, W // bs, bs).permute(0, 3, 5, 1, 2, 4).contiguous()
    ref_s2d = v.view(N, C * bs**2, H // bs, W // bs).numpy()
    got = space_to_depth(jnp.asarray(to_nhwc(y.numpy())), bs)
    np.testing.assert_allclose(to_nhwc(ref_s2d), np.asarray(got), rtol=RTOL, atol=ATOL)


def test_upblock_eval_parity():
    """upBlock = Upsample + conv3x3(in->2out) + BN + GLU (util.py:74-80)."""
    cin, cout = 6, 4
    tb = tnn.Sequential(
        tnn.Upsample(scale_factor=2, mode="nearest"),
        tnn.Conv2d(cin, cout * 2, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(cout * 2),
    ).eval()
    with torch.no_grad():
        tb[2].running_mean.normal_(0, 0.5)
        tb[2].running_var.uniform_(0.5, 2.0)
        tb[2].weight.normal_(1, 0.2)
        tb[2].bias.normal_(0, 0.2)
    x = rand_nchw(2, cin, 5, 5)
    ref = torch_glu(tb(x)).detach().numpy()

    bnp, bns = bn_vars(tb[2])
    variables = {
        "params": {"conv": {"kernel": conv_w(tb[1].weight)}, "bn": bnp},
        "batch_stats": {"bn": bns},
    }
    got = UpBlock(cout).apply(variables, jnp.asarray(to_nhwc(x.numpy())))
    np.testing.assert_allclose(to_nhwc(ref), np.asarray(got), rtol=1e-4, atol=1e-4)


def test_resblock_eval_parity():
    """ResBlock (util.py:110-130)."""
    c = 8
    conv1 = tnn.Conv2d(c, c * 2, 3, 1, 1, bias=False)
    bn1 = tnn.BatchNorm2d(c * 2).eval()
    conv2 = tnn.Conv2d(c, c, 3, 1, 1, bias=False)
    bn2 = tnn.BatchNorm2d(c).eval()
    for bn in (bn1, bn2):
        with torch.no_grad():
            bn.running_mean.normal_(0, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.normal_(1, 0.2)
            bn.bias.normal_(0, 0.2)
    x = rand_nchw(2, c, 6, 6)
    ref = (bn2(conv2(torch_glu(bn1(conv1(x))))) + x).detach().numpy()

    p1, s1 = bn_vars(bn1)
    p2, s2 = bn_vars(bn2)
    variables = {
        "params": {
            "conv1": {"kernel": conv_w(conv1.weight)},
            "bn1": p1,
            "conv2": {"kernel": conv_w(conv2.weight)},
            "bn2": p2,
        },
        "batch_stats": {"bn1": s1, "bn2": s2},
    }
    got = ResBlock(c).apply(variables, jnp.asarray(to_nhwc(x.numpy())))
    np.testing.assert_allclose(to_nhwc(ref), np.asarray(got), rtol=1e-4, atol=1e-4)


def test_downblock_eval_parity():
    """downBlock = conv4x4 s2 p1 + BN + LeakyReLU(0.2) (util.py:92-98)."""
    cin, cout = 3, 8
    conv = tnn.Conv2d(cin, cout, 4, 2, 1, bias=False)
    bn = tnn.BatchNorm2d(cout).eval()
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
    x = rand_nchw(2, cin, 8, 8)
    ref = tnn.LeakyReLU(0.2)(bn(conv(x))).detach().numpy()

    p, s = bn_vars(bn)
    variables = {
        "params": {"conv": {"kernel": conv_w(conv.weight)}, "bn": p},
        "batch_stats": {"bn": s},
    }
    got = DownBlock(cout).apply(variables, jnp.asarray(to_nhwc(x.numpy())))
    np.testing.assert_allclose(to_nhwc(ref), np.asarray(got), rtol=1e-4, atol=1e-4)


def test_plain_residual_block_oracle():
    """_Residual_Block (model.py:8-30) -- unused by the eval path in both
    codebases, but kept structure-exact; random-init torch oracle, both
    norm modes."""
    import jax.numpy as jnp

    from tests.reference_oracle import load_reference
    from tgsr_tpu.checkpoints.convert_torch import _bn_params, _bn_stats, _conv
    from tgsr_tpu.ops.blocks import PlainResidualBlock

    ref = load_reference()
    g = torch.Generator().manual_seed(42)
    x = 0.5 * torch.randn(1, 64, 8, 8, generator=g)
    for norm in (False, True):
        torch.manual_seed(41)
        net = ref["model"]._Residual_Block(norm=norm)
        net.eval()
        with torch.no_grad():
            for m in net.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.3)
                    m.running_var.uniform_(0.5, 2.0)
        with torch.no_grad():
            ref_y = net(x)

        sd = net.state_dict()
        params = {"conv1": {"kernel": _conv(sd["conv1.weight"])},
                  "conv2": {"kernel": _conv(sd["conv2.weight"])}}
        variables = {"params": params}
        if norm:
            params["in1"] = _bn_params(sd, "in1")
            params["in2"] = _bn_params(sd, "in2")
            variables["batch_stats"] = {"in1": _bn_stats(sd, "in1"),
                                        "in2": _bn_stats(sd, "in2")}
        m = PlainResidualBlock(64, use_norm=norm)
        y = m.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), ref_y.numpy(),
            rtol=1e-4, atol=1e-5, err_msg=f"norm={norm}")
