"""Numeric x16 oracle: random-init reference models16 modules vs our
converted GSRNetLow16 / NetGHigh16 / NetGHighWeight16.

Pins the tying/reuse quirks NUMERICALLY (previously structure-asserted
only): shared h_net2/3/4 + img heads (models16.py:13-14), fully-tied
NetG_high blocks (:48,53), and NetG_highweight's reuse of residual48 +
upscale8x for the 16x step (:171-173).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.reference_oracle import load_reference  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted"
)


def _randomize_bn(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)


def _to_nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def _from_nhwc(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


@pytest.fixture(scope="module")
def ref16():
    load_reference()
    import models16

    return models16


def test_low16_oracle(ref16):
    from tgsr_tpu.checkpoints.convert_torch import convert_netg_low16
    from tgsr_tpu.models.models16 import GSRNetLow16

    torch.manual_seed(61)
    net = ref16.G_SR_NET_low()
    net.eval()
    _randomize_bn(net, 62)

    g = torch.Generator().manual_seed(63)
    T = 6
    lr_t = 0.5 * torch.randn(1, 3, 16, 16, generator=g)
    sent = torch.randn(1, 256, generator=g)
    words = torch.randn(1, 256, T, generator=g)
    mask = torch.zeros(1, T, dtype=torch.bool)
    mask[0, 4:] = True
    with torch.no_grad():
        fakes_t, atts_t, mu_t, logvar_t = net(lr_t, sent, words, mask)

    variables = convert_netg_low16(net.state_dict())
    m = GSRNetLow16(ngf=32)
    fakes_j, atts_j, mu_j, logvar_j = m.apply(
        variables, _to_nhwc(lr_t), jnp.asarray(sent.numpy()),
        jnp.asarray(words.numpy().transpose(0, 2, 1)),
        jnp.asarray(mask.numpy()))

    np.testing.assert_allclose(mu_t.numpy(), np.asarray(mu_j),
                               rtol=1e-4, atol=1e-4)
    assert len(fakes_t) == len(fakes_j) == 4
    for i, (t, j) in enumerate(zip(fakes_t, fakes_j)):
        np.testing.assert_allclose(t.numpy(), _from_nhwc(j), rtol=1e-3,
                                   atol=2e-4, err_msg=f"x16 low stage {i}")
    for i, (t, j) in enumerate(zip(atts_t, atts_j)):
        np.testing.assert_allclose(t.numpy(), np.asarray(j), rtol=1e-3,
                                   atol=1e-5, err_msg=f"x16 low attn {i}")


def test_high16_oracle(ref16):
    from tgsr_tpu.checkpoints.convert_torch import (
        convert_netgh_weight16,
    )
    from tgsr_tpu.models.models16 import NetGHigh16

    torch.manual_seed(71)
    net = ref16.NetG_high(cat=False)
    net.eval()
    _randomize_bn(net, 72)

    g = torch.Generator().manual_seed(73)
    lr_t = 0.5 * torch.randn(1, 3, 16, 16, generator=g)
    srb_t = [0.5 * torch.randn(1, 3, s, s, generator=g)
             for s in (32, 64, 128, 256)]
    with torch.no_grad():
        ims_t = net(lr_t, srb_t, lr_t, low=True)

    variables = convert_netgh_weight16(net.state_dict())
    variables["params"].pop("a", None)  # NetG_high has no blend param
    m = NetGHigh16(ngf=32)
    ims_j = m.apply(variables, _to_nhwc(lr_t), [_to_nhwc(s) for s in srb_t],
                    _to_nhwc(lr_t), low=True)
    assert len(ims_t) == len(ims_j) == 4
    for i, (t, j) in enumerate(zip(ims_t, ims_j)):
        np.testing.assert_allclose(t.numpy(), _from_nhwc(j), rtol=1e-3,
                                   atol=2e-4, err_msg=f"x16 high scale {i}")


def test_highweight16_weightmap_oracle(ref16):
    """weightmap=True is the only shape-consistent x16 blend path; exercises
    the residual48/upscale8x REUSE bug for the 16x step numerically."""
    from tgsr_tpu.checkpoints.convert_torch import convert_netgh_weight16
    from tgsr_tpu.models.models16 import NetGHighWeight16

    torch.manual_seed(81)
    net = ref16.NetG_highweight(weightmap=True, low="lr")
    net.eval()
    _randomize_bn(net, 82)
    with torch.no_grad():
        for a in (net.a1, net.a2, net.a3, net.a4):
            a.normal_(0.5, 0.2)

    g = torch.Generator().manual_seed(83)
    lr_t = 0.5 * torch.randn(1, 3, 16, 16, generator=g)
    srb_t = [0.5 * torch.randn(1, 3, s, s, generator=g)
             for s in (32, 64, 128, 256)]
    with torch.no_grad():
        ims_t, a4_t, _ = net(lr_t, srb_t, lr_t)

    variables = convert_netgh_weight16(net.state_dict(), weightmap=True)
    m = NetGHighWeight16(ngf=32, weightmap=True, low="lr", fix_bugs=False)
    ims_j, a4_j, _ = m.apply(
        variables, _to_nhwc(lr_t), [_to_nhwc(s) for s in srb_t],
        _to_nhwc(lr_t))
    for i, (t, j) in enumerate(zip(ims_t, ims_j)):
        np.testing.assert_allclose(t.numpy(), _from_nhwc(j), rtol=1e-3,
                                   atol=5e-4, err_msg=f"x16 blend scale {i}")
    np.testing.assert_allclose(a4_t.detach().numpy(),
                               np.asarray(a4_j).squeeze((0, 3)), rtol=1e-6)
