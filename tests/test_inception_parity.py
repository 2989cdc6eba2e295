"""CNN_ENCODER (Inception-v3) numerical parity vs the reference util.py.

torchvision is not installed here, so the test provides a torch
implementation of the torchvision inception_v3 FEATURE graph (public
architecture; module/key names match the zoo checkpoint exactly), injects it
into the torchvision stub, instantiates the REFERENCE's own CNN_ENCODER
(util.py:263-368) around it, and compares against tgsr_tpu's CNNEncoder fed
the converted state dict. This validates:

  * the flax InceptionV3Backbone graph (Mixed_6e tap + pooled 2048)
  * convert_cnn_encoder's key mapping (convs, BN params+stats, both heads)
  * the 299x299 bilinear pre-resize semantics

BN parameters and running stats are randomized (not left at init) so a
conversion slip cannot hide behind identity-BN.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.reference_oracle import load_reference  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted"
)


# ---------------------------------------------------------------------------
# torchvision inception_v3 feature graph (exact module names => exact keys)
# ---------------------------------------------------------------------------

class BasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class InceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)


class InceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class InceptionC(tnn.Module):
    def __init__(self, cin, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class InceptionE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class InceptionV3Features(tnn.Module):
    """The inception_v3 modules CNN_ENCODER.define_module taps (no aux/fc)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)


def _randomize_bn(model, seed):
    """Random BN affine + running stats so conversion slips can't hide."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(0.2 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.2 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g))


@pytest.fixture(scope="module")
def ref_encoder():
    """The reference CNN_ENCODER built around our seeded inception graph."""
    ref = load_reference()
    import torchvision

    torch.manual_seed(7)
    backbone = InceptionV3Features()
    _randomize_bn(backbone, 8)
    torchvision.models.inception_v3 = lambda *a, **k: backbone

    import util as ref_util

    class _ZooShim:
        @staticmethod
        def load_url(url):
            return backbone.state_dict()

    old_zoo = ref_util.model_zoo
    ref_util.model_zoo = _ZooShim
    ref["cfg"].TRAIN.FLAG = True
    try:
        enc = ref_util.CNN_ENCODER(256)
    finally:
        ref_util.model_zoo = old_zoo
    enc.eval()
    return enc


def test_cnn_encoder_parity(ref_encoder):
    from tgsr_tpu.checkpoints.convert_torch import convert_cnn_encoder
    from tgsr_tpu.models.image_encoder import CNNEncoder

    sd = {k: v.numpy() for k, v in ref_encoder.state_dict().items()}
    variables = convert_cnn_encoder(sd, nef=256)

    g = torch.Generator().manual_seed(9)
    x = torch.rand(2, 3, 128, 128, generator=g) * 2 - 1
    with torch.no_grad():
        ref_feat, ref_code = ref_encoder(x)

    enc = CNNEncoder(nef=256)
    feat, code = jax.jit(
        lambda v, x: enc.apply(v, x, train=False)
    )(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))

    # reference features: [B, 256, 17, 17]; ours: [B, 289, 256]
    ref_feat = ref_feat.numpy().reshape(2, 256, -1).transpose(0, 2, 1)
    feat = np.asarray(feat)
    scale = np.abs(ref_feat).mean()
    np.testing.assert_allclose(feat / scale, ref_feat / scale,
                               rtol=1e-3, atol=2e-3)
    code_scale = np.abs(ref_code.numpy()).mean()
    np.testing.assert_allclose(
        np.asarray(code) / code_scale, ref_code.numpy() / code_scale,
        rtol=1e-3, atol=2e-3)


def test_backbone_tap_parity(ref_encoder):
    """Mixed_6e tap and pooled 2048 vector directly (pre-head)."""
    from tgsr_tpu.checkpoints.convert_torch import convert_cnn_encoder
    from tgsr_tpu.models.image_encoder import InceptionV3Backbone

    sd = {k: v.numpy() for k, v in ref_encoder.state_dict().items()}
    variables = convert_cnn_encoder(sd, nef=256)
    bb_vars = {"params": variables["params"]["inception"],
               "batch_stats": variables["batch_stats"]["inception"]}

    g = torch.Generator().manual_seed(10)
    x = torch.rand(2, 3, 299, 299, generator=g) * 2 - 1

    with torch.no_grad():
        t = x
        for name in ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"]:
            t = getattr(ref_encoder, name)(t)
        t = F.max_pool2d(t, 3, stride=2)
        t = ref_encoder.Conv2d_4a_3x3(ref_encoder.Conv2d_3b_1x1(t))
        t = F.max_pool2d(t, 3, stride=2)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
            t = getattr(ref_encoder, name)(t)
        ref_6e = t
        for name in ["Mixed_7a", "Mixed_7b", "Mixed_7c"]:
            t = getattr(ref_encoder, name)(t)
        ref_pool = F.avg_pool2d(t, kernel_size=8).reshape(2, -1)

    bb = InceptionV3Backbone()
    feat, pooled = jax.jit(
        lambda v, x: bb.apply(v, x, train=False)
    )(bb_vars, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))

    assert feat.shape == (2, 17, 17, 768)
    assert pooled.shape == (2, 2048)
    s = np.abs(ref_6e.numpy()).mean()
    np.testing.assert_allclose(
        np.asarray(feat).transpose(0, 3, 1, 2) / s, ref_6e.numpy() / s,
        rtol=1e-3, atol=2e-3)
    sp = np.abs(ref_pool.numpy()).mean()
    np.testing.assert_allclose(np.asarray(pooled) / sp,
                               ref_pool.numpy() / sp, rtol=1e-3, atol=2e-3)
