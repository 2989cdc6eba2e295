"""Flax -> torch .pth exporter (checkpoints/export_torch.py): the exact
inverse of the .pth -> Flax converter.

Gold contract: export(convert(sd)) reproduces the ORIGINAL torch state
dict key-for-key and bit-for-bit (num_batches_tracked counters excepted —
the converter drops those torch bookkeeping scalars, the exporter re-emits
them as 0), and the export loads into the REFERENCE's own torch modules
(model.py / models16.py / util.py) — the migration path back to the
original stack."""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.reference_oracle import load_reference  # noqa: E402

from tgsr_tpu.checkpoints.convert_torch import (  # noqa: E402
    convert_cnn_encoder,
    convert_netg_low,
    convert_netg_low16,
    convert_netgh_weight,
    convert_netgh_weight16,
    convert_text_encoder,
)
from tgsr_tpu.checkpoints.export_torch import (  # noqa: E402
    export_cnn_encoder,
    export_netg_low,
    export_netg_low16,
    export_netgh_weight,
    export_netgh_weight16,
    export_text_encoder,
    save_torch,
)

CKPT_G = "/root/reference/Checkpoint/face_S8/netG_epoch_7.pth"
CKPT_GH = "/root/reference/Checkpoint/face_S8/netGH_epoch_7.pth"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT_G), reason="reference checkpoints not mounted"
)


def _assert_roundtrip(orig_sd, exported):
    """Key sets equal; every tensor bit-equal except the
    num_batches_tracked counters (re-emitted as int64 zeros)."""
    orig = {k: np.asarray(v) for k, v in orig_sd.items()}
    assert set(exported) == set(orig), (
        f"missing={sorted(set(orig) - set(exported))[:5]} "
        f"extra={sorted(set(exported) - set(orig))[:5]}")
    for k, v in orig.items():
        if k.endswith("num_batches_tracked"):
            assert exported[k].dtype == np.int64
            continue
        np.testing.assert_array_equal(np.asarray(exported[k]), v,
                                      err_msg=k)


def test_netg_roundtrip_real_ckpt():
    sd = torch.load(CKPT_G, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    _assert_roundtrip(sd, export_netg_low(convert_netg_low(sd)))


def test_netgh_roundtrip_real_ckpt():
    """Incl. the unregistered-`a` quirk: the real checkpoint has no `a`
    key (model.py:246-248), convert inserts the constructor constant, and
    export drops it again — so the round trip is exact."""
    sd = torch.load(CKPT_GH, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    _assert_roundtrip(sd, export_netgh_weight(convert_netgh_weight(sd)))


def test_export_loads_into_reference_models():
    """Key COMPLETENESS against the actual torch modules: netG export
    loads strict=True into G_SR_NET_low; netGH export into NetG_highweight
    with no unexpected keys (same contract the shipped checkpoint itself
    meets, test_generator_parity.py setup)."""
    ref = load_reference()
    model = ref["model"]

    sd = torch.load(CKPT_G, map_location="cpu", weights_only=True)
    out = export_netg_low(convert_netg_low(
        {k: v.numpy() for k, v in sd.items()}))
    netGL = model.G_SR_NET_low()
    netGL.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in out.items()}, strict=True)

    sd_gh = torch.load(CKPT_GH, map_location="cpu", weights_only=True)
    out_gh = export_netgh_weight(convert_netgh_weight(
        {k: v.numpy() for k, v in sd_gh.items()}))
    netGH = model.NetG_highweight(weightmap=False, low="lr")
    missing, unexpected = netGH.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in out_gh.items()}, strict=False)
    assert unexpected == []


@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU"])
def test_text_encoder_roundtrip(rnn_type):
    """Bidirectional RNN weights through convert -> export, bit-exact
    (gate order i,f,g,o / r,z,n preserved by plain transposition)."""
    torch.manual_seed(5)
    emb = torch.nn.Embedding(41, 300)
    cls = torch.nn.LSTM if rnn_type == "LSTM" else torch.nn.GRU
    rnn = cls(300, 128, batch_first=True, bidirectional=True)
    sd = {"encoder.weight": emb.weight.detach().numpy()}
    for name, p in rnn.named_parameters():
        sd[f"rnn.{name}"] = p.detach().numpy()
    _assert_roundtrip(
        sd, export_text_encoder(convert_text_encoder(sd, rnn_type)))


def test_x16_family_roundtrip():
    """models16 trio: the torch modules ALIAS h_net2/3/4 and img_net1..4
    (models16.py:13-14); convert keeps one owned instance, export re-emits
    every alias key set — strict=True loadable and bit-exact."""
    load_reference()
    import models16

    torch.manual_seed(91)
    netg = models16.G_SR_NET_low()
    sd = {k: v.detach().numpy() for k, v in netg.state_dict().items()}
    out = export_netg_low16(convert_netg_low16(sd))
    _assert_roundtrip(sd, out)
    netg.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in out.items()}, strict=True)

    netgh = models16.NetG_highweight(weightmap=True, low="lr")
    sd_gh = {k: v.detach().numpy() for k, v in netgh.state_dict().items()}
    out_gh = export_netgh_weight16(
        convert_netgh_weight16(sd_gh, weightmap=True), weightmap=True)
    _assert_roundtrip(sd_gh, out_gh)
    netgh.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in out_gh.items()}, strict=True)


def test_cnn_encoder_roundtrip():
    """DAMSM image encoder (torchvision-named Inception backbone + heads)
    through convert -> export, bit-exact, against the reference's own
    CNN_ENCODER built around the test Inception graph."""
    from tests.test_inception_parity import (
        InceptionV3Features,
        _randomize_bn,
    )

    ref = load_reference()
    import torchvision

    torch.manual_seed(17)
    backbone = InceptionV3Features()
    _randomize_bn(backbone, 18)
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

    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    out = export_cnn_encoder(convert_cnn_encoder(sd, nef=256))
    _assert_roundtrip(sd, out)
    enc.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in out.items()}, strict=True)


def test_export_cli_roundtrip(tmp_path):
    """cli.export_torch end-to-end: trainer-style msgpack snapshots ->
    .pth files that reproduce the original reference checkpoints."""
    from tgsr_tpu.checkpoints.io import save_variables
    from tgsr_tpu.cli.export_torch import main

    sd_g = {k: v.numpy() for k, v in torch.load(
        CKPT_G, map_location="cpu", weights_only=True).items()}
    sd_gh = {k: v.numpy() for k, v in torch.load(
        CKPT_GH, map_location="cpu", weights_only=True).items()}
    save_variables(str(tmp_path / "netG_it7.msgpack"),
                   convert_netg_low(sd_g))
    save_variables(str(tmp_path / "netGH_it7.msgpack"),
                   convert_netgh_weight(sd_gh))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "exported"
    main(["--cfg", os.path.join(repo, "configs/train_faceSR_S8.yml"),
          "--netg", str(tmp_path / "netG_it7.msgpack"),
          "--out", str(out)])

    back_g = torch.load(str(out / "netG_it7.pth"),
                        map_location="cpu", weights_only=True)
    back_gh = torch.load(str(out / "netGH_it7.pth"),
                         map_location="cpu", weights_only=True)
    _assert_roundtrip(sd_g, {k: v.numpy() for k, v in back_g.items()})
    _assert_roundtrip(sd_gh, {k: v.numpy() for k, v in back_gh.items()})


def test_simple_cnn_snapshot_skipped(tmp_path):
    """--simple-cnn DAMSM snapshots (the no-zoo default mode) have no
    reference torch module: export_cnn_encoder refuses them clearly, and
    the CLI skips the paired image encoder while still exporting the
    text encoder (previously a KeyError traceback after a partial write)."""
    from tgsr_tpu.checkpoints.io import save_variables
    from tgsr_tpu.cli.export_torch import main

    simple_vars = {"params": {"conv0": {"kernel": np.zeros((3, 3, 3, 8),
                                                           np.float32)}},
                   "batch_stats": {}}
    with pytest.raises(ValueError, match="SimpleCNN"):
        export_cnn_encoder(simple_vars)

    torch.manual_seed(3)
    emb = torch.nn.Embedding(11, 32)
    rnn = torch.nn.LSTM(32, 16, batch_first=True, bidirectional=True)
    sd = {"encoder.weight": emb.weight.detach().numpy()}
    for name, p in rnn.named_parameters():
        sd[f"rnn.{name}"] = p.detach().numpy()
    save_variables(str(tmp_path / "text_encoder0.msgpack"),
                   convert_text_encoder(sd))
    save_variables(str(tmp_path / "image_encoder0.msgpack"), simple_vars)

    out = tmp_path / "exported"
    main(["--text_encoder", str(tmp_path / "text_encoder0.msgpack"),
          "--out", str(out)])
    assert (out / "text_encoder0.pth").exists()
    assert not (out / "image_encoder0.pth").exists()


def test_save_torch_roundtrip(tmp_path):
    """save_torch writes a weights_only-loadable .pth."""
    sd = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
          "n": np.array(0, np.int64)}
    p = str(tmp_path / "x.pth")
    save_torch(sd, p)
    back = torch.load(p, map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(back["w"].numpy(), sd["w"])
    assert back["n"].dtype == torch.int64
