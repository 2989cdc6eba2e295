"""JAX/Flax variable-tree -> torch .pth state-dict exporter.

The exact inverse of convert_torch: takes the {'params', 'batch_stats'}
trees this framework trains (cli.train_gan / cli.pretrain_damsm msgpack
snapshots) and produces state dicts under the REFERENCE's key names and
layouts, loadable by the reference's torch modules (model.py / util.py)
with `load_state_dict(strict=True)`. This is the migration path BACK:
train here, eval/serve with the original stack.

Layout conversions (inverse of convert_torch):
  conv kernel  HWIO -> OIHW
  Dense kernel [in, out] -> [out, in]
  1x1 word-projection Dense -> conv_context [idf, cdf, 1, 1]
  BN scale/bias + batch_stats mean/var -> weight/bias/running_mean/var,
      plus the torch bookkeeping `num_batches_tracked` counter (int64) the
      converter drops -- re-emitted as 0, which torch eval never reads
      (it only matters under BN momentum=None, and the reference uses the
      default 0.1: model.py BatchNorm2d calls).
  LSTM/GRU w_ih [in, 4H] -> weight_ih_l0 [4H, in] (gate order preserved);
      bwd direction -> _reverse keys.

Faithfulness notes:
  - NetG_highweight's blend weight `a` is an UNREGISTERED parameter in the
    reference (model.py:246-248), so it is absent from real checkpoints
    and load_state_dict(strict=True) would reject it as unexpected; it is
    dropped on export (the reference re-creates a=0.5 at construction).
    The weightmap a1/a2/a3 ARE registered and are exported when present.
  - Dead declared-but-unexecuted modules (G_SR_NET_low_stage1.up2,
    models16 residual816/upscale16x under fix_bugs=False) have no
    variables on our side; the reference must load such exports with
    strict=False for those families (documented per function).

Round-trip contract (tests/test_export_torch.py): for the real face_S8
checkpoints, export(convert(sd)) reproduces sd key-for-key and
bit-for-bit on every tensor except the num_batches_tracked counters.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t)


def _conv_t(kernel) -> np.ndarray:
    """HWIO -> OIHW."""
    return _np(kernel).transpose(3, 2, 0, 1)


def _dense_t(kernel) -> np.ndarray:
    """[in, out] -> [out, in]."""
    return _np(kernel).T


def _put_bn(out: Dict[str, np.ndarray], prefix: str,
            bn_params: Mapping, bn_stats: Mapping) -> None:
    out[f"{prefix}.weight"] = _np(bn_params["scale"])
    out[f"{prefix}.bias"] = _np(bn_params["bias"])
    out[f"{prefix}.running_mean"] = _np(bn_stats["mean"])
    out[f"{prefix}.running_var"] = _np(bn_stats["var"])
    out[f"{prefix}.num_batches_tracked"] = np.array(0, np.int64)


def _put_resblock(out: Dict[str, np.ndarray], prefix: str,
                  params: Mapping, stats: Mapping) -> None:
    """flax ResBlock -> torch ResBlock.block Sequential(conv,BN,GLU,conv,BN)."""
    out[f"{prefix}.0.weight"] = _conv_t(params["conv1"]["kernel"])
    _put_bn(out, f"{prefix}.1", params["bn1"], stats["bn1"])
    out[f"{prefix}.3.weight"] = _conv_t(params["conv2"]["kernel"])
    _put_bn(out, f"{prefix}.4", params["bn2"], stats["bn2"])


def _put_conv_bn(out: Dict[str, np.ndarray], prefix: str,
                 params: Mapping, stats: Mapping,
                 conv_idx: int = 0, bn_idx: int = 1) -> None:
    """{'conv', 'bn'} -> torch Sequential(conv, BN, GLU) at given indices."""
    out[f"{prefix}.{conv_idx}.weight"] = _conv_t(params["conv"]["kernel"])
    _put_bn(out, f"{prefix}.{bn_idx}", params["bn"], stats["bn"])


def export_netg_low(variables: Mapping, n_stages: int = 3) -> Dict[str, Any]:
    """GSRNetLow variables -> netG state dict (G_SR_NET_low, model.py:34-78).

    Inverse of convert_torch.convert_netg_low; strict=True loadable."""
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    out["ca_net.fc.weight"] = _dense_t(params["ca_net"]["fc"]["kernel"])
    out["ca_net.fc.bias"] = _np(params["ca_net"]["fc"]["bias"])
    for k in range(1, n_stages + 1):
        hp, hs = params[f"h_net{k}"], stats[f"h_net{k}"]
        # Dense [cdf, idf] -> conv_context [idf, cdf, 1, 1]
        w = _np(hp["att"]["conv_context"]["kernel"]).T
        out[f"h_net{k}.att.conv_context.weight"] = w[:, :, None, None]
        if k == 1:
            out["h_net1.im2f.0.weight"] = _conv_t(hp["im2f_conv"]["kernel"])
            _put_bn(out, "h_net1.im2f.1", hp["im2f_bn"], hs["im2f_bn"])
        j = 0
        while f"residual_{j}" in hp:
            _put_resblock(out, f"h_net{k}.residual.{j}.block",
                          hp[f"residual_{j}"], hs[f"residual_{j}"])
            j += 1
        _put_conv_bn(out, f"h_net{k}.upsample", hp["upsample"],
                     hs["upsample"], conv_idx=1, bn_idx=2)
        if f"img_net{k}" in params:  # x16 trees share one head (img_net1)
            out[f"img_net{k}.img.0.weight"] = _conv_t(
                params[f"img_net{k}"]["conv"]["kernel"])
    return out


def export_netgh_weight(variables: Mapping, n_res: int = 6,
                        weightmap: bool = False) -> Dict[str, Any]:
    """NetGHighWeight variables -> netGH state dict (NetG_highweight,
    model.py:212-298). The unregistered blend `a` is dropped (see module
    docstring); weightmap a1/a2/a3 export when present.

    Width caveat: the reference HARDCODES channel_num=32 in make_layer
    (model.py:162), so its module only represents ngf=32 residual chains
    (anything else crashes its own forward); exports from non-default
    widths carry our ngf-consistent shapes and load only at GF_DIM=32."""
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    _put_conv_bn(out, "convin", params["convin"], stats["convin"])
    for j in range(n_res):
        _put_resblock(out, f"residual.{j}.block",
                      params[f"residual_{j}"], stats[f"residual_{j}"])
    for scale in ("2x", "4x", "8x"):
        if f"upscale{scale}" in params:
            _put_conv_bn(out, f"upscale{scale}", params[f"upscale{scale}"],
                         stats[f"upscale{scale}"], conv_idx=1, bn_idx=2)
    for name in ("residual24", "residual48"):
        if name in params:
            _put_resblock(out, name, params[name], stats[name])
    out["conv_output.0.weight"] = _conv_t(
        params["conv_output"]["conv"]["kernel"])
    if weightmap:
        for n in ("a1", "a2", "a3", "a4"):
            if n in params:
                out[n] = _np(params[n])
    return out


def export_netgh_weight16(variables: Mapping, n_res: int = 6,
                          weightmap: bool = False) -> Dict[str, Any]:
    """NetGHighWeight16 variables -> models16 netGH state dict
    (models16.py:109-179). residual816/upscale16x export when our module
    carries them (fix_bugs=True); under the faithful fix_bugs=False they
    are absent and the reference must load with strict=False (they are
    declared-but-never-executed there, models16.py:171-173)."""
    params, stats = variables["params"], variables["batch_stats"]
    out = export_netgh_weight(variables, n_res=n_res, weightmap=weightmap)
    if "residual816" in params:
        _put_resblock(out, "residual816", params["residual816"],
                      stats["residual816"])
    if "upscale16x" in params:
        _put_conv_bn(out, "upscale16x", params["upscale16x"],
                     stats["upscale16x"], conv_idx=1, bn_idx=2)
    return out


def export_netg_low16(variables: Mapping) -> Dict[str, Any]:
    """GSRNetLow16 variables -> models16 netG state dict (models16.py:5-56).

    The torch module ALIASES h_net2==h_net3==h_net4 and
    img_net1==..==img_net4 (models16.py:13-14), so its state dict carries
    each shared tensor under every alias; we emit all alias key sets from
    the single owned instance, making the export strict=True loadable."""
    out = export_netg_low(variables, n_stages=2)
    params = variables["params"]
    head = _conv_t(params["img_net1"]["conv"]["kernel"])
    # drop the x8-style per-stage head keys, then emit the alias sets
    out.pop("img_net1.img.0.weight", None)
    out.pop("img_net2.img.0.weight", None)
    for k in (1, 2, 3, 4):
        out[f"img_net{k}.img.0.weight"] = head
    shared = {k: v for k, v in out.items() if k.startswith("h_net2.")}
    for alias in ("h_net3", "h_net4"):
        for k, v in shared.items():
            out[alias + k[len("h_net2"):]] = v
    return out


def export_text_encoder(variables: Mapping) -> Dict[str, Any]:
    """TextEncoder variables -> DAMSM text_encoder state dict
    (RNN_ENCODER, util.py:175-260). Gate order (i,f,g,o LSTM / r,z,n GRU)
    is preserved by plain transposition; strict=True loadable."""
    params = variables["params"]
    out: Dict[str, np.ndarray] = {"encoder.weight": _np(params["embedding"])}
    for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
        if f"w_ih_{d}" not in params:
            continue
        out[f"rnn.weight_ih_l0{suffix}"] = _np(params[f"w_ih_{d}"]).T
        out[f"rnn.weight_hh_l0{suffix}"] = _np(params[f"w_hh_{d}"]).T
        out[f"rnn.bias_ih_l0{suffix}"] = _np(params[f"b_ih_{d}"])
        out[f"rnn.bias_hh_l0{suffix}"] = _np(params[f"b_hh_{d}"])
    return out


def export_cnn_encoder(variables: Mapping) -> Dict[str, Any]:
    """CNNEncoder variables -> DAMSM image_encoder state dict
    (CNN_ENCODER, util.py:263-368; backbone under the torchvision
    inception_v3 module names). Inverse of convert_cnn_encoder.

    Only Inception-family trees export: the reference has no torch module
    matching SimpleCNNEncoder (the no-zoo fallback), so those snapshots
    are rejected with a clear error instead of a KeyError."""
    params, stats = variables["params"], variables["batch_stats"]
    if "inception" not in params:
        raise ValueError(
            "not an Inception-family image-encoder tree (SimpleCNNEncoder "
            "snapshots have no reference torch counterpart to export to)")
    out: Dict[str, np.ndarray] = {}

    def walk(p: Mapping, s: Mapping, path: str) -> None:
        if "conv" in p and "kernel" in p.get("conv", {}):
            out[f"{path}.conv.weight"] = _conv_t(p["conv"]["kernel"])
            _put_bn(out, f"{path}.bn", p["bn"], s["bn"])
            return
        for name in p:
            sub = f"{path}.{name}" if path else name
            walk(p[name], s.get(name, {}), sub)

    walk(params["inception"], stats["inception"], "")
    if "emb_features" in params:
        w = _np(params["emb_features"]["kernel"]).T  # [nef, 768]
        out["emb_features.weight"] = w[:, :, None, None]
        out["emb_cnn_code.weight"] = _dense_t(
            params["emb_cnn_code"]["kernel"])
        out["emb_cnn_code.bias"] = _np(params["emb_cnn_code"]["bias"])
    return out


def save_torch(sd: Mapping[str, np.ndarray], path: str) -> None:
    """Write a numpy state dict as a torch .pth (weights_only loadable)."""
    import torch

    # copy=True: msgpack-loaded arrays are read-only views, which torch
    # rejects as non-writable
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, path)
