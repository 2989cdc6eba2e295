"""Torch .pth -> JAX/Flax variable-tree converter.

Consumes the reference checkpoints (Checkpoint/face_S8/netG_epoch_7.pth,
netGH_epoch_7.pth and DAMSM text_encoder*.pth) and produces the
{'params': ..., 'batch_stats': ...} trees of the tgsr_tpu models.

Layout conversions:
  conv weight   OIHW -> HWIO
  1x1 "conv" on word vectors (att.conv_context) -> Dense kernel [in, out]
  linear weight [out, in] -> [in, out]
  BatchNorm     weight/bias -> scale/bias (params);
                running_mean/var -> mean/var (batch_stats)
  LSTM          weight_ih_l0 [4H, in] -> w_ih [in, 4H] (gate order i,f,g,o
                preserved); _reverse -> bwd direction

The input may be a real torch state_dict (torch is CPU-importable here) or
any mapping of str -> numpy-convertible arrays, so the converter itself has
no hard torch dependency.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (incl. on any device)
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(t) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def _dense(t) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return _np(t).T


def _bn_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _bn_stats(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def _resblock(sd: Mapping, prefix: str):
    """torch `ResBlock.block` Sequential(conv,BN,GLU,conv,BN) -> flax ResBlock."""
    params = {
        "conv1": {"kernel": _conv(sd[f"{prefix}.0.weight"])},
        "bn1": _bn_params(sd, f"{prefix}.1"),
        "conv2": {"kernel": _conv(sd[f"{prefix}.3.weight"])},
        "bn2": _bn_params(sd, f"{prefix}.4"),
    }
    stats = {"bn1": _bn_stats(sd, f"{prefix}.1"), "bn2": _bn_stats(sd, f"{prefix}.4")}
    return params, stats


def _conv_bn(sd: Mapping, prefix: str, conv_idx: int = 0, bn_idx: int = 1):
    """Sequential(conv, BN, GLU) -> {'conv': ..., 'bn': ...}."""
    params = {
        "conv": {"kernel": _conv(sd[f"{prefix}.{conv_idx}.weight"])},
        "bn": _bn_params(sd, f"{prefix}.{bn_idx}"),
    }
    stats = {"bn": _bn_stats(sd, f"{prefix}.{bn_idx}")}
    return params, stats


def convert_netg_low(sd: Mapping, n_stages: int = 3) -> Dict[str, Any]:
    """netG_epoch_N.pth (G_SR_NET_low, model.py:34-78) -> GSRNetLow variables.

    Checkpoint ground truth: 104 tensors, keys ca_net.fc.*,
    h_net{1..3}.{att.conv_context, im2f, residual.{0,1}, upsample},
    img_net{1..3}.img.0 (verified by load; see SURVEY.md 2.5).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["ca_net"] = {
        "fc": {"kernel": _dense(sd["ca_net.fc.weight"]),
               "bias": _np(sd["ca_net.fc.bias"])}
    }

    for k in range(1, n_stages + 1):
        hp: Dict[str, Any] = {}
        hs: Dict[str, Any] = {}
        # attention word projection: [idf, cdf, 1, 1] -> Dense [cdf, idf]
        w = _np(sd[f"h_net{k}.att.conv_context.weight"])
        hp["att"] = {"conv_context": {"kernel": w[:, :, 0, 0].T}}
        if k == 1:
            hp["im2f_conv"] = {"kernel": _conv(sd["h_net1.im2f.0.weight"])}
            hp["im2f_bn"] = _bn_params(sd, "h_net1.im2f.1")
            hs["im2f_bn"] = _bn_stats(sd, "h_net1.im2f.1")
        # residual blocks
        j = 0
        while f"h_net{k}.residual.{j}.block.0.weight" in sd:
            rp, rs = _resblock(sd, f"h_net{k}.residual.{j}.block")
            hp[f"residual_{j}"] = rp
            hs[f"residual_{j}"] = rs
            j += 1
        # upsample: Sequential(Upsample, conv, BN, GLU) -> indices 1, 2
        up_p, up_s = _conv_bn(sd, f"h_net{k}.upsample", conv_idx=1, bn_idx=2)
        hp["upsample"] = up_p
        hs["upsample"] = up_s
        params[f"h_net{k}"] = hp
        stats[f"h_net{k}"] = hs
        params[f"img_net{k}"] = {
            "conv": {"kernel": _conv(sd[f"img_net{k}.img.0.weight"])}
        }

    return {"params": params, "batch_stats": stats}


def convert_netgh_weight(sd: Mapping, n_res: int = 6,
                         weightmap: bool = False) -> Dict[str, Any]:
    """netGH_epoch_N.pth (NetG_highweight, model.py:212-298) -> NetGHighWeight.

    The blend weight `a` is absent from the checkpoint (unregistered-parameter
    quirk, model.py:246-248); it is initialized to the reference constructor
    constant 0.5.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    cp, cs = _conv_bn(sd, "convin")
    params["convin"] = cp
    stats["convin"] = cs

    for j in range(n_res):
        rp, rs = _resblock(sd, f"residual.{j}.block")
        params[f"residual_{j}"] = rp
        stats[f"residual_{j}"] = rs

    for scale in ("2x", "4x", "8x"):
        up_p, up_s = _conv_bn(sd, f"upscale{scale}", conv_idx=1, bn_idx=2)
        params[f"upscale{scale}"] = up_p
        stats[f"upscale{scale}"] = up_s

    for name in ("residual24", "residual48"):
        params[name] = {
            "conv1": {"kernel": _conv(sd[f"{name}.0.weight"])},
            "bn1": _bn_params(sd, f"{name}.1"),
            "conv2": {"kernel": _conv(sd[f"{name}.3.weight"])},
            "bn2": _bn_params(sd, f"{name}.4"),
        }
        stats[name] = {
            "bn1": _bn_stats(sd, f"{name}.1"),
            "bn2": _bn_stats(sd, f"{name}.4"),
        }

    params["conv_output"] = {"conv": {"kernel": _conv(sd["conv_output.0.weight"])}}

    if weightmap:
        for n in ("a1", "a2", "a3"):
            if n in sd:
                params[n] = _np(sd[n])
    else:
        params["a"] = _np(sd["a"]) if "a" in sd else np.array([0.5], np.float32)

    return {"params": params, "batch_stats": stats}


def convert_text_encoder(sd: Mapping, rnn_type: str = "LSTM") -> Dict[str, Any]:
    """DAMSM text_encoderN.pth (RNN_ENCODER, util.py:175-260) -> TextEncoder.

    Torch packs both directions into rnn.weight_*_l0[_reverse]; gate order
    (i,f,g,o for LSTM; r,z,n for GRU) is preserved by plain transposition.
    """
    params = {"embedding": _np(sd["encoder.weight"])}
    for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
        key = f"rnn.weight_ih_l0{suffix}"
        if key not in sd:
            continue
        params[f"w_ih_{d}"] = _np(sd[key]).T
        params[f"w_hh_{d}"] = _np(sd[f"rnn.weight_hh_l0{suffix}"]).T
        params[f"b_ih_{d}"] = _np(sd[f"rnn.bias_ih_l0{suffix}"])
        params[f"b_hh_{d}"] = _np(sd[f"rnn.bias_hh_l0{suffix}"])
    return {"params": params}


def convert_netg_low_stage1(sd: Mapping) -> Dict[str, Any]:
    """G_SR_NET_low_stage1 .pth (model.py:81-130) -> GSRNetLowStage1.

    Faithful detail: the reference declares self.up2 but its forward uses
    self.up1 for BOTH upsampling steps (model.py:116,123), so up2.* keys in
    the state dict are dead weights and are dropped here.
    """
    params: Dict[str, Any] = {}

    params["ca_net"] = {
        "fc": {"kernel": _dense(sd["ca_net.fc.weight"]),
               "bias": _np(sd["ca_net.fc.bias"])}
    }
    # shared up1: Sequential(conv3x3, LeakyReLU, upBlocknoBN)
    params["up1_conv"] = {"kernel": _conv(sd["up1.0.weight"])}
    params["up1_up"] = {"conv": {"kernel": _conv(sd["up1.2.1.weight"])}}

    # h_net1 = INIT_STAGE_GImgup(batchnorm=False): no BN anywhere
    h1: Dict[str, Any] = {
        "im2f_conv": {"kernel": _conv(sd["h_net1.im2f.0.weight"])},
        "att": {"conv_context": {
            "kernel": _np(sd["h_net1.att.conv_context.weight"])[:, :, 0, 0].T}},
        "upsample": {"conv": {"kernel": _conv(sd["h_net1.upsample.1.weight"])}},
    }
    j = 0
    while f"h_net1.residual.{j}.block.0.weight" in sd:
        h1[f"residual_{j}"] = {
            "conv1": {"kernel": _conv(sd[f"h_net1.residual.{j}.block.0.weight"])},
            "conv2": {"kernel": _conv(sd[f"h_net1.residual.{j}.block.2.weight"])},
        }
        j += 1
    params["h_net1"] = h1

    # h_net2/h_net3 = plain no-BN ResBlocks (block indices 0 and 2)
    for name in ("h_net2", "h_net3"):
        params[name] = {
            "conv1": {"kernel": _conv(sd[f"{name}.block.0.weight"])},
            "conv2": {"kernel": _conv(sd[f"{name}.block.2.weight"])},
        }
    for k in (1, 2, 3):
        params[f"img_net{k}"] = {
            "conv": {"kernel": _conv(sd[f"img_net{k}.img.0.weight"])}
        }
    return {"params": params}


def convert_netgh_sr_weight(sd: Mapping) -> Dict[str, Any]:
    """NetG_high_SR_weight .pth (model.py:301-336) -> NetGHighSRWeight.

    residual1 and residual alias ONE Sequential in the reference
    (model.py:312); only the `residual` key set loads."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for name in ("convin1", "convin"):
        p, s = _conv_bn(sd, name)
        params[name] = p
        stats[name] = s
    params["residual"] = {
        "conv1": {"kernel": _conv(sd["residual.0.weight"])},
        "bn1": _bn_params(sd, "residual.1"),
        "conv2": {"kernel": _conv(sd["residual.3.weight"])},
        "bn2": _bn_params(sd, "residual.4"),
    }
    stats["residual"] = {"bn1": _bn_stats(sd, "residual.1"),
                         "bn2": _bn_stats(sd, "residual.4")}
    up_p, up_s = _conv_bn(sd, "upscale2x", conv_idx=1, bn_idx=2)
    params["upscale2x"] = up_p
    stats["upscale2x"] = up_s
    cm_p, cm_s = _conv_bn(sd, "convmd")
    params["convmd_conv"] = cm_p["conv"]
    params["convmd_bn"] = cm_p["bn"]
    stats["convmd_bn"] = cm_s["bn"]
    params["conv_output"] = {"conv": {"kernel": _conv(sd["conv_output.0.weight"])}}
    if "a" in sd:
        params["a"] = _np(sd["a"])
    return {"params": params, "batch_stats": stats}


def convert_netg_low16(sd: Mapping) -> Dict[str, Any]:
    """models16 G_SR_NET_low .pth -> GSRNetLow16 variables.

    The torch state dict carries h_net2/h_net3/h_net4 (and img_net1..4) key
    sets that all alias ONE module (models16.py:13-14); only the h_net2 /
    img_net1 sets load (our module owns a single shared instance)."""
    out = convert_netg_low(sd, n_stages=2)  # ca_net + h_net1 + h_net2
    # x16 image heads are GET_IMAGE_G (shared, named img_net1 here)
    params = out["params"]
    params["img_net1"] = {
        "conv": {"kernel": _conv(sd["img_net1.img.0.weight"])}
    }
    params.pop("img_net2", None)
    return out


def convert_netgh_weight16(sd: Mapping, n_res: int = 6,
                           weightmap: bool = False,
                           keep_unused: bool = True) -> Dict[str, Any]:
    """models16 NetG_highweight .pth -> NetGHighWeight16 variables.

    The declared residual816/upscale16x params exist in the torch state
    dict but are never EXECUTED by the faithful (fix_bugs=False) module
    (models16.py:171-173 reuse residual48/upscale8x instead). They are
    still CARRIED by default: the fix_bugs=True module consumes them, and
    export_torch's bit-exact round trip re-emits them. Pass
    keep_unused=False when the tree must structurally match a
    fix_bugs=False `module.init` template (orbax StandardRestore, optax
    state built from init) — flax `apply` itself ignores the extras."""
    out = convert_netgh_weight(sd, n_res=n_res, weightmap=weightmap)
    params, stats = out["params"], out["batch_stats"]
    unused = () if keep_unused else ("residual816", "upscale16x")
    for name, ckpt_prefix in (("residual816", "residual816"),):
        if name in unused:
            continue
        if f"{ckpt_prefix}.0.weight" in sd:
            params[name] = {
                "conv1": {"kernel": _conv(sd[f"{ckpt_prefix}.0.weight"])},
                "bn1": _bn_params(sd, f"{ckpt_prefix}.1"),
                "conv2": {"kernel": _conv(sd[f"{ckpt_prefix}.3.weight"])},
                "bn2": _bn_params(sd, f"{ckpt_prefix}.4"),
            }
            stats[name] = {"bn1": _bn_stats(sd, f"{ckpt_prefix}.1"),
                           "bn2": _bn_stats(sd, f"{ckpt_prefix}.4")}
    if "upscale16x.1.weight" in sd and "upscale16x" not in unused:
        up_p, up_s = _conv_bn(sd, "upscale16x", conv_idx=1, bn_idx=2)
        params["upscale16x"] = up_p
        stats["upscale16x"] = up_s
    if weightmap:
        for n in ("a1", "a2", "a3", "a4"):
            if n in sd:
                params[n] = _np(sd[n])
    return out


def convert_cnn_encoder(sd: Mapping, nef: int = 256) -> Dict[str, Any]:
    """CNN_ENCODER state dict (util.py:263-368; backbone keys are the
    torchvision inception_v3 names like Mixed_5b.branch1x1.{conv,bn}.*) ->
    tgsr_tpu CNNEncoder variables.

    Also accepts a bare torchvision inception_v3 zoo checkpoint (then only
    the backbone converts; heads stay to be initialized).
    """
    params: Dict[str, Any] = {"inception": {}}
    stats: Dict[str, Any] = {"inception": {}}

    # group backbone keys by module path (everything up to .conv/.bn)
    for k in sd:
        if not (".conv.weight" in k or ".bn.weight" in k):
            continue
        if k.startswith(("emb_features", "emb_cnn_code", "fc.", "AuxLogits")):
            continue
        mod_path = k.rsplit(".", 2)[0]  # e.g. Mixed_5b.branch1x1
        parts = mod_path.split(".")
        p = params["inception"]
        s = stats["inception"]
        for part in parts[:-1]:
            p = p.setdefault(part, {})
            s = s.setdefault(part, {})
        leaf = parts[-1]
        if k.endswith(".conv.weight"):
            p.setdefault(leaf, {})["conv"] = {"kernel": _conv(sd[k])}
        else:  # .bn.weight
            prefix = mod_path + ".bn"
            p.setdefault(leaf, {})["bn"] = _bn_params(sd, prefix)
            s.setdefault(leaf, {})["bn"] = _bn_stats(sd, prefix)

    if "emb_features.weight" in sd:
        w = _np(sd["emb_features.weight"])  # [nef, 768, 1, 1]
        params["emb_features"] = {"kernel": w[:, :, 0, 0].T}
        params["emb_cnn_code"] = {
            "kernel": _dense(sd["emb_cnn_code.weight"]),
            "bias": _np(sd["emb_cnn_code.bias"]),
        }
    return {"params": params, "batch_stats": stats}


def paired_path(path: str, a: str, b: str) -> str:
    """The reference's checkpoint-pairing convention: the companion file
    is named by substituting `a`->`b` in the BASENAME only (netG->netGH,
    trainer_objective.py:91-93; text_encoder->image_encoder,
    pretrain_DAMSM.py:177-179). A directory component containing `a`
    must not be rewritten."""
    d, base = os.path.split(path)
    return os.path.join(d, base.replace(a, b))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict into numpy (torch CPU available in this env)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


def load_generator_pair(cfg, netg_path: str, netgh_path: str = None):
    """Family-aware netG/netGH loading (ONE implementation of the
    reference's BRANCH_NUM==4 -> model.py else models16 switch,
    trainer_objective.py:74-88, incl. the netG->netGH name substitution
    at :91-93 and the weightmap flag). Returns (netg_vars, netgh_vars).

    .pth paths run the torch converters; .msgpack paths (cli.train_gan's
    own netG_it*/netGH_it* snapshots) load directly — so the eval CLI and
    warm-start consume this framework's trained checkpoints too."""
    if netgh_path is None:
        netgh_path = paired_path(netg_path, "netG", "netGH")
    if netg_path.endswith(".msgpack"):
        from tgsr_tpu.checkpoints.io import load_variables

        return load_variables(netg_path), load_variables(netgh_path)
    if cfg.TREE.BRANCH_NUM == 4:
        gv = convert_netg_low(load_torch_state_dict(netg_path),
                              n_stages=cfg.n_stages)
        ghv = convert_netgh_weight(load_torch_state_dict(netgh_path),
                                   weightmap=cfg.EVAL.WEIGHTMAP)
    else:
        gv = convert_netg_low16(load_torch_state_dict(netg_path))
        ghv = convert_netgh_weight16(load_torch_state_dict(netgh_path),
                                     weightmap=cfg.EVAL.WEIGHTMAP)
    return gv, ghv
