"""Import the read-only reference PyTorch code as a numerical oracle.

The reference requires easydict + torchvision (absent here) and calls
`.cuda()` unconditionally at module-construction time (model.py:237-248), so
this helper stubs those out before import. Used ONLY by parity tests; no
reference code is vendored into tgsr_tpu.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"

_loaded = {}


def _install_stubs():
    if "easydict" not in sys.modules:
        easydict = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, d=None, **kwargs):
                super().__init__()
                d = dict(d or {}, **kwargs)
                for k, v in d.items():
                    self[k] = v

            def __setitem__(self, k, v):
                if isinstance(v, dict) and not isinstance(v, EasyDict):
                    v = EasyDict(v)
                super().__setitem__(k, v)
                super().__setattr__(k, v)

            __setattr__ = __setitem__

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        easydict.EasyDict = EasyDict
        sys.modules["easydict"] = easydict

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models

    # CPU-safe .cuda()
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def load_reference_utils(font_path: str):
    """Import the reference miscc/utils.py (visualization layer) with its
    two unportable dependencies redirected: `skimage.transform` (not
    installed) delegates to tgsr_tpu.utils.skimage_compat, and the
    hardcoded Windows FreeMono path (miscc/utils.py:36) resolves to
    `font_path`. Both substitutions are shared with the tgsr_tpu side, so
    oracle diffs exercise everything else exactly."""
    load_reference()
    if "skimage" not in sys.modules:
        from tgsr_tpu.utils import skimage_compat

        sk = types.ModuleType("skimage")
        sk.transform = types.ModuleType("skimage.transform")
        sk.transform.resize = skimage_compat.resize
        sk.transform.pyramid_expand = skimage_compat.pyramid_expand
        sys.modules["skimage"] = sk
        sys.modules["skimage.transform"] = sk.transform
    import miscc.utils as ref_utils
    from PIL import ImageFont

    # Redirect the hardcoded Windows font path in the REFERENCE MODULE'S
    # namespace only (miscc/utils.py imports ImageFont into its own
    # globals); patching PIL process-wide would leak into unrelated tests.
    ref_utils.ImageFont = types.SimpleNamespace(
        truetype=lambda path, size=10, *a, **k: ImageFont.truetype(
            font_path, size, *a, **k))

    return ref_utils


def load_reference():
    """Returns a dict of reference modules {model, util, GlobalAttention,
    losses, config} with cfg merged from the face eval YAML."""
    if _loaded:
        return _loaded
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    from miscc.config import cfg  # noqa

    # Apply cfg/eval_faceSR_attn2.yml values (yaml.load w/o Loader breaks on
    # PyYAML>=6, so set the fields directly).
    cfg.METHOD = "S8"
    cfg.TREE.BRANCH_NUM = 4
    cfg.TREE.BASE_SIZE = 32
    cfg.DATASET_NAME = "face"
    cfg.B_VALIDATION = True
    cfg.TRAIN.FLAG = False
    cfg.TRAIN.BATCH_SIZE = 1
    cfg.GAN.DF_DIM = 64
    cfg.GAN.GF_DIM = 32
    cfg.GAN.Z_DIM = 100
    cfg.GAN.R_NUM = 2
    cfg.TEXT.EMBEDDING_DIM = 256
    cfg.TEXT.CAPTIONS_PER_IMAGE = 1
    cfg.CUDA = False

    import GlobalAttention
    import util
    import model

    _loaded.update(
        dict(cfg=cfg, GlobalAttention=GlobalAttention, util=util, model=model)
    )
    return _loaded
