"""Shipped trained artifacts and NET_E resolution.

The reference's eval path REQUIRES a trained DAMSM text encoder
(trainer_objective.py:62-67 loads cfg NET_E), but the snapshot ships no
NET_E weights — the rebuild's CLIs used to silently fall back to a
seeded-random init, so out of the box the generator's attention was
conditioned on noise. Round 5 ships a trained face NET_E
(examples/train_shipped_net_e.py: the pretrain_DAMSM.py protocol on the
21 real testset.txt captions at the largest in-env scale) and the CLIs
auto-load it when no other source is given.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

_HERE = os.path.dirname(os.path.abspath(__file__))


def shipped_net_e(vocab_size: int) -> Optional[str]:
    """Path to the shipped trained face NET_E when one matches
    `vocab_size`, else None. The .json sidecar carries the training
    recipe and final retrieval metrics."""
    path = os.path.join(_HERE, "face_net_e_s8.msgpack")
    meta_path = path.replace(".msgpack", ".json")
    if not (os.path.isfile(path) and os.path.isfile(meta_path)):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("vocab_size") != vocab_size:
        return None
    return path


def resolve_net_e(cfg, explicit: str, vocab_size: int,
                  seeded: bool = False) -> Tuple[Optional[str], str]:
    """Resolve the text-encoder source for an eval/serve CLI.

    Priority (returns (path_or_None, human-readable source)):
      1. `seeded=True` (--seeded-text): None — the seeded-init parity
         protocol (both sides of tests/test_generator_parity.py use it);
      2. `explicit` (--text_encoder): the user's file;
      3. cfg.TRAIN.NET_E when set and present on disk (the reference's
         config contract, cfg/eval_faceSR_attn2.yml NET_E);
      4. the shipped trained face NET_E when its vocab matches;
      5. None — seeded fallback (warned at the call site).
    """
    if seeded:
        return None, "seeded (--seeded-text)"
    if explicit:
        return explicit, f"--text_encoder {explicit}"
    cfg_path = getattr(getattr(cfg, "TRAIN", None), "NET_E", "") or ""
    if cfg_path:
        if os.path.exists(cfg_path):
            return cfg_path, f"cfg NET_E {cfg_path}"
        print(f"[net_e] cfg NET_E {cfg_path!r} not found on disk; "
              "falling through", flush=True)
    shipped = shipped_net_e(vocab_size)
    if shipped:
        return shipped, f"shipped trained NET_E ({shipped})"
    return None, "seeded init (no NET_E source available)"
