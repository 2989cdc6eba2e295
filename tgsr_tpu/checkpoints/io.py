"""Checkpoint IO.

The reference snapshots raw torch state dicts and pairs files by name
substitution (pretrain_DAMSM.py:286-292, trainer_objective.py:91-93). Here
variable trees are serialized with flax msgpack (single-file, host-agnostic);
the training engines additionally use orbax for async checkpointing of full
train states (see tgsr_tpu/engine).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    variables = jax.tree.map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))


def load_variables(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
