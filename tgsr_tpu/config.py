"""Typed configuration tree.

Mirrors the reference YAML schema (miscc/config.py:10-67) with the same keys,
defaults and strict merge semantics (unknown key -> KeyError, type mismatch ->
ValueError; miscc/config.py:70-100), but as frozen dataclasses instead of a
mutable module-global easydict. Module-level hardcoded flags from the
reference (test1.py:22-24, trainer_objective.py:56-58, GlobalAttention.py:25,
model.py:5) are promoted to explicit EVAL fields.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict


@dataclass
class TreeConfig:
    # Number of pyramid branches; image pyramid = BASE_SIZE * 2^(BRANCH_NUM-1)
    # (test1.py:183).  4 => x8 SR, 5 => x16 SR.
    BRANCH_NUM: int = 5
    BASE_SIZE: int = 64


@dataclass
class SmoothConfig:
    GAMMA1: float = 5.0
    GAMMA2: float = 5.0
    GAMMA3: float = 10.0
    LAMBDA: float = 1.0


@dataclass
class TrainConfig:
    BATCH_SIZE: int = 64
    MAX_EPOCH: int = 600
    SNAPSHOT_INTERVAL: int = 2000
    DISCRIMINATOR_LR: float = 2e-4
    GENERATOR_LR: float = 2e-4
    ENCODER_LR: float = 2e-4
    RNN_GRAD_CLIP: float = 0.25
    FLAG: bool = False
    NET_E: str = ""
    NET_G: str = ""
    B_NET_D: bool = True
    SMOOTH: SmoothConfig = field(default_factory=SmoothConfig)


@dataclass
class GanConfig:
    DF_DIM: int = 64
    GF_DIM: int = 128
    Z_DIM: int = 100
    CONDITION_DIM: int = 100
    R_NUM: int = 2
    B_ATTENTION: bool = True
    B_DCGAN: bool = False


@dataclass
class TextConfig:
    CAPTIONS_PER_IMAGE: int = 10
    EMBEDDING_DIM: int = 256
    WORDS_NUM: int = 18


@dataclass
class EvalConfig:
    """Flags hardcoded at module level in the reference, promoted to config."""

    # trainer_objective.py:56-58
    STAGE1: bool = False
    INPUT_NETGH: str = "lr"  # 'lr' | 'lrblur' | 'lr-lrblur'
    WEIGHTMAP: bool = False
    # test1.py:22-24
    NO_STOPWORD: bool = False
    ONLY_COLOR: bool = False
    # number of eval images (trainer_objective.py:60)
    TEXT_BATCH_NUM: int = 100


@dataclass
class Config:
    METHOD: str = "S16"
    DATASET_NAME: str = "birds"
    CONFIG_NAME: str = ""
    DATA_DIR: str = ""
    DATA_DIRIM: str = ""
    GPU_ID: int = 0
    CUDA: bool = True  # kept for YAML compatibility; ignored on TPU
    WORKERS: int = 6
    RNN_TYPE: str = "LSTM"  # 'LSTM' | 'GRU'
    B_VALIDATION: bool = False
    TREE: TreeConfig = field(default_factory=TreeConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    GAN: GanConfig = field(default_factory=GanConfig)
    TEXT: TextConfig = field(default_factory=TextConfig)
    EVAL: EvalConfig = field(default_factory=EvalConfig)

    # ---- derived geometry ----
    @property
    def scale(self) -> int:
        """SR scale factor: 2^(BRANCH_NUM-1) (test1.py:183 geometry)."""
        return 2 ** (self.TREE.BRANCH_NUM - 1)

    @property
    def imsize(self) -> int:
        """Final output resolution."""
        return self.TREE.BASE_SIZE * self.scale

    @property
    def n_stages(self) -> int:
        """Number of generator stages = BRANCH_NUM - 1 (each stage x2-ups)."""
        return self.TREE.BRANCH_NUM - 1

    def pyramid_sizes(self) -> list:
        """[64, 128, 256] for face S8 (BASE_SIZE=32, BRANCH_NUM=4)."""
        return [self.TREE.BASE_SIZE * 2 ** (i + 1) for i in range(self.n_stages)]


def _merge_dict(src: Dict[str, Any], dst: Any, path: str = "") -> Any:
    """Strict recursive merge of a YAML dict over a dataclass tree.

    Same contract as miscc/config.py:70-100: unknown keys raise KeyError,
    mismatched types raise ValueError (int->float promotion is allowed since
    YAML integers for float fields are common).
    """
    if not dataclasses.is_dataclass(dst):
        raise ValueError(f"cannot merge into non-dataclass at {path}")
    names = {f.name: f for f in dataclasses.fields(dst)}
    updates = {}
    for k, v in src.items():
        if k not in names:
            raise KeyError(f"{path}{k} is not a valid config key")
        old = getattr(dst, k)
        if dataclasses.is_dataclass(old):
            if not isinstance(v, dict):
                raise ValueError(f"Type mismatch for config key {path}{k}")
            updates[k] = _merge_dict(v, old, path=f"{path}{k}.")
        else:
            if isinstance(old, bool) != isinstance(v, bool) and (
                isinstance(old, bool) or isinstance(v, bool)
            ):
                raise ValueError(f"Type mismatch for config key {path}{k}")
            if isinstance(old, float) and isinstance(v, int):
                v = float(v)
            if type(old) is not type(v):
                raise ValueError(
                    f"Type mismatch ({type(old)} vs {type(v)}) for config key {path}{k}"
                )
            updates[k] = v
    return dataclasses.replace(dst, **updates)


def default_config() -> Config:
    return Config()


def config_from_dict(d: Dict[str, Any], base: Config | None = None) -> Config:
    return _merge_dict(d, base if base is not None else Config())


def config_from_file(path: str, base: Config | None = None) -> Config:
    """Load YAML and merge over defaults (= miscc/config.py:103-109)."""
    import yaml

    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    return config_from_dict(raw or {}, base)


def config_to_dict(cfg: Config) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def enable_compile_cache(path: str = "") -> bool:
    """Opt into JAX's persistent compilation cache (first jit of the big
    fused programs costs 20-40 s on TPU; subsequent processes reuse the
    cache). Call before the first jit, or set TGSR_COMPILE_CACHE=<dir>
    and the CLIs call this at startup. Returns True if enabled."""
    import os

    path = path or os.environ.get("TGSR_COMPILE_CACHE", "")
    if not path:
        return False
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
