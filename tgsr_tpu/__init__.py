"""TGSR-TPU: TPU-native text-guided super-resolution framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of cxm12/TGSR
("Rethinking Super-Resolution as Text-Guided Details Generation").

Layer map (mirrors reference layering, re-designed TPU-first):
  config    -- typed config tree (= miscc/config.py YAML schema)
  ops       -- reusable blocks + attention kernels (= util.py L1 + GlobalAttention.py)
  models    -- encoders / generators / discriminators (= util.py L2, model.py, models16.py)
  data      -- tokenizer, datasets, on-device preprocessing (= datasets.py)
  losses    -- DAMSM / GAN / pixel / KL loss families (= miscc/losses.py)
  engine    -- inference + training drivers (= test1.py, pretrain_DAMSM.py, trainer_objective.py)
  parallel  -- device mesh + sharding helpers (new; reference is single-GPU)
  checkpoints -- orbax-style IO + torch .pth converter
"""

__version__ = "0.1.0"

from tgsr_tpu.config import Config, config_from_file, default_config  # noqa: F401
