"""The reconstructed configs/ (the reference's test1.py:29-38 defaults to
coco/flower/div2k eval YAMLs that its snapshot never shipped, and it has
no training config at all) must load under the strict schema with the
intended geometry."""

import glob
import os

import pytest

from tgsr_tpu.config import config_from_file

CONFIGS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "configs", "*.yml")))


def test_configs_exist():
    names = {os.path.basename(p) for p in CONFIGS}
    assert {"eval_cocoSR_attn2.yml", "eval_flowerSR_attn2.yml",
            "eval_div2kSR_attn2.yml", "train_faceSR_S8.yml",
            "train_faceSR_S16.yml"} <= names


@pytest.mark.parametrize("path", CONFIGS, ids=os.path.basename)
def test_config_loads_strict(path):
    cfg = config_from_file(path)
    assert cfg.TREE.BASE_SIZE * cfg.scale == cfg.imsize
    assert cfg.GAN.GF_DIM == 32  # shipped-pipeline generator width


def test_geometry_contracts():
    by_name = {os.path.basename(p): config_from_file(p) for p in CONFIGS}
    # coco test path hardcodes scale 4 (datasets.py:1548)
    assert by_name["eval_cocoSR_attn2.yml"].scale == 4
    assert by_name["eval_flowerSR_attn2.yml"].scale == 8
    assert by_name["eval_div2kSR_attn2.yml"].B_VALIDATION is True
    s8 = by_name["train_faceSR_S8.yml"]
    assert s8.TRAIN.FLAG is True and s8.scale == 8
    s16 = by_name["train_faceSR_S16.yml"]
    assert s16.scale == 16 and s16.METHOD == "S16"
    assert s16.TRAIN.SMOOTH.GAMMA1 == 4.0
