import os

import pytest

from tgsr_tpu.config import Config, config_from_dict, config_from_file


def test_defaults_match_reference():
    # = miscc/config.py:10-67 defaults
    cfg = Config()
    assert cfg.METHOD == "S16"
    assert cfg.TREE.BRANCH_NUM == 5
    assert cfg.TREE.BASE_SIZE == 64
    assert cfg.GAN.GF_DIM == 128
    assert cfg.GAN.DF_DIM == 64
    assert cfg.GAN.Z_DIM == 100
    assert cfg.GAN.CONDITION_DIM == 100
    assert cfg.GAN.R_NUM == 2
    assert cfg.TEXT.EMBEDDING_DIM == 256
    assert cfg.TEXT.WORDS_NUM == 18
    assert cfg.TRAIN.SMOOTH.GAMMA1 == 5.0
    assert cfg.TRAIN.SMOOTH.GAMMA3 == 10.0
    assert cfg.TRAIN.RNN_GRAD_CLIP == 0.25
    assert cfg.RNN_TYPE == "LSTM"


def test_strict_merge_unknown_key():
    with pytest.raises(KeyError):
        config_from_dict({"NOT_A_KEY": 1})


def test_strict_merge_type_mismatch():
    with pytest.raises(ValueError):
        config_from_dict({"TREE": {"BRANCH_NUM": "four"}})


def test_eval_face_yaml():
    path = "/root/reference/cfg/eval_faceSR_attn2.yml"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cfg = config_from_file(path)
    assert cfg.METHOD == "S8"
    assert cfg.TREE.BRANCH_NUM == 4
    assert cfg.TREE.BASE_SIZE == 32
    assert cfg.GAN.GF_DIM == 32
    assert cfg.TRAIN.BATCH_SIZE == 1
    assert cfg.GAN.CONDITION_DIM == 100  # default kept (not in YAML)
    assert cfg.scale == 8
    assert cfg.imsize == 256
    assert cfg.pyramid_sizes() == [64, 128, 256]
    assert cfg.n_stages == 3


def test_damsm_face_yaml():
    path = "/root/reference/cfg/DAMSM/face.yml"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cfg = config_from_file(path)
    assert cfg.TREE.BRANCH_NUM == 1
    assert cfg.TREE.BASE_SIZE == 299
    assert cfg.TRAIN.SMOOTH.GAMMA1 == 4.0


def test_eval_bird_yaml():
    path = "/root/reference/cfg/eval_birdSR_attn2.yml"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cfg = config_from_file(path)
    assert cfg.DATASET_NAME == "birds"
    assert cfg.TREE.BRANCH_NUM == 4
    assert cfg.TREE.BASE_SIZE == 32
    assert cfg.TEXT.CAPTIONS_PER_IMAGE == 10
    assert cfg.scale == 8
