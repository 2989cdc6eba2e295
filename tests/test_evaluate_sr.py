"""evaluate_sr (engine/evaluator.py): the batched HR->degrade->SR->
Y-PSNR/SSIM protocol harness — previously only exercised indirectly."""

import numpy as np

from tests.test_serving import build_small_pipe
from tgsr_tpu.engine.evaluator import evaluate_sr


def _batches(n_batches, b, size, T=18, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n_batches):
        caps = np.zeros((b, T), np.int32)
        lens = rng.integers(2, 8, b).astype(np.int32)
        for j in range(b):
            caps[j, : lens[j]] = rng.integers(1, 41, lens[j])
        yield {
            "hr": rng.integers(0, 256, (b, size, size, 3)).astype(np.uint8),
            "captions": caps,
            "cap_lens": lens,
        }


def test_evaluate_sr_protocol():
    pipe = build_small_pipe()  # 16 -> 128 (x8)
    res = evaluate_sr(pipe, _batches(3, 2, 128))
    assert res["images"] == 6
    # random-init generator vs random HR: metrics are finite and in the
    # physically-possible band
    assert 0.0 < res["psnr_y"] < 60.0
    assert -1.0 <= res["ssim_y"] <= 1.0
    assert res["images_per_sec_host_e2e"] > 0

    # deterministic across identical runs (eval-mode pipeline, fixed data)
    res2 = evaluate_sr(pipe, _batches(3, 2, 128))
    assert res2["psnr_y"] == res["psnr_y"]
    assert res2["ssim_y"] == res["ssim_y"]


def test_evaluate_sr_max_images_and_empty():
    pipe = build_small_pipe()
    res = evaluate_sr(pipe, _batches(5, 2, 128), max_images=4)
    assert res["images"] == 4
    empty = evaluate_sr(pipe, iter(()))
    assert empty["images"] == 0 and np.isnan(empty["psnr_y"])
