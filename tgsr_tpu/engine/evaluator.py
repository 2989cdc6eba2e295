"""Batched evaluation harness.

The reference has no metrics script -- psnr/rgb2y helpers exist
(trainer_objective.py:168-181) but nothing calls them. This harness runs the
full on-device protocol: HR -> (antialiased) LR degrade -> SR -> Y-channel
PSNR + SSIM vs HR, batched and jitted, over a dataset.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.engine.inference import SRPipeline
from tgsr_tpu.ops.image import (
    denormalize_to_uint8,
    normalize_uint8,
    psnr_batch,
    resize,
    rgb2y,
    ssim,
)


@jax.jit
def _rank_sims(image_features, cnn_codes, words_embs, sent_embs, cap_lens,
               g1, g2, g3):
    """One jitted program for the similarity matrices: eager jnp ops on
    the axon TPU pay a remote-compile round trip EACH (CLAUDE.md), so the
    device math must not run op-by-op. gammas are traced operands — no
    recompile when they change."""
    from tgsr_tpu.losses.damsm import sent_similarity, words_similarity

    w_sim = words_similarity(image_features, words_embs, cap_lens, g1, g2)
    s_sim = sent_similarity(cnn_codes, sent_embs, g3)
    return w_sim, s_sim


def rank_r_precision(
    image_features: jax.Array,  # [N, R, E] DAMSM region features
    cnn_codes: jax.Array,  # [N, E] global image codes
    words_embs: jax.Array,  # [N, T, E]
    sent_embs: jax.Array,  # [N, E]
    cap_lens: jax.Array,  # [N]
    gammas=(4.0, 5.0, 10.0),
    top_k: int = 1,
) -> Dict[str, float]:
    """DAMSM retrieval ranking over generated results (the
    TextSRGTDataset use-case, datasets.py:1721-1885): for each image, rank
    all captions by the word- and sentence-level DAMSM similarity; R@k =
    fraction whose own caption ranks in the top k."""
    w_sim, s_sim = jax.tree.map(
        np.asarray, _rank_sims(image_features, cnn_codes, words_embs,
                               sent_embs, cap_lens,
                               jnp.float32(gammas[0]), jnp.float32(gammas[1]),
                               jnp.float32(gammas[2])))
    n = w_sim.shape[0]

    def r_at_k(sim):  # [img, caption] numpy: ranking is host work
        order = np.argsort(-sim, axis=1)[:, :top_k]
        hit = (order == np.arange(n)[:, None]).any(axis=1)
        return float(np.mean(hit.astype(np.float32)))

    return {
        f"word_r@{top_k}": r_at_k(w_sim),
        f"sent_r@{top_k}": r_at_k(s_sim),
        "n": n,
    }


@functools.lru_cache(maxsize=None)
def _eval_degrade(scale: int):
    """Per-scale jitted degrade, cached at module level: a fresh closure
    per evaluate_sr call would miss jax's jit cache every time — on the
    remote-compile stack that is tens of seconds of recompiles per call
    (and it pollutes the first batch's host-e2e timing)."""
    @jax.jit
    def degrade(hr_uint8):
        hr = normalize_uint8(hr_uint8)
        h, w = hr.shape[1:3]
        return resize(hr, (h // scale, w // scale), "bilinear")

    return degrade


@functools.lru_cache(maxsize=None)
def _eval_metrics():
    @jax.jit
    def metrics_fn(sr, hr_uint8):
        sr8 = denormalize_to_uint8(sr)
        y_sr = rgb2y(sr8).astype(jnp.float32)[..., None]
        y_hr = rgb2y(hr_uint8).astype(jnp.float32)[..., None]
        return psnr_batch(y_sr, y_hr), ssim(y_sr, y_hr)

    return metrics_fn


def evaluate_sr(
    pipeline: SRPipeline,
    batches: Iterable[Dict[str, np.ndarray]],
    scale: Optional[int] = None,
    max_images: Optional[int] = None,
) -> Dict[str, float]:
    """Runs the eval protocol over host batches ({hr uint8, captions,
    cap_lens, ...}) and aggregates Y-channel PSNR (BT.601, the reference's
    metric definition) + SSIM + throughput.

    Timing note: `images_per_sec_host_e2e` is a HOST end-to-end number
    (includes per-batch host sync, degrade, and metric fetch) — it is NOT a
    chip-throughput figure. Chip numbers must use the in-graph checksum
    methodology (bench.py / docs/PERF.md)."""
    import time

    scale = scale or pipeline.cfg.scale
    degrade = _eval_degrade(scale)
    metrics_fn = _eval_metrics()

    psnrs: List[float] = []
    ssims: List[float] = []
    n = 0
    t0 = time.perf_counter()
    for batch in batches:
        hr = jnp.asarray(batch["hr"])
        lr = degrade(hr)
        out = pipeline(lr, batch["captions"], batch["cap_lens"])
        p, s = metrics_fn(out["sr"], hr)
        psnrs.extend(np.asarray(p).tolist())
        ssims.extend(np.asarray(s).tolist())
        n += hr.shape[0]
        if max_images and n >= max_images:
            break
    dt = time.perf_counter() - t0
    return {
        "psnr_y": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim_y": float(np.mean(ssims)) if ssims else float("nan"),
        "images": n,
        "images_per_sec_host_e2e": n / dt if dt > 0 else float("nan"),
    }
