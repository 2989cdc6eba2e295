"""BatchingServer: request coalescing, planned shapes, parity with the
direct pipeline path (engine/serving.py — the production front-end the
reference's per-image loop lacks, trainer_objective.py:55-165)."""

import dataclasses
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.config import Config
from tgsr_tpu.engine.inference import SRPipeline
from tgsr_tpu.engine.serving import BatchingServer
from tgsr_tpu.models.generator import GSRNetLow
from tgsr_tpu.models.generator_hf import NetGHighWeight
from tgsr_tpu.models.text_encoder import TextEncoder


def build_small_pipe():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=16),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=32),
    )
    vocab, T, B = 41, 18, 2
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.ones((B, T), jnp.int32)
    lens = jnp.full((B,), 5, jnp.int32)
    tv = enc.init(k, caps, lens)
    words, sent = enc.apply(tv, caps, lens)
    lr = jax.random.normal(k, (B, 16, 16, 3)) * 0.3
    netg = GSRNetLow(ngf=32, n_stages=3)
    gv = netg.init(k, lr, sent, words, caps == 0)
    fake, *_ = netg.apply(gv, lr, sent, words, caps == 0)
    netgh = NetGHighWeight(ngf=32, low="lr", sizes=(32, 64, 128))
    ghv = netgh.init(k, lr, fake, lr)
    return SRPipeline(cfg, vocab, tv, gv, ghv)


@pytest.fixture(scope="module")
def small_pipe():
    return build_small_pipe()


def _requests(n, T=18, seed=0):
    rng = np.random.default_rng(seed)
    lrs = rng.normal(0, 0.3, (n, 16, 16, 3)).astype(np.float32)
    caps = np.zeros((n, T), np.int32)
    lens = rng.integers(2, 8, n).astype(np.int32)
    for i in range(n):
        caps[i, : lens[i]] = rng.integers(1, 41, lens[i])
    return lrs, caps, lens


def test_serving_matches_direct_path(small_pipe):
    lrs, caps, lens = _requests(10)
    direct = small_pipe.sr_uint8(lrs, caps, lens)
    with BatchingServer(small_pipe, max_batch=4, max_delay_ms=10) as srv:
        futs = [srv.submit(lrs[i], caps[i], lens[i]) for i in range(10)]
        outs = [f.result(timeout=120) for f in futs]
    for i, o in enumerate(outs):
        assert o.shape == (128, 128, 3) and o.dtype == np.uint8
        # eval-mode BN => row results are batch-independent; padded
        # serving batches must reproduce the direct batched path exactly
        np.testing.assert_array_equal(o, direct[i], err_msg=f"row {i}")
    st = srv.stats
    assert st["requests"] == 10
    assert set(st["batch_hist"]) <= {1, 2, 4}
    assert srv.latency_percentiles()["p50_ms"] > 0


def test_serving_concurrent_submitters(small_pipe):
    lrs, caps, lens = _requests(12, seed=1)
    results = {}
    with BatchingServer(small_pipe, max_batch=8, max_delay_ms=5) as srv:
        def worker(i):
            results[i] = srv.submit(lrs[i], caps[i], lens[i]).result(
                timeout=120)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    direct = small_pipe.sr_uint8(lrs, caps, lens)
    for i in range(12):
        np.testing.assert_array_equal(results[i], direct[i])


def test_serving_rejects_bad_requests_and_close(small_pipe):
    srv = BatchingServer(small_pipe, max_batch=2, max_delay_ms=1)
    bad_lr = srv.submit(np.zeros((16, 16)), np.zeros(18, np.int32), 2)
    with pytest.raises(ValueError):
        bad_lr.result(timeout=5)
    bad_cap = srv.submit(np.zeros((16, 16, 3), np.float32),
                         np.zeros(7, np.int32), 2)
    with pytest.raises(ValueError):
        bad_cap.result(timeout=5)
    # requests already queued at close() time are still served
    lrs, caps, lens = _requests(3, seed=2)
    futs = [srv.submit(lrs[i], caps[i], lens[i]) for i in range(3)]
    srv.close()
    for f in futs:
        assert f.result(timeout=120).shape == (128, 128, 3)
    with pytest.raises(RuntimeError):
        srv.submit(lrs[0], caps[0], lens[0]).result(timeout=5)


def test_planned_sizes_validation(small_pipe):
    with pytest.raises(ValueError):
        BatchingServer(small_pipe, max_batch=8, planned_sizes=[2, 4])
    with pytest.raises(ValueError):
        BatchingServer(small_pipe, max_batch=0)


def test_serving_shape_pinning_keeps_collector_alive(small_pipe):
    """A mismatched-lr request must be rejected at submit (the batch
    np.stack would otherwise kill the collector thread and strand every
    later request — round-3 review finding)."""
    lrs, caps, lens = _requests(4)
    with BatchingServer(small_pipe, max_batch=4, max_delay_ms=5) as srv:
        ok0 = srv.submit(lrs[0], caps[0], lens[0])
        bad = srv.submit(np.zeros((32, 32, 3), np.float32), caps[1], lens[1])
        with pytest.raises(ValueError):
            bad.result(timeout=5)
        # the collector survived: later same-shape requests still serve
        ok1 = srv.submit(lrs[1], caps[1], lens[1])
        assert ok0.result(timeout=120).shape == (128, 128, 3)
        assert ok1.result(timeout=120).shape == (128, 128, 3)


def test_serving_cancelled_future_does_not_kill_batch(small_pipe):
    """A rider cancelled while pending must neither wedge the collector
    (set_result on a cancelled Future raises InvalidStateError — the
    dispatch claims riders via set_running_or_notify_cancel first) nor
    be counted as processed; the live riders resolve normally and a
    claimed future can no longer be cancelled."""
    lrs, caps, lens = _requests(3, seed=3)
    with BatchingServer(small_pipe, max_batch=4, max_delay_ms=50) as srv:
        f0 = srv.submit(lrs[0], caps[0], lens[0])
        f1 = srv.submit(lrs[1], caps[1], lens[1])
        f1.cancel()  # a bare Future cancels while pending
        f2 = srv.submit(lrs[2], caps[2], lens[2])
        assert f0.result(timeout=120).shape == (128, 128, 3)
        assert f2.result(timeout=120).shape == (128, 128, 3)
        assert f1.cancelled()
        assert not f0.cancel()  # resolved/claimed: cancel can't take it
    snap = srv.stats_snapshot()
    # the cancelled rider was dropped at dispatch, not processed
    assert snap["requests"] == 2 and snap["batches"] >= 1
