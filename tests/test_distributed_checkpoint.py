"""Distributed checkpointing: sharded train state save/restore.

Production contract on a mesh: (1) a sharded state checkpoints and
restores with VALUES intact and PLACEMENT as requested by the restore
template (orbax StandardRestore honors ShapeDtypeStruct shardings);
(2) training resumed from the restored sharded state is bit-identical to
the uninterrupted sharded run; (3) checkpoints are topology-portable —
a state saved unsharded restores straight onto a DP/TP mesh layout.
The reference has no checkpoint-resume at all beyond filename parsing
(pretrain_DAMSM.py:182-185) and no multi-device anything (SURVEY.md 2.11).
"""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgsr_tpu.config import Config
from tgsr_tpu.engine.gan_trainer import GANTrainer
from tgsr_tpu.models.text_encoder import TextEncoder
from tgsr_tpu.checkpoints.orbax_io import (restore_train_state,
                                           save_train_state)


def _setup(mesh, B=8):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16, DF_DIM=16),
    )
    vocab, T = 12, 18
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.ones((B, T), jnp.int32).at[:, 6:].set(0)
    lens = jnp.full((B,), 6, jnp.int32)
    text_vars = enc.init(k, caps, lens)
    rng = jax.random.PRNGKey(1)
    batch = {
        "lr": 0.2 * jax.random.normal(rng, (B, 8, 8, 3)),
        "real_pyramid": [
            0.2 * jax.random.normal(jax.random.fold_in(rng, s), (B, s, s, 3))
            for s in cfg.pyramid_sizes()
        ],
        "captions": caps,
        "cap_lens": lens,
        "class_ids": jnp.arange(B, dtype=jnp.int32),
    }
    trainer = GANTrainer(cfg, vocab, text_vars, mesh=mesh)
    state = trainer.init_state(k, batch_size=B)
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
        batch = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
            batch,
        )
    return trainer, state, batch


def _tp_shard_params(state, mesh):
    """Place conv kernels channel-sharded over 'model' (the dryrun's TP
    layout); everything else replicated."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] % 2 == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P(None, None, None, "model")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return state.replace(
        g_params=jax.tree.map(put, state.g_params),
        d_params=jax.tree.map(put, state.d_params),
    )


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        tree,
    )


@pytest.mark.slow
def test_sharded_save_restore_resume(tmp_path):
    """Runs the sharded save/restore/resume contract in an ISOLATED
    subprocess with retry-on-runtime-abort.

    Why: XLA:CPU's in-process collectives deadlock intermittently on this
    8-virtual-device 4x2 mesh even with per-step synchronization
    (observed round 4 and three times round 5 at the same loop: threads
    of one sharded program's collectives stall against each other, the
    rendezvous watchdog eventually SIGABRTs, and — run in-process — that
    kills the ENTIRE pytest session). The contract under test is ours;
    the deadlock is the CPU runtime's (real TPU collectives have no such
    in-process thread rendezvous). Isolation keeps the suite alive and a
    bounded retry absorbs the ~1/6 flake; a genuine assertion failure is
    NOT retried.
    """
    import subprocess
    import sys

    from tests.conftest import REPO_ROOT

    last, notes = None, []
    for attempt in range(3):
        work = tmp_path / f"attempt{attempt}"
        work.mkdir()
        prog = (
            "import tests.conftest\n"
            "from tests.test_distributed_checkpoint import "
            "_sharded_save_restore_resume_impl as f\n"
            f"f({str(work)!r})\n"
            "print('IMPL-OK')\n"
        )
        try:
            # clean run measures ~170 s cold; a stalled collective never
            # finishes, so 480 s IS the deadlock detector
            last = subprocess.run(
                [sys.executable, "-c", prog], cwd=REPO_ROOT,
                capture_output=True, text=True, timeout=480)
        except subprocess.TimeoutExpired:
            notes.append(f"attempt {attempt}: deadlocked (480s), retrying")
            continue
        if last.returncode == 0 and "IMPL-OK" in last.stdout:
            return
        runtime_abort = last.returncode in (134, -6) or (
            "Timed out" in last.stderr or "rendezvous" in last.stderr
            or "terminate_timeout" in last.stderr)
        if not runtime_abort:
            break  # real failure: surface it, don't retry
        notes.append(f"attempt {attempt}: runtime abort "
                     f"rc={last.returncode}, retrying")
    raise AssertionError(
        "sharded save/restore impl failed; " + "; ".join(notes) +
        (f"\nrc={last.returncode}\n--- stdout ---\n{last.stdout[-2000:]}"
         f"\n--- stderr ---\n{last.stderr[-3000:]}" if last else
         " (all attempts deadlocked)"))


def _sharded_save_restore_resume_impl(tmp_dir):
    import os

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    trainer, state, batch = _setup(mesh)
    state = _tp_shard_params(state, mesh)
    ckpt_dir = os.path.join(tmp_dir, "ckpt")

    # uninterrupted: 4 sharded steps, checkpointing after step 2.  The
    # save (and host-side value/sharding snapshots for the asserts below)
    # must happen BEFORE the next train_step consumes the state: the step
    # is jitted with donate_argnums=(0,), so `s`'s buffers are deleted by
    # the continuation.  save_train_state(wait=True) serializes first.
    snap_abs = snap_host = None
    s = state
    for i in range(4):
        if i == 2:
            save_train_state(ckpt_dir, 2, s)
            snap_abs = _abstract(s)
            snap_host = jax.tree.map(np.asarray, s)
        s, metrics, _ = trainer.train_step(s, batch, jax.random.fold_in(
            jax.random.PRNGKey(7), i))
        # synchronize per step: XLA:CPU's in-process collectives deadlock
        # intermittently (~1/6 runs) when async dispatch lets TWO sharded
        # programs be in flight — threads of step k's all-to-all rendezvous
        # against step k+1's all-reduce and the 40 s watchdog aborts the
        # whole pytest process (observed twice at this exact loop). A real
        # multi-chip runtime has no such cross-program interleaving.
        jax.block_until_ready(s)
    final_ref = s

    restored, step = restore_train_state(ckpt_dir, snap_abs)
    assert step == 2

    # values intact, placement as requested (incl. the TP-sharded kernels)
    for a, b, t in zip(jax.tree.leaves(snap_host), jax.tree.leaves(restored),
                       jax.tree.leaves(snap_abs)):
        np.testing.assert_array_equal(a, np.asarray(b))
        assert b.sharding == t.sharding

    # resume: the continuation must be bit-identical to the uninterrupted
    # run (same jitted program, same placements, same rng folds)
    s = restored
    for i in range(2, 4):
        s, _, _ = trainer.train_step(s, batch, jax.random.fold_in(
            jax.random.PRNGKey(7), i))
        jax.block_until_ready(s)  # see the sync note above
    for a, b in zip(jax.tree.leaves(final_ref.g_params),
                    jax.tree.leaves(s.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(final_ref.d_params),
                    jax.tree.leaves(s.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_topology_portable_restore(tmp_path):
    """A checkpoint written from an UNSHARDED state restores directly onto
    a mesh layout: same values, template placement — the restart-on-a-
    different-topology story (scale out after a save)."""
    trainer, state, _ = _setup(mesh=None)
    save_train_state(str(tmp_path / "ckpt"), 0, state)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    target = _tp_shard_params(
        jax.device_put(state, NamedSharding(mesh, P())), mesh)
    restored, _ = restore_train_state(str(tmp_path / "ckpt"),
                                      _abstract(target))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for t, b in zip(jax.tree.leaves(target), jax.tree.leaves(restored)):
        assert b.sharding == t.sharding


@pytest.mark.slow
def test_async_checkpointer_donation_safe(tmp_path):
    """TrainCheckpointer.save returns after the device->host snapshot;
    donated steps that immediately reuse the saved state's device buffers
    must not corrupt the in-flight write (orbax async contract), and the
    restored values must equal the state AT save time."""
    from tgsr_tpu.checkpoints.orbax_io import TrainCheckpointer

    trainer, state, batch = _setup(mesh=None, B=4)
    fold = lambda i: jax.random.fold_in(jax.random.PRNGKey(11), i)
    with TrainCheckpointer(str(tmp_path / "ckpt")) as ckpt:
        s, _, _ = trainer.train_step(state, batch, fold(0))
        snap_host = jax.tree.map(np.asarray, s)
        ckpt.save(1, s)
        # the write is (potentially) still in flight; these donating steps
        # recycle s's buffers right away
        for i in range(1, 3):
            s, _, _ = trainer.train_step(s, batch, fold(i))
        ckpt.wait()
        assert ckpt.latest_step() == 1
        template = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), snap_host)
        restored, step = ckpt.restore(template)
        assert step == 1
        for a, b in zip(jax.tree.leaves(snap_host),
                        jax.tree.leaves(restored)):
            np.testing.assert_array_equal(a, np.asarray(b))
