"""Multi-process jax.distributed worker — the REAL execution half of
tests/test_multihost.py.

Run as:  python multihost_worker.py <process_id> <num_processes> <port> <outdir>

Each OS process gets 8//num_processes virtual CPU devices, joins the
cluster through `parallel.multihost.initialize_distributed` (the
non-degenerate path), and then exercises the full SURVEY.md 2.11
multi-host contract on a GLOBAL 8-device ('data',) x ('model',) mesh that
spans the processes:

  1. per-host input pipeline: `process_local_slice` picks this process'
     slice of the global batch and `global_batch_from_local` assembles the
     globally-sharded arrays (no host ever holds the device-placed full
     batch);
  2. one DP GANTrainer training step over the global mesh — cross-process
     gradient psums ride the gloo CPU collectives;
  3. an orbax SHARDED checkpoint: the post-step state is placed in the
     FSDP layout (param leaves sharded over 'data' ACROSS processes),
     saved from all processes, restored against the sharded template, and
     compared in-graph (max-abs-diff without any full gather).

Writes result_p{pid}.json with metrics + checks; the pytest side compares
the two processes' metrics against each other and against a single-process
run of this same script (num_processes=1, same global mesh), so "multi-
process training steps equal single-process training" is asserted end to
end. Reference has no distributed support at all (SURVEY.md 2.11) — this
is the rebuild's own north star.
"""

import dataclasses
import json
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    n_local = 8 // nproc

    # force the CPU backend BEFORE jax import (the axon sitecustomize
    # re-forces the platform at interpreter start; undo both layers)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(
        t for t in flags.split()
        if "xla_force_host_platform_device_count" not in t
        and "xla_backend_optimization_level" not in t)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local}"
        # this validates that multi-process programs compile+execute, not
        # how fast they run (same rationale as __graft_entry__'s dryrun)
        " --xla_backend_optimization_level=0"
        # 8 device threads + 2 processes share ONE physical core here; the
        # default 40 s rendezvous deadline would SIGABRT under load
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    from tgsr_tpu.parallel.multihost import (
        global_batch_from_local, initialize_distributed, process_local_slice)

    idx = initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert idx == pid, (idx, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == n_local
    assert len(jax.devices()) == 8

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tgsr_tpu.config import Config
    from tgsr_tpu.engine.gan_trainer import GANTrainer
    from tgsr_tpu.models.text_encoder import TextEncoder
    from tgsr_tpu.parallel.mesh import fsdp_state, make_mesh

    def log(msg):
        print(f"[worker p{pid}/{nproc}] {msg}", flush=True)

    log(f"joined: {jax.process_count()} processes, "
        f"{jax.local_device_count()} local / {len(jax.devices())} global "
        "devices")

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, METHOD="S8",
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=32),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=1))
    mesh = make_mesh(n_data=8, n_model=1)  # spans BOTH processes
    B, T, vocab = 8, cfg.TEXT.WORDS_NUM, 41

    # deterministic GLOBAL batch; every process derives the same full copy
    # but device-places only ITS slice (per-host input pipeline pattern)
    rng = np.random.default_rng(0)
    lr = rng.normal(0, 0.1, (B, 8, 8, 3)).astype(np.float32)
    pyr = [rng.normal(0, 0.1, (B, s, s, 3)).astype(np.float32)
           for s in cfg.pyramid_sizes()]
    captions = np.ones((B, T), np.int32)
    cap_lens = np.full((B,), T, np.int32)
    class_ids = np.arange(B, dtype=np.int32)

    sl = process_local_slice(B)
    assert (sl.stop - sl.start) * nproc == B, sl
    local = {"lr": lr[sl], "real_pyramid": [p[sl] for p in pyr],
             "captions": captions[sl], "cap_lens": cap_lens[sl],
             "class_ids": class_ids[sl]}
    batch = global_batch_from_local(mesh, local)
    # prove the assembly: the in-graph global sum must equal the host-side
    # sum over the FULL batch (i.e. both processes' slices made it in)
    lr_sum = float(jax.jit(lambda b: jnp.sum(b["lr"]))(batch))
    log(f"global batch assembled: lr sum {lr_sum:.6f} "
        f"(host full-batch sum {float(lr.sum()):.6f})")

    # land_batch: the CLI landing helper (full host batch in, per-process
    # slice contributed; metadata lists slice host-side)
    from tgsr_tpu.parallel.multihost import land_batch

    lb = land_batch(mesh, {"lr": lr, "n": np.int32(B),
                           "keys": [f"k{i}" for i in range(B)]})
    lb_sum = float(jax.jit(jnp.sum)(lb["lr"]))  # keys list is host-side
    assert abs(lb_sum - float(lr.sum())) < 1e-3, (lb_sum, float(lr.sum()))
    want_keys = ([f"k{i}" for i in range(sl.start, sl.stop)]
                 if nproc > 1 else [f"k{i}" for i in range(B)])
    assert lb["keys"] == want_keys, lb["keys"]
    # 0-d leaves land as REPLICATED jax.Arrays in both topologies (the
    # single-process branch always did; the multi-process branch must
    # match so the same consumer code runs under either runtime)
    assert lb["n"].sharding.is_fully_replicated, lb["n"].sharding
    assert int(lb["n"]) == B

    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=vocab, nhidden=cfg.TEXT.EMBEDDING_DIM)
    text_vars = enc.init(k, jnp.ones((2, T), jnp.int32),
                         jnp.full((2,), T, jnp.int32))
    trainer = GANTrainer(cfg, vocab, text_vars, mesh=mesh)
    state = trainer.init_state(k, batch_size=2, init_on_cpu=False)
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    key = jax.device_put(jax.random.PRNGKey(2), repl)

    log("DP training step (cold compile)...")
    new_state, metrics, _ = trainer.train_step(state, batch, key)
    jax.block_until_ready(metrics)
    metrics = {k2: float(v) for k2, v in metrics.items()}
    assert int(new_state.step) == 1
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    log(f"step metrics: { {k2: round(v, 5) for k2, v in metrics.items()} }")

    # ---- orbax sharded save/restore across processes ----
    from tgsr_tpu.checkpoints.orbax_io import (restore_train_state,
                                               save_train_state)

    fstate = fsdp_state(new_state, mesh)
    n_cross = sum(
        1 for x in jax.tree.leaves(fstate)
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated)
    ck = os.path.join(outdir, "ckpt")
    log(f"orbax sharded save ({n_cross} leaves sharded over the "
        "cross-process 'data' axis)...")
    save_train_state(ck, 1, fstate)
    restored, rstep = restore_train_state(ck, fstate)
    assert rstep == 1, rstep

    # in-graph comparison (no full gather): max |a-b| over every leaf
    def maxdiff(a, b):
        ds = jax.tree.map(
            lambda x, y: jnp.max(jnp.abs(x.astype(jnp.float32)
                                         - y.astype(jnp.float32))), a, b)
        return jax.tree.reduce(jnp.maximum, ds)

    md = float(jax.jit(maxdiff)(fstate, restored))
    layout_ok = all(
        x.sharding.is_equivalent_to(y.sharding, x.ndim)
        for x, y in zip(jax.tree.leaves(fstate), jax.tree.leaves(restored)))
    log(f"restore: maxdiff {md}, layout preserved: {layout_ok}")

    # fetch_to_host: assemble a CROSS-PROCESS-sharded leaf to host numpy
    # on every rank (the msgpack-snapshot path of cli.train_gan under
    # FSDP); the host sum must equal the in-graph sum of the same leaf
    from tgsr_tpu.parallel.multihost import fetch_to_host

    cross = [x for x in jax.tree.leaves(fstate)
             if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
    fetch_sum = fetch_ingraph_sum = 0.0
    if cross:
        leaf = max(cross, key=lambda x: x.size)
        host_leaf = fetch_to_host(leaf)
        assert host_leaf.shape == leaf.shape, (host_leaf.shape, leaf.shape)
        fetch_sum = float(host_leaf.astype(np.float32).sum(
            dtype=np.float32))
        fetch_ingraph_sum = float(jax.jit(jnp.sum)(leaf))
        log(f"fetch_to_host: {leaf.shape} leaf assembled, host sum "
            f"{fetch_sum:.6f} vs in-graph {fetch_ingraph_sum:.6f}")

    with open(os.path.join(outdir, f"result_p{pid}.json"), "w") as f:
        json.dump({
            "process_count": jax.process_count(),
            "process_index": jax.process_index(),
            "local_devices": jax.local_device_count(),
            "global_devices": len(jax.devices()),
            "slice": [sl.start, sl.stop],
            "lr_sum_global": lr_sum,
            "lr_sum_host": float(lr.sum()),
            "metrics": metrics,
            "ckpt_maxdiff": md,
            "ckpt_layout_preserved": bool(layout_ok),
            "ckpt_cross_process_sharded_leaves": n_cross,
            "fetch_sum": fetch_sum,
            "fetch_ingraph_sum": fetch_ingraph_sum,
        }, f, indent=1)
    log("done")


if __name__ == "__main__":
    main()
