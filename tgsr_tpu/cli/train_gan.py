"""Adversarial SR training entry point.

The reference snapshot ships no GAN training loop (SURVEY.md 2.9); this
entry drives the reconstructed trainer (tgsr_tpu.engine.gan_trainer) with
the standard protocol the loss API implies: per-scale D steps + joint
G(netG+netGH) step + KL + pixel MSE [+ DAMSM terms when encoders are
given], G-EMA, periodic paired netG/netGH snapshots.

Usage:
  python -m tgsr_tpu.cli.train_gan --cfg <train yml> --data_dir <root> \
      [--text_encoder Model/text_encoder200.msgpack] [--epochs N]
"""

from __future__ import annotations

import argparse
import os
import pprint

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train TGSR GAN")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--data_dir", default="")
    parser.add_argument("--out_dir", default="../output/gan")
    parser.add_argument("--text_encoder", default="",
                        help="trained DAMSM text encoder (.msgpack/.pth)")
    parser.add_argument("--image_encoder", default="",
                        help="trained DAMSM image encoder (.msgpack)")
    parser.add_argument("--epochs", type=int, default=0)
    parser.add_argument("--manualSeed", type=int, default=100)
    parser.add_argument("--log_every", type=int, default=20)
    parser.add_argument("--remat", nargs="?", const=True, default=False,
                        choices=[True, False, "all", "low", "high"],
                        help="rematerialize G activations in the backward: "
                             "--remat (both branches) or --remat low|high "
                             "(GSRNetLow / NetGHighWeight only). Makes "
                             "batch >= 256 FIT on one v5e at a ~20-28% "
                             "step-time cost; B=128 without remat is the "
                             "measured throughput optimum (docs/PERF.md)")
    parser.add_argument("--loss_weight", action="append", default=[],
                        metavar="TERM=W",
                        help="scale a G composite term, e.g. "
                             "--loss_weight adv=0.01 --loss_weight pixel=1 "
                             "(terms: adv, pixel, kl; default 1.0 each — "
                             "the reconstructed reference contract)")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed precision: bf16 G/D compute, f32 master "
                             "weights/opt/losses")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest orbax checkpoint under "
                             "--out_dir/ckpt; continues the EXACT "
                             "uninterrupted run: same data order (the "
                             "loader is (seed, epoch)-deterministic, "
                             "already-consumed batches are skipped) and "
                             "same per-step rng stream (fast-forwarded)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="mirror the JSONL metrics to TensorBoard event "
                             "files under --out_dir/Log/tb")
    parser.add_argument("--csv", action="store_true",
                        help="mirror the JSONL metrics to Log/metrics.csv "
                             "(the header widens in place as new metric "
                             "keys appear, e.g. --eval_every rows)")
    parser.add_argument("--eval_every", type=int, default=0,
                        help="every N steps, log PSNR-Y/SSIM of the EMA "
                             "generator on a fixed validation batch "
                             "(the evaluate_sr protocol; falls back to a "
                             "train batch if the val split is empty). "
                             "0 disables. Costs one eval forward + host "
                             "sync per N steps")
    parser.add_argument("--eval_batch", type=int, default=16,
                        help="validation batch size for --eval_every")
    parser.add_argument("--nan_check_every", type=int, default=50,
                        help="failure detection: every N steps, fetch the "
                             "metrics and ABORT if any is non-finite "
                             "(resume from the last periodic checkpoint; "
                             "every snapshot is also finiteness-gated "
                             "before it is written). 0 disables. Checking "
                             "costs one host sync per N steps")
    parser.add_argument("--mesh", default="",
                        help="train over a device mesh, 'DATAxMODEL' (e.g. "
                             "8x1): the batch DP-shards over 'data' (XLA "
                             "all-reduces grads over ICI), params replicate "
                             "unless --fsdp. cfg.TRAIN.BATCH_SIZE must be "
                             "divisible by DATA")
    parser.add_argument("--fsdp", action="store_true",
                        help="with --mesh: store params/optimizer/EMA "
                             "sharded over the 'data' axis (ZeRO-3 layout, "
                             "parallel.mesh.fsdp_state) instead of "
                             "replicated — same math, ~DATA-fold less "
                             "state memory per device")
    parser.add_argument("--init_netg", default="",
                        help="warm-start G from a reference netG_epoch_*.pth "
                             "or this trainer's own netG_it*.msgpack "
                             "(netGH by name substitution; family-aware "
                             "converters). Defaults to cfg.TRAIN.NET_G when "
                             "that path exists — the reference's own resume "
                             "convention. EMA starts from the loaded "
                             "weights; --resume takes precedence")
    args = parser.parse_args(argv)

    loss_weights = {}
    for spec in args.loss_weight:
        term, _, w = spec.partition("=")
        try:
            loss_weights[term] = float(w)
        except ValueError:
            parser.error(f"--loss_weight expects adv|pixel|kl=FLOAT, "
                         f"got {spec!r}")
        if term not in ("adv", "pixel", "kl"):
            parser.error(f"--loss_weight expects adv|pixel|kl=FLOAT, "
                         f"got {spec!r}")

    import jax
    import jax.numpy as jnp

    # join a multi-process runtime BEFORE any backend use (no-op outside a
    # cluster env; on TPU pods the topology is autodetected)
    from tgsr_tpu.parallel.multihost import initialize_distributed

    initialize_distributed()

    from tgsr_tpu.checkpoints.io import load_variables, save_variables
    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.data.datasets import TextFaceDataset, TextSRDataset
    from tgsr_tpu.config import enable_compile_cache
    from tgsr_tpu.data.pipeline import BatchLoader, device_preprocess

    enable_compile_cache()
    from tgsr_tpu.engine.gan_trainer import GANTrainer
    from tgsr_tpu.models.text_encoder import TextEncoder

    cfg = config_from_file(args.cfg_file)
    if args.data_dir:
        import dataclasses

        cfg = dataclasses.replace(cfg, DATA_DIR=args.data_dir)
    pprint.pprint(cfg)
    np.random.seed(args.manualSeed)

    if cfg.DATASET_NAME == "face":
        ds = TextFaceDataset(cfg.DATA_DIR, split="train",
                             words_num=cfg.TEXT.WORDS_NUM, imsize=cfg.imsize)
    else:
        ds = TextSRDataset(cfg.DATA_DIR, split="train",
                           words_num=cfg.TEXT.WORDS_NUM,
                           embeddings_num=cfg.TEXT.CAPTIONS_PER_IMAGE,
                           imsize=cfg.imsize)

    enc = TextEncoder(vocab_size=ds.n_words, nhidden=cfg.TEXT.EMBEDDING_DIM,
                      rnn_type=cfg.RNN_TYPE)
    if args.text_encoder:
        if args.text_encoder.endswith(".pth"):
            from tgsr_tpu.checkpoints.convert_torch import (
                convert_text_encoder, load_torch_state_dict)

            text_vars = convert_text_encoder(
                load_torch_state_dict(args.text_encoder), cfg.RNN_TYPE)
        else:
            text_vars = load_variables(args.text_encoder)
    else:
        print("WARNING: no trained text encoder given; using seeded init")
        text_vars = enc.init(
            jax.random.PRNGKey(args.manualSeed),
            jnp.zeros((1, cfg.TEXT.WORDS_NUM), jnp.int32),
            jnp.ones((1,), jnp.int32))

    image_encoder_apply = None
    if args.image_encoder:
        from tgsr_tpu.models.image_encoder import (CNNEncoder,
                                                   SimpleCNNEncoder)

        # jnp-coerce: the jitted G step closure-captures these leaves
        # (numpy from msgpack would reject tracer indexing)
        cnn_vars = jax.tree.map(jnp.asarray,
                                load_variables(args.image_encoder))
        # family auto-detect: a --simple-cnn DAMSM snapshot (the family
        # that trains WITHOUT the unobtainable Inception zoo weights,
        # cli.pretrain_damsm) has no inception backbone in its param tree
        if "inception" in cnn_vars.get("params", {}):
            cnn = CNNEncoder(nef=cfg.TEXT.EMBEDDING_DIM)
        else:
            cnn = SimpleCNNEncoder(nef=cfg.TEXT.EMBEDDING_DIM)

        def image_encoder_apply(img):
            return cnn.apply(cnn_vars, img)

    mesh = None
    if args.mesh:
        from tgsr_tpu.parallel.mesh import make_mesh, parse_mesh_arg

        try:
            n_data, n_model = parse_mesh_arg(args.mesh)
        except ValueError:
            parser.error(f"--mesh expects DATAxMODEL (e.g. 8x1), "
                         f"got {args.mesh!r}")
        if cfg.TRAIN.BATCH_SIZE % n_data:
            parser.error(f"TRAIN.BATCH_SIZE={cfg.TRAIN.BATCH_SIZE} not "
                         f"divisible by the data axis ({n_data})")
        mesh = make_mesh(n_data, n_model)
    elif args.fsdp:
        parser.error("--fsdp requires --mesh")

    trainer = GANTrainer(cfg, ds.n_words, text_vars,
                         image_encoder_apply=image_encoder_apply,
                         compute_dtype=jnp.bfloat16 if args.bf16
                         else jnp.float32,
                         remat=args.remat,
                         loss_weights=loss_weights or None,
                         mesh=mesh, fsdp=args.fsdp)
    state = trainer.init_state(jax.random.PRNGKey(args.manualSeed),
                               batch_size=cfg.TRAIN.BATCH_SIZE)

    loader = BatchLoader(ds, cfg.TRAIN.BATCH_SIZE, shuffle=True,
                         seed=args.manualSeed)
    model_dir = os.path.join(args.out_dir, "Model")
    os.makedirs(model_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.out_dir, "ckpt")

    from tgsr_tpu.checkpoints.orbax_io import (
        TrainCheckpointer, latest_step, restore_train_state)
    from tgsr_tpu.utils.observability import MetricsLogger, StepTimer

    init_netg = args.init_netg or cfg.TRAIN.NET_G
    if init_netg and os.path.exists(init_netg):
        from tgsr_tpu.checkpoints.convert_torch import load_generator_pair

        gv, ghv = load_generator_pair(cfg, init_netg)
        g_params = {"netg": gv["params"], "netgh": ghv["params"]}
        state = state.replace(
            g_params=g_params,
            g_stats={"netg": gv.get("batch_stats", {}),
                     "netgh": ghv.get("batch_stats", {})},
            g_ema=jax.tree.map(jnp.copy, g_params),
        )
        from tgsr_tpu.checkpoints.convert_torch import paired_path

        print(f"warm-started G from {init_netg} "
              f"(+{paired_path(init_netg, 'netG', 'netGH')})")
    elif args.init_netg:
        raise SystemExit(f"--init_netg not found: {args.init_netg}")

    if mesh is not None:
        # place the state in its mesh layout BEFORE the resume restore:
        # orbax restores onto the template's shardings, so a resumed run
        # lands directly in the replicated/FSDP layout (topology-portable,
        # tests/test_distributed_checkpoint.py)
        from tgsr_tpu.parallel.mesh import fsdp_state, replicate

        state = fsdp_state(state, mesh) if args.fsdp \
            else replicate(state, mesh)

    start_step = 0
    if args.resume and latest_step(ckpt_dir) is not None:
        state, start_step = restore_train_state(ckpt_dir, state)
        print(f"resumed from step {start_step}")

    # rank 0 owns the metric files under a multi-process runtime (the
    # _train_epochs log calls are is_main-gated to match; an eager open
    # by another rank could still truncate the shared path)
    from tgsr_tpu.parallel.multihost import is_main_process

    logger = MetricsLogger(os.path.join(args.out_dir, "Log"),
                           tensorboard=args.tensorboard, csv=args.csv) \
        if is_main_process() else None
    timer = StepTimer()

    val_db = None
    if args.eval_every:
        if cfg.DATASET_NAME == "face":
            vds = TextFaceDataset(cfg.DATA_DIR, split="test",
                                  words_num=cfg.TEXT.WORDS_NUM,
                                  imsize=cfg.imsize)
        else:
            vds = TextSRDataset(cfg.DATA_DIR, split="test",
                                words_num=cfg.TEXT.WORDS_NUM,
                                embeddings_num=cfg.TEXT.CAPTIONS_PER_IMAGE,
                                imsize=cfg.imsize)
        src, note = (vds, "val") if len(vds) else (ds,
                                                   "train (val split empty)")
        vloader = BatchLoader(src, min(args.eval_batch, len(src)),
                              shuffle=False, drop_last=False,
                              deterministic_captions=True)
        vb = next(vloader.epoch(0))
        pre = device_preprocess(jnp.asarray(vb["hr"]), cfg.TREE.BRANCH_NUM,
                                cfg.TREE.BASE_SIZE, with_blur=False)
        val_db = {
            "lr": pre["lr"],
            "real_pyramid": pre["pyramid"][1:],
            "captions": jnp.asarray(vb["captions"]),
            "cap_lens": jnp.asarray(vb["cap_lens"]),
        }
        print(f"periodic eval every {args.eval_every} steps on "
              f"{int(vb['hr'].shape[0])} {note} images")

    rng = jax.random.PRNGKey(args.manualSeed + 1)
    if start_step:
        # exact-resume contract: train_step returns split(rng)[1], so the
        # uninterrupted run's rng at step k is k chained splits of the
        # seed key -- replay them in one jitted loop (one dispatch)
        from tgsr_tpu.parallel.mesh import fast_forward_key

        rng = fast_forward_key(rng, start_step, index=1)
    epochs = args.epochs or cfg.TRAIN.MAX_EPOCH
    it = start_step
    _LAST_STATE[0] = state  # before the try: a Ctrl-C landing inside
    # _train_epochs' prologue must still find a saveable state
    from contextlib import closing

    from tgsr_tpu.utils.preemption import graceful_sigterm

    # one persistent ASYNC writer for every periodic snapshot: save()
    # returns after the device->host copy, the disk write overlaps the
    # next train steps (orbax_io.TrainCheckpointer); __exit__ joins any
    # in-flight write on every exit path (incl. the NaN-abort SystemExit);
    # closing(logger) flushes TB event files when --tensorboard
    with closing(logger), TrainCheckpointer(ckpt_dir) as ckpt_writer:
        try:
            # SIGTERM (TPU-VM preemption, scheduler eviction) takes the
            # same graceful path as Ctrl-C: final checkpoint + writer join
            with graceful_sigterm():
                it = _train_epochs(args, cfg, trainer, loader, state, rng,
                                   it, epochs, timer, logger, model_dir,
                                   ckpt_dir, save_variables, ckpt_writer,
                                   device_preprocess, jnp, val_db)
        except KeyboardInterrupt:
            # graceful exit with final checkpoint (= pretrain_DAMSM.py:293-295)
            print("interrupted; saving final checkpoint")
        final = _LAST_STATE[0]
        if final is None:
            print("no trained state to save")
            return
        try:
            final_step = int(final.step)
            if final_step == 0:
                # an interrupt before the first step completed (e.g. during
                # compile): there is nothing trained to save, and labeling
                # the init state as step 1 would make --resume skip a batch
                # and an rng split that never ran, silently diverging from
                # the uninterrupted run
                print("interrupted before the first step; nothing to save")
                return
            ckpt_writer.wait()
            if ckpt_writer.latest_step() == final_step:
                # the periodic save already wrote this exact step (run
                # length a multiple of the snapshot interval); orbax would
                # raise StepAlreadyExistsError on a duplicate
                print("training done;", final_step, "steps; checkpoints in",
                      ckpt_dir)
                return
            ckpt_writer.save(final_step, final)
            ckpt_writer.wait()
        except (RuntimeError, ValueError) as e:
            # RuntimeError: a Ctrl-C mid-step can leave _LAST_STATE holding
            # the donated (invalidated) input buffers; ValueError covers
            # orbax's StepAlreadyExistsError race -- either way the last
            # periodic checkpoint stands
            print(f"final state unsaveable ({e}); "
                  f"last periodic checkpoint stands")
            return
        print("training done;", final_step, "steps; checkpoints in",
              ckpt_dir)


_LAST_STATE = [None]


def _abort_if_nonfinite(metrics, it, ckpt_dir):
    """Failure detection (SURVEY §5): stop loudly instead of training
    garbage for hours. The poisoned state is NOT saved (the pre-step
    state was donated); the last periodic orbax checkpoint is the resume
    point. Fetching the metrics forces the step (a host sync)."""
    bad = [k for k, v in metrics.items() if not np.isfinite(float(v))]
    if not bad:
        return
    from tgsr_tpu.checkpoints.orbax_io import latest_step

    _LAST_STATE[0] = None  # block the final-save path
    last = latest_step(ckpt_dir)
    raise SystemExit(
        f"NaN/Inf in metrics {bad} at it {it}; resume from the last "
        f"periodic checkpoint "
        f"({'step ' + str(last) if last else 'none yet'}) "
        f"with --resume after lowering the lr.")


def _train_epochs(args, cfg, trainer, loader, state, rng, it, epochs, timer,
                  logger, model_dir, ckpt_dir, save_variables,
                  ckpt_writer, device_preprocess, jnp, val_db=None):
    import os

    import jax

    from tgsr_tpu.data.pipeline import device_prefetch

    from tgsr_tpu.parallel.multihost import is_main_process

    is_main = is_main_process()
    _LAST_STATE[0] = state
    sharding = None
    if trainer.mesh is not None:
        # land each host batch DP-sharded (one shard per device) instead of
        # a full copy on device 0; dim 0 shards, the rest replicate
        from jax.sharding import NamedSharding

        from tgsr_tpu.parallel.mesh import batch_spec

        sharding = NamedSharding(trainer.mesh, batch_spec(trainer.mesh, 1))
    # exact-resume: `it` global steps already ran, so continue at
    # (epoch, batch) = divmod(it, steps/epoch) -- the loader's order is a
    # pure function of (seed, epoch), so skipping reproduces the
    # uninterrupted run's data stream (tests/test_cli_train_gan.py)
    n_batches = len(loader)
    start_epoch, skip = divmod(it, n_batches) if n_batches else (0, 0)
    for epoch in range(start_epoch, epochs):
        host_iter = loader.epoch(epoch)
        if skip:
            import itertools

            host_iter = itertools.islice(host_iter, skip, None)
            skip = 0
        if trainer.mesh is not None and jax.process_count() > 1:
            # multi-process: a plain device_put would target other hosts'
            # devices; each process lands only its slice of the global
            # batch (parallel.multihost.land_batch), still prefetched
            # depth-2 so host slicing + H2D overlaps the previous step.
            # The deterministic loader replays the SAME stream on every
            # host, so slicing is consistent; exact-resume semantics are
            # unchanged.
            from tgsr_tpu.parallel.multihost import land_batch

            batch_iter = device_prefetch(
                host_iter, depth=2,
                put=lambda b: land_batch(trainer.mesh, b))
        else:
            batch_iter = device_prefetch(host_iter, depth=2,
                                         sharding=sharding)
        for batch in batch_iter:
            pre = device_preprocess(jnp.asarray(batch["hr"]),
                                    cfg.TREE.BRANCH_NUM, cfg.TREE.BASE_SIZE,
                                    with_blur=False)
            db = {
                "lr": pre["lr"],
                "real_pyramid": pre["pyramid"][1:],
                "captions": jnp.asarray(batch["captions"]),
                "cap_lens": jnp.asarray(batch["cap_lens"]),
                "class_ids": jnp.asarray(batch["class_ids"]),
            }
            state, metrics, rng = trainer.train_step(state, db, rng)
            _LAST_STATE[0] = state
            if args.nan_check_every and it % args.nan_check_every == 0:
                _abort_if_nonfinite(metrics, it, ckpt_dir)
            ema_ms = timer.tick()
            if val_db is not None and it % args.eval_every == 0:
                # EMA-generator quality on the fixed validation batch
                # (= the weights a snapshot would ship)
                em = trainer.eval_metrics(state.g_ema, state.g_stats,
                                          val_db)
                vm = {"val_psnr_y": float(em["psnr_y"]),
                      "val_ssim_y": float(em["ssim_y"])}
                if is_main:
                    print(f"epoch {epoch} it {it}: " + " ".join(
                        f"{k}={v:.4f}" for k, v in vm.items()))
                    logger.log(it, **vm)
            if it % args.log_every == 0 and is_main:
                print(f"epoch {epoch} it {it}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(metrics.items()))
                    + (f" [{ema_ms:.0f} ms/step]" if ema_ms else ""))
                logger.log(it, **{k: v for k, v in metrics.items()})
            it += 1
            if cfg.TRAIN.SNAPSHOT_INTERVAL and \
                    it % cfg.TRAIN.SNAPSHOT_INTERVAL == 0:
                if args.nan_check_every:
                    # never persist a poisoned state: the periodic check
                    # above may be out of phase with the snapshot interval
                    _abort_if_nonfinite(metrics, it, ckpt_dir)
                # paired netG/netGH snapshots (trainer_objective.py:91-93).
                # Multi-process: fetch_to_host assembles cross-process-
                # sharded (FSDP) leaves on every rank (collective), then
                # only rank 0 writes — un-gated writes to one shared path
                # would interleave and corrupt the msgpack.
                ema = {"ema": state.g_ema, "stats": state.g_stats}
                if jax.process_count() > 1:
                    from tgsr_tpu.parallel.multihost import fetch_to_host

                    ema = fetch_to_host(ema)
                if is_main:
                    save_variables(
                        os.path.join(model_dir, f"netG_it{it}.msgpack"),
                        {"params": ema["ema"]["netg"],
                         "batch_stats": ema["stats"]["netg"]})
                    save_variables(
                        os.path.join(model_dir, f"netGH_it{it}.msgpack"),
                        {"params": ema["ema"]["netgh"],
                         "batch_stats": ema["stats"]["netgh"]})
                # async: returns after the device->host copy; the disk
                # write overlaps the following steps (donation-safe,
                # tests/test_distributed_checkpoint.py). Orbax coordinates
                # multi-process saves itself — every rank participates.
                ckpt_writer.save(it, state)
    return it


if __name__ == "__main__":
    main()
