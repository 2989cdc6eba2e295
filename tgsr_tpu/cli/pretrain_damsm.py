"""DAMSM pretraining entry point.

= pretrain_DAMSM.py: config-driven joint training of the text/image
encoders with per-epoch lr decay, grad clipping, periodic snapshots and
attention-grid dumps.

Usage:
  python -m tgsr_tpu.cli.pretrain_damsm --cfg /root/reference/cfg/DAMSM/face.yml \
      --data_dir <celeba_root> [--out_dir ../output] [--simple-cnn]
"""

from __future__ import annotations

import argparse
import datetime
import os
import pprint

import numpy as np


def check_encoder_family(snap_params, live_params, img_path: str) -> None:
    """Refuse a family-mismatched --resume_from image encoder: the resume
    merge keeps initialized heads when a snapshot lacks them (bare zoo
    backbone), so an Inception/SimpleCNN mismatch would silently build a
    union tree matching neither the model nor the optimizer state."""
    snap_simple = "inception" not in snap_params
    live_simple = "inception" not in live_params
    if snap_simple != live_simple:
        raise SystemExit(
            f"--resume_from image encoder {img_path} is a "
            f"{'SimpleCNN' if snap_simple else 'Inception'} snapshot but "
            f"this run builds a "
            f"{'SimpleCNN' if live_simple else 'Inception'} encoder; "
            f"{'pass --simple-cnn' if snap_simple else 'drop --simple-cnn'} "
            f"to match the snapshot's family")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train DAMSM encoders")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--data_dir", default="")
    parser.add_argument("--out_dir", default="../output")
    parser.add_argument("--manualSeed", type=int, default=100)
    parser.add_argument("--epochs", type=int, default=0,
                        help="override cfg.TRAIN.MAX_EPOCH")
    parser.add_argument("--simple-cnn", action="store_true",
                        help="use the trainable SimpleCNNEncoder instead of "
                             "Inception-v3 (no zoo weights needed)")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed precision: bf16 CNN encoder compute")
    parser.add_argument("--inception_ckpt", default="",
                        help="local torchvision inception_v3 .pth to load")
    parser.add_argument("--resume_from", default="",
                        help="resume from a text_encoder<N>.{msgpack,pth} "
                             "snapshot (the paired image_encoder<N> file is "
                             "loaded by name substitution and training "
                             "continues at epoch N+1 — the reference's "
                             "NET_E convention, pretrain_DAMSM.py:177-185). "
                             "Epoch-granular resume is exact: the protocol "
                             "re-creates the optimizer each epoch, the "
                             "loader is (seed, epoch)-deterministic, and "
                             "the dropout rng is fast-forwarded")
    parser.add_argument("--tensorboard", action="store_true",
                        help="mirror metrics to TensorBoard event files "
                             "under the run's Log/tb dir (JSONL always on)")
    parser.add_argument("--csv", action="store_true",
                        help="mirror metrics to Log/metrics.csv (the header "
                             "widens in place as new metric keys appear; "
                             "JSONL is lossless)")
    parser.add_argument("--mesh", default="",
                        help="data-parallel training over a device mesh, "
                             "'DATAx1' (e.g. 8x1). DAMSM has no model axis "
                             "— the MODEL factor must be 1. "
                             "cfg.TRAIN.BATCH_SIZE must be divisible by "
                             "DATA (the B x B contrastive losses stay "
                             "global-batch exact under DP, "
                             "tests/test_damsm_sharding.py)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # join a multi-process runtime BEFORE any backend use (no-op outside a
    # cluster env; on TPU pods the topology is autodetected)
    from tgsr_tpu.parallel.multihost import initialize_distributed

    initialize_distributed()

    from tgsr_tpu.config import enable_compile_cache

    enable_compile_cache()

    from tgsr_tpu.checkpoints.io import save_variables
    from tgsr_tpu.config import config_from_file
    from tgsr_tpu.data.datasets import TextDataset, TextFaceDataset
    from tgsr_tpu.data.pipeline import BatchLoader
    from tgsr_tpu.engine.damsm_trainer import DAMSMTrainer

    cfg = config_from_file(args.cfg_file)
    if args.data_dir:
        import dataclasses

        cfg = dataclasses.replace(cfg, DATA_DIR=args.data_dir)
    pprint.pprint(cfg)
    np.random.seed(args.manualSeed)

    # output dirs (= pretrain_DAMSM.py:221-229)
    ts = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    out = os.path.join(args.out_dir,
                       f"{cfg.DATASET_NAME}_DAMSM_{ts}")
    model_dir = os.path.join(out, "Model")
    os.makedirs(model_dir, exist_ok=True)
    from tgsr_tpu.utils.observability import MetricsLogger
    from tgsr_tpu.parallel.multihost import is_main_process

    # rank 0 owns the metric files; other ranks get a no-op logger=None
    # path through fit (concurrent JSONL/CSV writers on one shared dir
    # would interleave lines)
    logger = MetricsLogger(os.path.join(out, "Log"),
                           tensorboard=args.tensorboard, csv=args.csv) \
        if is_main_process() else None

    imsize = cfg.TREE.BASE_SIZE  # DAMSM configs: BRANCH_NUM=1, size 299
    if cfg.DATASET_NAME == "face":
        train_ds = TextFaceDataset(cfg.DATA_DIR, split="train",
                                   words_num=cfg.TEXT.WORDS_NUM,
                                   imsize=imsize)
        val_ds = TextFaceDataset(cfg.DATA_DIR, split="test",
                                 words_num=cfg.TEXT.WORDS_NUM, imsize=imsize)
    else:
        train_ds = TextDataset(cfg.DATA_DIR, split="train",
                               words_num=cfg.TEXT.WORDS_NUM,
                               embeddings_num=cfg.TEXT.CAPTIONS_PER_IMAGE,
                               imsize=imsize)
        val_ds = TextDataset(cfg.DATA_DIR, split="test",
                             words_num=cfg.TEXT.WORDS_NUM,
                             embeddings_num=cfg.TEXT.CAPTIONS_PER_IMAGE,
                             imsize=imsize)

    mesh = None
    if args.mesh:
        from tgsr_tpu.parallel.mesh import make_mesh, parse_mesh_arg

        try:
            n_data, n_model = parse_mesh_arg(args.mesh)
        except ValueError:
            parser.error(f"--mesh expects DATAx1 (e.g. 8x1), "
                         f"got {args.mesh!r}")
        if n_model != 1:
            parser.error("DAMSM training has no model-parallel axis; "
                         "use --mesh DATAx1")
        if cfg.TRAIN.BATCH_SIZE % n_data:
            parser.error(f"cfg.TRAIN.BATCH_SIZE={cfg.TRAIN.BATCH_SIZE} is "
                         f"not divisible by the mesh data axis ({n_data})")
        mesh = make_mesh(n_data, n_model)

    trainer = DAMSMTrainer(cfg, train_ds.n_words,
                           use_inception=not args.simple_cnn,
                           compute_dtype=jnp.bfloat16 if args.bf16
                           else jnp.float32,
                           mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(args.manualSeed),
                               image_size=imsize,
                               batch_size=cfg.TRAIN.BATCH_SIZE)

    if args.inception_ckpt:
        from tgsr_tpu.checkpoints.convert_torch import (
            convert_cnn_encoder, load_torch_state_dict)

        conv = convert_cnn_encoder(load_torch_state_dict(args.inception_ckpt))
        state = state.replace(
            cnn_params={**state.cnn_params, **conv["params"]},
            cnn_stats={**state.cnn_stats, **conv["batch_stats"]},
        )
        print("loaded inception backbone from", args.inception_ckpt)

    start_epoch = 0
    if args.resume_from:
        import re

        m = re.search(r"text_encoder(-?\d+)\.(msgpack|pth)$",
                      args.resume_from)
        if not m:
            raise SystemExit(f"--resume_from must point at a "
                             f"text_encoder<N>.msgpack/.pth snapshot, "
                             f"got {args.resume_from!r}")
        start_epoch = max(int(m.group(1)) + 1, 0)
        from tgsr_tpu.checkpoints.convert_torch import paired_path

        img_path = paired_path(args.resume_from,
                               "text_encoder", "image_encoder")
        if args.resume_from.endswith(".pth"):
            from tgsr_tpu.checkpoints.convert_torch import (
                convert_cnn_encoder, convert_text_encoder,
                load_torch_state_dict)

            tv = convert_text_encoder(
                load_torch_state_dict(args.resume_from), cfg.RNN_TYPE)
            iv = (convert_cnn_encoder(load_torch_state_dict(img_path))
                  if os.path.exists(img_path) else None)
        else:
            from tgsr_tpu.checkpoints.io import load_variables

            tv = load_variables(args.resume_from)
            iv = (load_variables(img_path)
                  if os.path.exists(img_path) else None)
        state = state.replace(text_params=tv["params"])
        if iv is not None:
            check_encoder_family(iv["params"], state.cnn_params, img_path)
            state = state.replace(
                cnn_params={**state.cnn_params, **iv["params"]},
                cnn_stats={**state.cnn_stats,
                           **iv.get("batch_stats", {})})
        else:
            print(f"paired image encoder not found at {img_path}; "
                  f"text encoder only")
        print(f"resumed encoders from {args.resume_from}; "
              f"continuing at epoch {start_epoch}")

    if mesh is not None:
        # replicated state + DP batches (AFTER every weight load, so the
        # loaded leaves get the mesh layout); _device_batch lands host
        # batches pre-sharded on the 'data' axis
        from tgsr_tpu.parallel.mesh import replicate

        state = replicate(state, mesh)

    train_loader = BatchLoader(train_ds, cfg.TRAIN.BATCH_SIZE, shuffle=True,
                               seed=args.manualSeed)
    val_batch = min(cfg.TRAIN.BATCH_SIZE, len(val_ds))
    val_loader = None
    if mesh is not None:
        # DP: every dispatched batch must divide the data axis (the trainer
        # raises otherwise); round the val batch down and drop the tail
        from tgsr_tpu.parallel.mesh import batch_shards

        n_data = batch_shards(mesh)
        val_batch = (val_batch // n_data) * n_data
        if val_batch == 0:
            print(f"val set ({len(val_ds)} items) smaller than the mesh "
                  f"data axis ({n_data}); skipping validation")
    if val_batch:
        val_loader = BatchLoader(val_ds, val_batch, shuffle=False,
                                 drop_last=mesh is not None,
                                 deterministic_captions=True)

    image_dir = os.path.join(out, "Image")
    os.makedirs(image_dir, exist_ok=True)

    def snapshot(state, epoch):
        from tgsr_tpu.parallel.multihost import is_main_process

        # = text_encoder%d.pth / image_encoder%d.pth pairing. Under a
        # multi-process runtime only rank 0 writes (concurrent writes to
        # one shared path would interleave); params are replicated so
        # every rank could fetch them, but only one may persist.
        if is_main_process():
            save_variables(
                os.path.join(model_dir, f"text_encoder{epoch}.msgpack"),
                {"params": state.text_params})
            save_variables(
                os.path.join(model_dir, f"image_encoder{epoch}.msgpack"),
                {"params": state.cnn_params,
                 "batch_stats": state.cnn_stats})
            print(f"snapshot @ epoch {epoch} -> {model_dir}")
        if jax.process_count() > 1:
            # the attention-grid dump below runs a COLLECTIVE eval_step;
            # gating it on rank 0 would deadlock the others, and running
            # it on all ranks just to write one PNG isn't worth a step —
            # multi-process runs rely on the single-process viz path
            return
        # attention-grid dump (= pretrain_DAMSM.py:100-129 build_super_images)
        try:
            import numpy as np
            from PIL import Image

            from tgsr_tpu.utils.visualize import build_super_images

            batch = (next(val_loader.epoch(0), None)
                     if val_loader is not None else None)
            if batch is None:
                batch = next(train_loader.epoch(0))
            db = trainer._device_batch(batch, None)
            _, attn = trainer.eval_step(state, db)
            r = int(np.sqrt(attn.shape[-1]))
            attn_maps = np.asarray(attn).reshape(
                attn.shape[0], attn.shape[1], r, r)
            # = pretrain_DAMSM.py:122-129's build_super_images(img, captions,
            # ixtoword, attn_maps, att_sze) call: all words, exact layout
            imgs_f = np.asarray(batch["hr"][:4], np.float32) / 127.5 - 1.0
            grid, _ = build_super_images(
                imgs_f, np.asarray(batch["captions"][:4]),
                train_ds.vocab.ixtoword, attn_maps[:4], att_sze=r,
                # the reference defaults this to cfg.TEXT.WORDS_NUM
                # (miscc/utils.py:76); leaving visualize.py's 18 diverges
                # the grid layout for configs with WORDS_NUM != 18
                max_word_num=cfg.TEXT.WORDS_NUM)
            if grid is not None:
                Image.fromarray(grid).save(
                    os.path.join(image_dir, f"attention_maps{epoch}.png"))
        except Exception as e:  # viz must never kill training
            print(f"attention dump failed: {type(e).__name__}: {e}")

    epochs = args.epochs or cfg.TRAIN.MAX_EPOCH
    # the jitted step donates the state buffers, so the `state` local here
    # is unusable after the first step; the sink always holds the live one
    sink = [state]
    from tgsr_tpu.utils.preemption import graceful_sigterm

    rng = jax.random.PRNGKey(args.manualSeed)
    if start_epoch:
        # exact-resume: fit consumes one split per train batch
        # (rng = split(rng)[0]); replay the skipped epochs' splits so the
        # dropout stream continues the uninterrupted run's
        from tgsr_tpu.parallel.mesh import fast_forward_key

        rng = fast_forward_key(rng, start_epoch * len(train_loader),
                               index=0)
    try:
        # SIGTERM (TPU-VM preemption) takes the same graceful path as Ctrl-C
        with graceful_sigterm():
            state, history = trainer.fit(
                state, train_loader, val_loader, epochs=epochs,
                rng=rng,
                snapshot_fn=snapshot,
                snapshot_interval=cfg.TRAIN.SNAPSHOT_INTERVAL,
                state_sink=sink,
                logger=logger,
                start_epoch=start_epoch,
                global_step_offset=start_epoch * len(train_loader),
            )
        for h in history[-5:]:
            print(h)
    except KeyboardInterrupt:
        # = pretrain_DAMSM.py:293-295
        try:
            snapshot(sink[0], -1)
            print("interrupted; snapshot saved")
        except RuntimeError as e:
            # Ctrl-C can land mid-step with the sink holding the donated
            # (already-invalidated) input state; the previous periodic
            # snapshot is then the best available
            print(f"interrupted; final snapshot unsaveable ({e})")
    finally:
        if logger is not None:
            logger.close()  # flushes TB event files when --tensorboard


if __name__ == "__main__":
    main()
