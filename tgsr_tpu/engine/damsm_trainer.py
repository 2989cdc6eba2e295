"""DAMSM encoder pretraining engine.

= pretrain_DAMSM.py: jointly trains the bi-LSTM text encoder and the CNN
image encoder heads with the symmetric words+sentence contrastive losses.

Faithful protocol details:
  * Adam(lr, betas=(0.5, 0.999)) (pretrain_DAMSM.py:270)
  * the reference RE-CREATES the optimizer every epoch with lr *= 0.98 down
    to a floor of lr/10 (pretrain_DAMSM.py:269-284) -- reproduced here as an
    optax schedule with reset-free Adam state (the moments survive in the
    reference too, since only the lr changes... actually the reference
    resets moments each epoch by reconstructing Adam; we preserve THAT
    behavior via `reset_moments_each_epoch=True`)
  * grad-clip 0.25 on the RNN parameters only (pretrain_DAMSM.py:96-97)
  * loss = w_loss0 + w_loss1 + s_loss0 + s_loss1 (both directions)
  * 50-batch validation loss (pretrain_DAMSM.py:133-163)

TPU-native: one jitted train step; the CNN backbone freeze is a
stop_gradient inside CNNEncoder, so the optimizer never materializes
backbone moments.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tgsr_tpu.config import Config
from tgsr_tpu.losses.damsm import sent_loss, words_loss
from tgsr_tpu.models.image_encoder import CNNEncoder, SimpleCNNEncoder
from tgsr_tpu.models.text_encoder import TextEncoder


class DAMSMState(struct.PyTreeNode):
    step: jax.Array
    text_params: Any
    cnn_params: Any
    cnn_stats: Any
    opt_state: Any


class DAMSMTrainer:
    def __init__(self, cfg: Config, vocab_size: int,
                 use_inception: bool = True, freeze_backbone: bool = True,
                 compute_dtype: jnp.dtype = jnp.float32,
                 mesh=None):
        """`compute_dtype=bf16` runs the CNN encoder in bf16 (mixed
        precision: f32 master weights/losses/BN moments); the DAMSM losses
        and the tiny bi-LSTM stay f32.

        `mesh`: optional jax.sharding.Mesh with a 'data' axis — the train/
        eval/embed steps pin every batch leaf to it (DP). The DAMSM losses
        compare every caption against every IMAGE in the global batch
        (B x B score matrices, losses.py:21-136), so XLA inserts the
        all-gathers; semantics are global-batch identical to single-device
        (tests/test_damsm_sharding.py)."""
        self.cfg = cfg
        self.vocab_size = vocab_size
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.freeze_backbone = freeze_backbone and use_inception
        self.text_encoder = TextEncoder(
            vocab_size=vocab_size, nhidden=cfg.TEXT.EMBEDDING_DIM,
            rnn_type=cfg.RNN_TYPE)
        if use_inception:
            self.cnn_encoder = CNNEncoder(nef=cfg.TEXT.EMBEDDING_DIM)
        else:
            self.cnn_encoder = SimpleCNNEncoder(nef=cfg.TEXT.EMBEDDING_DIM)
        self.base_lr = cfg.TRAIN.ENCODER_LR
        self.grad_clip = cfg.TRAIN.RNN_GRAD_CLIP
        self.train_step = self._build_train_step()
        self.eval_step = self._build_eval_step()
        self.embed_step = self._build_embed_step()

    def epoch_lr(self, epoch: int) -> float:
        """lr *= 0.98 per epoch with floor lr/10 (pretrain_DAMSM.py:283-284)."""
        lr = self.base_lr
        for _ in range(epoch):
            if lr > self.base_lr / 10.0:
                lr *= 0.98
        return lr

    def _tx(self) -> optax.GradientTransformation:
        # lr is injected per-step via inject_hyperparams so the jitted step
        # doesn't recompile when the epoch lr changes
        def make(lr):
            return optax.adam(lr, b1=0.5, b2=0.999)

        return optax.inject_hyperparams(make)(lr=self.base_lr)

    def init_state(self, rng: jax.Array, image_size: int = 299,
                   batch_size: int = 2, init_on_cpu: bool = True
                   ) -> DAMSMState:
        """`init_on_cpu` runs the module inits on the host CPU backend
        (when present) and transfers the trees once. flax init executes
        eagerly, and on a remote-compile TPU stack every eager op pays a
        compile round trip — the Inception-v3 init alone is hundreds of
        ops, i.e. many minutes of apparent hang (the CLAUDE.md trap; same
        mechanism as GANTrainer.init_state)."""
        if init_on_cpu:
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None and cpu.platform != jax.devices()[0].platform:
                with jax.default_device(cpu):
                    state = self.init_state(rng, image_size, batch_size,
                                            init_on_cpu=False)
                return jax.device_put(state, jax.devices()[0])
        cfg = self.cfg
        kt, kc = jax.random.split(rng)
        captions = jnp.ones((batch_size, cfg.TEXT.WORDS_NUM), jnp.int32)
        lens = jnp.full((batch_size,), cfg.TEXT.WORDS_NUM, jnp.int32)
        tv = self.text_encoder.init(kt, captions, lens)
        imgs = jnp.zeros((batch_size, image_size, image_size, 3))
        if isinstance(self.cnn_encoder, CNNEncoder):
            cv = self.cnn_encoder.init(kc, imgs,
                                       freeze_backbone=self.freeze_backbone)
        else:
            cv = self.cnn_encoder.init(kc, imgs)
        params = {"text": tv["params"], "cnn": cv["params"]}
        tx = self._tx()
        return DAMSMState(
            step=jnp.zeros((), jnp.int32),
            text_params=tv["params"],
            cnn_params=cv["params"],
            cnn_stats=cv.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    def _cast(self, tree):
        from tgsr_tpu.engine.precision import cast_floats

        return cast_floats(tree, self.compute_dtype)

    def _apply_cnn(self, params, stats, imgs, train: bool):
        from tgsr_tpu.engine.precision import merge_stats

        params = self._cast(params)
        imgs = self._cast(imgs)
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = self._cast(stats)
        kw = {}
        if isinstance(self.cnn_encoder, CNNEncoder):
            kw["freeze_backbone"] = self.freeze_backbone
        if train and stats:
            (feat, code), upd = self.cnn_encoder.apply(
                variables, imgs, train=True, mutable=["batch_stats"], **kw)
            # f32-master stats update (engine/precision.py)
            return (feat.astype(jnp.float32), code.astype(jnp.float32),
                    merge_stats(stats, upd["batch_stats"],
                                self.compute_dtype))
        feat, code = self.cnn_encoder.apply(variables, imgs, train=False, **kw)
        # eval mode never touches the running stats: return them untouched
        return feat.astype(jnp.float32), code.astype(jnp.float32), stats

    def _shard_batch(self, batch):
        """DP: pin every batch leaf to the mesh 'data' axis on dim 0 (no-op
        without a mesh). Same contract as GANTrainer's step."""
        if self.mesh is None:
            return batch
        from tgsr_tpu.parallel.mesh import data_sharding

        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, data_sharding(self.mesh, x.ndim)),
            batch,
        )

    def _loss(self, params, stats, batch, train, dropout_rng=None):
        cfg = self.cfg
        feat, code, new_stats = self._apply_cnn(
            params["cnn"], stats, batch["imgs"], train)
        words, sent = self.text_encoder.apply(
            {"params": params["text"]}, batch["captions"], batch["cap_lens"],
            train=train,
            rngs={"dropout": dropout_rng} if dropout_rng is not None else None,
        )
        g1, g2, g3 = (cfg.TRAIN.SMOOTH.GAMMA1, cfg.TRAIN.SMOOTH.GAMMA2,
                      cfg.TRAIN.SMOOTH.GAMMA3)
        w0, w1, attn = words_loss(feat, words, batch["cap_lens"],
                                  batch.get("class_ids"), g1, g2, g3)
        s0, s1 = sent_loss(code, sent, batch.get("class_ids"), g3)
        total = w0 + w1 + s0 + s1
        metrics = {"w_loss": w0 + w1, "s_loss": s0 + s1, "loss": total}
        return total, (metrics, new_stats, attn)

    def _build_train_step(self):
        tx = self._tx()
        clip = self.grad_clip

        def step_fn(state: DAMSMState, batch, lr, rng):
            batch = self._shard_batch(batch)
            params = {"text": state.text_params, "cnn": state.cnn_params}
            (loss, (metrics, new_stats, _)), grads = jax.value_and_grad(
                self._loss, has_aux=True)(params, state.cnn_stats, batch,
                                          True, rng)
            # clip_grad_norm on RNN params only (pretrain_DAMSM.py:96-97)
            tnorm = optax.global_norm(grads["text"])
            scale = jnp.minimum(1.0, clip / jnp.maximum(tnorm, 1e-12))
            grads = {"text": jax.tree.map(lambda g: g * scale, grads["text"]),
                     "cnn": grads["cnn"]}
            opt_state = state.opt_state
            opt_state.hyperparams["lr"] = lr
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["rnn_grad_norm"] = tnorm
            return state.replace(
                step=state.step + 1,
                text_params=params["text"],
                cnn_params=params["cnn"],
                cnn_stats=new_stats,
                opt_state=opt_state,
            ), metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    def _build_eval_step(self):
        def eval_fn(state: DAMSMState, batch):
            batch = self._shard_batch(batch)
            params = {"text": state.text_params, "cnn": state.cnn_params}
            _, (metrics, _, attn) = self._loss(params, state.cnn_stats,
                                               batch, False)
            return metrics, attn

        return jax.jit(eval_fn)

    def _build_embed_step(self):
        def embed_fn(state: DAMSMState, batch):
            """Eval-mode DAMSM embeddings of a batch: (region features
            [N,R,E], image codes [N,E], word embs [N,T,E], sent embs
            [N,E]) — the inputs of engine.evaluator.rank_r_precision and
            of any retrieval consumer (TextSRGTDataset use-case,
            datasets.py:1721-1885)."""
            batch = self._shard_batch(batch)
            params = {"text": state.text_params, "cnn": state.cnn_params}
            feat, code, _ = self._apply_cnn(
                params["cnn"], state.cnn_stats, batch["imgs"], train=False)
            words, sent = self.text_encoder.apply(
                {"params": params["text"]}, batch["captions"],
                batch["cap_lens"], train=False)
            return feat, code, words, sent

        return jax.jit(embed_fn)

    def reset_optimizer(self, state: DAMSMState) -> DAMSMState:
        """= the reference's per-epoch optimizer reconstruction
        (pretrain_DAMSM.py:269-270), which zeroes the Adam moments."""
        params = {"text": state.text_params, "cnn": state.cnn_params}
        return state.replace(opt_state=self._tx().init(params))

    # -- epoch driver ---------------------------------------------------------

    def fit(self, state: DAMSMState, train_loader, val_loader=None,
            epochs: int = 1, rng: Optional[jax.Array] = None,
            log_every: int = 200, snapshot_fn: Optional[Callable] = None,
            snapshot_interval: int = 0,
            reset_moments_each_epoch: bool = True,
            preprocess: Optional[Callable] = None,
            state_sink: Optional[list] = None,
            logger=None,
            start_epoch: int = 0,
            global_step_offset: int = 0):
        """`state_sink`: a 1-element list updated with the LIVE state each
        step -- the caller's only handle on trained weights if fit is
        interrupted (the `state` argument's buffers are donated by the
        jitted step and cannot be saved afterwards).
        `logger`: optional utils.observability.MetricsLogger; every
        history row is mirrored there (JSONL [+ TensorBoard]).
        `start_epoch`: resume point (= the reference's filename-parsed
        NET_E epoch + 1, pretrain_DAMSM.py:182-185); epoch-granular resume
        is exact because the reference protocol re-creates the optimizer
        (zeroing the Adam moments) at every epoch start anyway. Pass a
        step-aligned rng (the caller fast-forwards the per-batch splits)
        and `global_step_offset` = start_epoch * batches/epoch so logged
        steps continue the uninterrupted run's axis."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        history = []
        gstep = global_step_offset
        if state_sink is not None:
            state_sink[0] = state
        for epoch in range(start_epoch, epochs):
            lr = self.epoch_lr(epoch)
            if reset_moments_each_epoch and epoch > 0:
                state = self.reset_optimizer(state)
            for i, batch in enumerate(train_loader.epoch(epoch)):
                rng, sub = jax.random.split(rng)
                db = self._device_batch(batch, preprocess)
                state, metrics = self.train_step(state, db, lr, sub)
                if state_sink is not None:
                    state_sink[0] = state
                gstep += 1
                if log_every and i % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    history.append({"epoch": epoch, "it": i, "lr": lr, **m})
                    if logger is not None:
                        logger.log(gstep, epoch=epoch, lr=lr, **m)
                    # failure detection at the existing sync points (the
                    # fetch already forces the step): a diverged run stops
                    # here, resumable from the last snapshot
                    import math

                    bad = [k for k, v in m.items()
                           if not math.isfinite(v)]
                    if bad:
                        raise FloatingPointError(
                            f"NaN/Inf in DAMSM metrics {bad} at epoch "
                            f"{epoch} it {i}; resume from the last "
                            f"snapshot with a lower ENCODER_LR")
            if val_loader is not None:
                vloss = self.evaluate(state, val_loader, preprocess)
                history.append({"epoch": epoch, "val": vloss})
                if logger is not None:
                    logger.log(gstep, epoch=epoch, val=vloss)
            if snapshot_fn and snapshot_interval and (
                    epoch % snapshot_interval == 0 or epoch == epochs - 1):
                snapshot_fn(state, epoch)
        return state, history

    def evaluate(self, state, val_loader, preprocess=None,
                 max_batches: int = 50):
        """50-batch val loss (= evaluate, pretrain_DAMSM.py:133-163)."""
        tot, n = 0.0, 0
        for i, batch in enumerate(val_loader.epoch(0)):
            if i >= max_batches:
                break
            metrics, _ = self.eval_step(state, self._device_batch(batch,
                                                                  preprocess))
            tot += float(metrics["loss"])
            n += 1
        return tot / n if n else float("nan")

    def _device_batch(self, batch, preprocess):
        import numpy as np

        if preprocess is not None:
            imgs = preprocess(batch["hr"])
        else:
            imgs = batch["hr"].astype(np.float32) / 127.5 - 1.0
        out = {
            "imgs": jnp.asarray(imgs),
            "captions": jnp.asarray(batch["captions"]),
            "cap_lens": jnp.asarray(batch["cap_lens"]),
            "class_ids": jnp.asarray(batch["class_ids"]),
        }
        if self.mesh is not None:
            # place host batches directly in their DP layout so the step's
            # with_sharding_constraint is a no-op instead of a reshard
            from tgsr_tpu.parallel.multihost import land_batch
            from tgsr_tpu.parallel.mesh import batch_shards

            n_data = batch_shards(self.mesh)
            b = out["captions"].shape[0]
            if b % n_data:
                raise ValueError(
                    f"DP batch {b} does not divide the mesh data axis "
                    f"({n_data}); use a drop_last loader (the reference "
                    f"semantics, pretrain_DAMSM.py:248) or pad the host "
                    f"batch with parallel.mesh.pad_to_multiple")
            # land_batch: pre-sharded device_put on one process, per-host
            # slice assembly under a multi-process runtime
            out = land_batch(self.mesh, out)
        return out
