"""Adversarial SR training engine.

The reference snapshot ships NO GAN training loop (SURVEY.md 2.9): only the
loss API (miscc/losses.py), label helpers (trainer_objective.py:43-53), EMA
helpers (miscc/utils.py:467-474) and LR defaults (config.py:37-38) pin the
contract. This engine reconstructs the standard AttnGAN-style trainer those
imply, TPU-native:

  * one jitted `train_step` containing BOTH the per-scale D updates and the
    joint G (netG + netGH) update -- no host round-trips between them
  * optax Adam(lr, b1=0.5, b2=0.999) per network (reference LR defaults)
  * generator EMA (= copy_G_params/load_params pattern)
  * losses: per-scale discriminator_loss + generator_loss [+ DAMSM terms
    when an image encoder is provided] + KL(mu, logvar) + pixel MSE on both
    pyramids
  * mesh-aware: with a mesh, the step pins every batch leaf to the 'data'
    axis via with_sharding_constraint (DP); params/opt-state keep the
    caller's placement (replicated, or sharded over 'model' for TP)
  * D runs train-mode BatchNorm (batch statistics) exactly as a torch D in
    train() mode would, with running averages threaded into d_stats

Numerical note: train-mode BatchNorm backward multiplies incoming gradients
by rsqrt(var + eps); at an exactly-constant (zero-variance) input image the
~18 stacked BNs amplify by rsqrt(1e-5)^18 ~ 1e45 -> inf -> NaN. Real images
never have zero variance (torch behaves identically); synthetic smoke tests
must use noise, not constant tensors.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgsr_tpu.config import Config
from tgsr_tpu.losses.gan import discriminator_loss, generator_loss
from tgsr_tpu.losses.pixel import kl_loss, mse_pyramid
from tgsr_tpu.models.discriminator import DNet
from tgsr_tpu.models.generator import GSRNetLow
from tgsr_tpu.models.generator_hf import NetGHighWeight
from tgsr_tpu.models.text_encoder import TextEncoder


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any  # {'netg': ..., 'netgh': ...}
    g_stats: Any  # batch_stats for G nets
    g_ema: Any  # EMA copy of g_params
    d_params: Any  # {'d64': ..., 'd128': ..., 'd256': ...}
    d_stats: Any
    g_opt: Any
    d_opt: Any


class GANTrainer:
    def __init__(
        self,
        cfg: Config,
        vocab_size: int,
        text_vars: Dict[str, Any],
        image_encoder_apply: Optional[Callable] = None,
        mesh: Optional[Mesh] = None,
        ema_decay: float = 0.999,
        compute_dtype: jnp.dtype = jnp.float32,
        grad_accum: int = 1,
        loss_weights: Optional[Dict[str, float]] = None,
        remat: bool = False,
        g_lr=None,
        d_lr=None,
        fsdp: bool = False,
        reuse_g_forward: bool = False,
    ):
        """`compute_dtype=jnp.bfloat16` runs the G/D conv stacks in bf16
        (standard mixed precision): params/optimizer/EMA stay f32, casts
        happen at apply time, losses and BN batch statistics compute in f32
        (flax upcasts moments), logits are cast back to f32 before the BCE.
        Inference fidelity of fully-cast bf16 is 55.7 dB vs f32
        (docs/PERF.md); training-step metric agreement is tested in
        tests/test_gan_trainer_sharding.py.

        `loss_weights` scales the G composite's terms: keys 'adv', 'pixel',
        'kl', plus 'damsm' scaling the words/sent contrastive terms INSIDE
        the adv total (generator_loss w/s args — they also ride 'adv', so
        the effective DAMSM weight is adv*damsm; the reference's LAMBDA is
        applied on top). Each defaults to 1.0 (the reconstructed reference
        contract, SURVEY.md 3.5 -- the snapshot ships no trainer, so the
        combination weights are a framework knob). SR-GAN practice weights
        the adversarial term far below the content term (SRGAN uses 1e-3);
        pixel-dominant settings are what the overfit learning proof uses
        (examples/overfit_demo.py). Metrics always report UNWEIGHTED term
        values; 'g_loss' is the weighted total that is differentiated.

        `fsdp=True` (requires a mesh) keeps params/optimizer/EMA stored
        SHARDED over the 'data' axis (ZeRO-3 layout, parallel.mesh.fsdp_spec):
        XLA all-gathers each param before use and reduce-scatters its
        gradient, cutting per-device state memory ~n_data-fold. Place the
        initial state with parallel.mesh.fsdp_state; the step re-pins the
        updated state to the same layout so it is stable across donated
        steps. Math is unchanged vs DP (tests/test_fsdp.py)."""
        self.cfg = cfg
        self.mesh = mesh
        if fsdp and mesh is None:
            raise ValueError("fsdp=True requires a mesh")
        self.fsdp = fsdp
        # reuse_g_forward=True computes the generator chain ONCE per step
        # via jax.vjp: the D update consumes stop_gradient of its outputs
        # and the G update pulls the loss cotangents back through the saved
        # vjp, instead of re-running the identical forward (same params,
        # same rng_ca) inside g_loss_fn. Mathematically identical (the
        # AttnGAN D-then-G-against-updated-D ordering is preserved; see
        # tests/test_remat.py::test_reuse_g_forward_matches_baseline);
        # trades the second forward's FLOPs for holding the vjp residuals
        # across the D update. Measured on v5e B=128 bf16: see docs/PERF.md
        # "Training-step G-forward reuse".
        self.reuse_g_forward = reuse_g_forward
        self.ema_decay = ema_decay
        self.compute_dtype = compute_dtype
        self.text_encoder = TextEncoder(
            vocab_size=vocab_size, nhidden=cfg.TEXT.EMBEDDING_DIM,
            rnn_type=cfg.RNN_TYPE)
        # frozen DAMSM encoder; coerce to device arrays — msgpack-loaded
        # trees hold NUMPY leaves, and the jitted step closure-captures
        # these, so the embedding table would be indexed by a tracer
        # through numpy's __getitem__, which rejects it
        self.text_vars = jax.tree.map(jnp.asarray, text_vars)
        self.image_encoder_apply = image_encoder_apply

        # remat rematerializes G activations in the backward (jax.checkpoint
        # via nn.remat): trades recompute for not keeping the 2x-channel GLU
        # temps and attention buffers live. Accepts False, True/'all' (both
        # generators), 'low' (GSRNetLow stages only) or 'high' (NetGHighWeight
        # blocks only) -- required for batch >= 256 on a single 16 GB v5e,
        # but FULL remat at B=256 measures SLOWER than B=128 without
        # (docs/PERF.md "Training batch scaling"), hence the granularity.
        if remat not in (False, True, "all", "low", "high"):
            raise ValueError(f"remat must be False/True/'all'/'low'/'high', "
                             f"got {remat!r}")
        # model family switch (same convention as SRPipeline /
        # trainer_objective.py:74-88: BRANCH_NUM==4 is the x8 model.py
        # family, anything else the models16 x16 family with its tying
        # quirks). The step/losses/D stack are scale-generic.
        if cfg.TREE.BRANCH_NUM == 4:
            self.netg = GSRNetLow(ngf=cfg.GAN.GF_DIM,
                                  c_dim=cfg.GAN.CONDITION_DIM,
                                  n_stages=cfg.n_stages, r_num=cfg.GAN.R_NUM,
                                  remat=remat in (True, "all", "low"))
            self.netgh = NetGHighWeight(ngf=cfg.GAN.GF_DIM,
                                        weightmap=cfg.EVAL.WEIGHTMAP,
                                        low=cfg.EVAL.INPUT_NETGH,
                                        remat=remat in (True, "all", "high"))
        else:
            from tgsr_tpu.models.models16 import (
                GSRNetLow16,
                NetGHighWeight16,
            )

            self.netg = GSRNetLow16(ngf=cfg.GAN.GF_DIM,
                                    c_dim=cfg.GAN.CONDITION_DIM,
                                    r_num=cfg.GAN.R_NUM,
                                    remat=remat in (True, "all", "low"))
            self.netgh = NetGHighWeight16(
                ngf=cfg.GAN.GF_DIM, weightmap=cfg.EVAL.WEIGHTMAP,
                low=cfg.EVAL.INPUT_NETGH,
                sizes=tuple(cfg.pyramid_sizes()),
                remat=remat in (True, "all", "high"))
        self.sizes = cfg.pyramid_sizes()
        self.dnets = [
            DNet(ndf=cfg.GAN.DF_DIM, nef=cfg.TEXT.EMBEDDING_DIM, img_size=s)
            for s in self.sizes
        ]
        # g_lr/d_lr override cfg.TRAIN.*_LR; either may be a float or an
        # optax schedule (step -> lr), e.g. cosine decay for long overfit
        # demonstrations (examples/overfit_demo.py)
        self.g_tx = optax.adam(
            cfg.TRAIN.GENERATOR_LR if g_lr is None else g_lr,
            b1=0.5, b2=0.999)
        self.d_tx = optax.adam(
            cfg.TRAIN.DISCRIMINATOR_LR if d_lr is None else d_lr,
            b1=0.5, b2=0.999)
        if grad_accum > 1:
            # effective batch = grad_accum * batch: grads accumulate across
            # micro-steps, both optimizers apply every grad_accum-th step
            # (the D-then-G ordering holds at each application step)
            self.g_tx = optax.MultiSteps(self.g_tx, grad_accum)
            self.d_tx = optax.MultiSteps(self.d_tx, grad_accum)
        self.grad_accum = grad_accum
        self.loss_weights = dict(loss_weights or {})
        self.train_step = self._build_train_step()
        self._train_scan = None  # built lazily (compile cost)
        self._eval_step = None  # built lazily by eval_metrics

    # -- init -----------------------------------------------------------------

    def init_state(self, rng: jax.Array, batch_size: int = 2,
                   init_on_cpu: bool = True) -> GANTrainState:
        """Model/optimizer init. `init_on_cpu` runs the 5 module inits on the
        host CPU backend (when present) and transfers the trees once --
        avoiding 5 separate accelerator compiles, which on a remote-compile
        TPU stack cost minutes of startup.

        Every parameter/BN-stat shape is batch-independent, so the init
        forwards always run at a tiny dummy batch no matter what
        `batch_size` the caller will train with (init at B=256 used to pay
        a ~15-minute single-core init forward in the scaling probes;
        identical trees verified by tests/test_remat.py et al., which init
        at one size and step at another)."""
        batch_size = min(batch_size, 2)
        if init_on_cpu:
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None and cpu.platform != jax.devices()[0].platform:
                with jax.default_device(cpu):
                    state = self.init_state(rng, batch_size,
                                            init_on_cpu=False)
                return jax.device_put(state, jax.devices()[0])
        cfg = self.cfg
        kg, kgh, kca, *kd = jax.random.split(rng, 3 + len(self.dnets))
        lr = jnp.zeros((batch_size, cfg.TREE.BASE_SIZE, cfg.TREE.BASE_SIZE, 3))
        words = jnp.zeros((batch_size, cfg.TEXT.WORDS_NUM, cfg.TEXT.EMBEDDING_DIM))
        sent = jnp.zeros((batch_size, cfg.TEXT.EMBEDDING_DIM))
        mask = jnp.zeros((batch_size, cfg.TEXT.WORDS_NUM), bool)

        # kca feeds the CA-net's sampling stream during init (distinct
        # from the param-init key; only shapes matter here, but reusing kg
        # for both reads as a wrong-variable bug)
        vg = self.netg.init(kg, lr, sent, words, mask, rng=kca, train=True)
        fake = [jnp.zeros((batch_size, s, s, 3)) for s in self.sizes]
        vgh = self.netgh.init(kgh, lr, fake, lr, train=True)

        d_params, d_stats = {}, {}
        for k, dn, s in zip(kd, self.dnets, self.sizes):
            img = jnp.zeros((batch_size, s, s, 3))
            v = dn.init(k, img, sent, train=True)
            d_params[f"d{s}"] = v["params"]
            d_stats[f"d{s}"] = v.get("batch_stats", {})

        g_params = {"netg": vg["params"], "netgh": vgh["params"]}
        g_stats = {"netg": vg.get("batch_stats", {}),
                   "netgh": vgh.get("batch_stats", {})}
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_stats=g_stats,
            # a real copy: g_ema aliasing g_params breaks donated-buffer
            # execution (same buffer passed twice into the donating jit)
            g_ema=jax.tree.map(jnp.copy, g_params),
            d_params=d_params,
            d_stats=d_stats,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
        )

    # -- the fused step --------------------------------------------------------

    def _cast(self, tree):
        from tgsr_tpu.engine.precision import cast_floats

        return cast_floats(tree, self.compute_dtype)

    def _merge_stats(self, master, new):
        """f32-master update of BN running stats: undo the bf16 cast of
        the OLD state that seeded flax's (otherwise-f32) running-average
        blend (engine/precision.py merge_stats -- exact recovery)."""
        from tgsr_tpu.engine.precision import merge_stats

        return merge_stats(master, new, self.compute_dtype)

    def _g_forward(self, g_params, g_stats, lr_img, sent, words, mask, rng):
        """Generator chain with mutable batch stats. Returns
        (fake_pyr, fine_pyr, mu, logvar, new_stats) -- all float32 (the
        conv stacks run in compute_dtype internally)."""
        lr_img, sent, words = (self._cast(lr_img), self._cast(sent),
                               self._cast(words))
        (fake, atts, mu, logvar), gupd = self.netg.apply(
            {"params": self._cast(g_params["netg"]),
             "batch_stats": self._cast(g_stats["netg"])},
            lr_img, sent, words, mask, rng=rng, train=True,
            mutable=["batch_stats"],
        )
        if self.netgh.low != "lr":
            # = prepare_datablur's LRimb (PIL GaussianBlur 2 equivalent)
            from tgsr_tpu.ops.image import gaussian_blur

            lr_blur = gaussian_blur(lr_img.astype(jnp.float32),
                                    2.0).astype(lr_img.dtype)
        else:
            lr_blur = lr_img
        (fine, _, _), ghupd = self.netgh.apply(
            {"params": self._cast(g_params["netgh"]),
             "batch_stats": self._cast(g_stats["netgh"])},
            lr_img, fake, lr_blur, train=True, mutable=["batch_stats"],
        )
        new_stats = self._merge_stats(
            g_stats, {"netg": gupd["batch_stats"],
                      "netgh": ghupd["batch_stats"]})
        fake = [f.astype(jnp.float32) for f in fake]
        fine = [f.astype(jnp.float32) for f in fine]
        return fake, fine, mu.astype(jnp.float32), logvar.astype(jnp.float32), new_stats

    def eval_metrics(self, g_params, g_stats, batch) -> Dict[str, Any]:
        """Eval-mode quality of the generator chain on a validation batch:
        mean Y-channel PSNR (BT.601, the reference metric definition
        trainer_objective.py:168-181) + SSIM of G(LR) vs the batch's GT
        pyramid top. Pass `state.g_ema` for the EMA curve (the weights a
        snapshot ships), `state.g_params` for the raw one. Jitted on first
        use; eval-mode BN (running stats, no mutation), fixed CA-net key
        (its c_code output is unused — deterministic, PARITY.md)."""
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        return self._eval_step(g_params, g_stats, batch)

    def _build_eval_step(self):
        from tgsr_tpu.ops.image import (denormalize_to_uint8, psnr_batch,
                                        rgb2y, ssim)

        @jax.jit
        def eval_fn(g_params, g_stats, batch):
            words, sent = self.text_encoder.apply(
                self.text_vars, batch["captions"], batch["cap_lens"])
            mask = batch["captions"] == 0
            lr = self._cast(batch["lr"])
            fake, _, _, _ = self.netg.apply(
                {"params": self._cast(g_params["netg"]),
                 "batch_stats": self._cast(g_stats["netg"])},
                lr, self._cast(sent), self._cast(words), mask,
                rng=jax.random.PRNGKey(42), train=False)
            if self.netgh.low != "lr":
                from tgsr_tpu.ops.image import gaussian_blur

                lr_blur = gaussian_blur(lr.astype(jnp.float32),
                                        2.0).astype(lr.dtype)
            else:
                lr_blur = lr
            fine, _, _ = self.netgh.apply(
                {"params": self._cast(g_params["netgh"]),
                 "batch_stats": self._cast(g_stats["netgh"])},
                lr, fake, lr_blur, train=False)
            sr8 = denormalize_to_uint8(fine[-1].astype(jnp.float32))
            gt8 = denormalize_to_uint8(batch["real_pyramid"][-1])
            y_sr = rgb2y(sr8).astype(jnp.float32)[..., None]
            y_gt = rgb2y(gt8).astype(jnp.float32)[..., None]
            return {"psnr_y": jnp.mean(psnr_batch(y_sr, y_gt)),
                    "ssim_y": jnp.mean(ssim(y_sr, y_gt))}

        return eval_fn

    def _d_closures(self, dnet, params, stats_cell, key):
        """Train-mode D closures (torch convention: D always runs in train
        mode, BN normalizes with batch statistics and updates running
        averages as a side effect). `stats_cell[key]` holds the latest
        running stats; each call threads its update through, matching the
        sequential call order of the reference's discriminator_loss /
        generator_loss (real features -> fake features -> cond heads)."""

        params = self._cast(params)

        def _apply(method, *args):
            out, upd = dnet.apply(
                {"params": params,
                 "batch_stats": self._cast(stats_cell[key])},
                *args, train=True, mutable=["batch_stats"], method=method,
            )
            stats_cell[key] = self._merge_stats(stats_cell[key],
                                                upd["batch_stats"])
            return out

        def d_feat(img):
            return _apply(DNet.features, self._cast(img))

        def d_cond(h, sent):
            # logits back to f32: the BCE losses stay full precision
            return _apply(DNet.cond_logit, h,
                          self._cast(sent)).astype(jnp.float32)

        def d_uncond(h):
            return _apply(DNet.uncond_logit, h).astype(jnp.float32)

        return d_feat, d_cond, d_uncond

    def _build_train_step(self):
        cfg = self.cfg
        gammas = (cfg.TRAIN.SMOOTH.GAMMA1, cfg.TRAIN.SMOOTH.GAMMA2,
                  cfg.TRAIN.SMOOTH.GAMMA3)

        def step_fn(state: GANTrainState, batch: Dict[str, jax.Array],
                    rng: jax.Array):
            """batch: real_pyramid (list of [B,s,s,3]), lr [B,b,b,3],
            captions [B,T], cap_lens [B], class_ids [B]."""
            if self.mesh is not None:
                # DP: pin every batch leaf to the mesh's batch axes on dim 0
                # (('dcn','data') on hybrid multi-slice meshes, 'data'
                # otherwise) regardless of how the caller placed it;
                # params/opt-state keep their caller-supplied shardings
                # (replicated or TP over 'model').
                from tgsr_tpu.parallel.mesh import batch_spec

                batch = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, NamedSharding(self.mesh,
                                         batch_spec(self.mesh, x.ndim))),
                    batch,
                )
            rng_ca, rng_next = jax.random.split(rng)
            words, sent = self.text_encoder.apply(
                self.text_vars, batch["captions"], batch["cap_lens"])
            words = jax.lax.stop_gradient(words)
            sent = jax.lax.stop_gradient(sent)
            mask = batch["captions"] == 0
            real_pyr = batch["real_pyramid"]

            # ---- generator forward (shared by D and G losses) ----
            if self.reuse_g_forward:
                # one forward for the whole step: vjp saves the residuals so
                # the G backward below reuses THIS forward instead of
                # re-running it inside a grad closure
                def g_out(g_params):
                    fake, fine, mu, logvar, new_stats = self._g_forward(
                        g_params, state.g_stats, batch["lr"], sent, words,
                        mask, rng_ca)
                    return (fake, fine, mu, logvar), new_stats

                (fake, fine, mu, logvar), g_vjp, new_g_stats = jax.vjp(
                    g_out, state.g_params, has_aux=True)
            else:
                fake, fine, mu, logvar, _ = self._g_forward(
                    state.g_params, state.g_stats, batch["lr"], sent, words,
                    mask, rng_ca)
            fine_sg = [jax.lax.stop_gradient(f) for f in fine]

            # ---- D update: sum of per-scale losses, one fused grad.
            # D runs train-mode BN (batch statistics); updated running
            # averages thread through the aux output into new_state.d_stats,
            # mirroring torch's train-mode side effects.
            def d_loss_fn(d_params):
                stats_cell = dict(state.d_stats)
                total = 0.0
                for dn, s, real, fk in zip(self.dnets, self.sizes, real_pyr,
                                           fine_sg):
                    closures = self._d_closures(dn, d_params[f"d{s}"],
                                                stats_cell, f"d{s}")
                    total = total + discriminator_loss(
                        *closures, real, fk, sent)
                return total, stats_cell

            (d_loss, d_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params)
            d_stats = jax.lax.stop_gradient(d_stats)
            d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                                state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)

            # ---- G update (against the UPDATED D, AttnGAN convention).
            # The G-step D calls also run train-mode BN and also update D
            # running stats (torch does the same: netD stays in train mode
            # during the G backward).
            def g_composite(outs):
                """G loss from generator OUTPUTS (fake/fine pyramids, mu,
                logvar) against the UPDATED D — shared by both paths."""
                fake_g, fine_g, mu_g, logvar_g = outs
                stats_cell = dict(d_stats)
                ds = [
                    self._d_closures(dn, d_params[f"d{s}"], stats_cell,
                                     f"d{s}")
                    for dn, s in zip(self.dnets, self.sizes)
                ]
                dw = self.loss_weights.get("damsm", 1.0)
                adv, logs = generator_loss(
                    ds, self.image_encoder_apply, fine_g, sent, words,
                    batch["cap_lens"], batch.get("class_ids"),
                    gammas, cfg.TRAIN.SMOOTH.LAMBDA, w=dw, s=dw,
                )
                kl = kl_loss(mu_g, logvar_g)
                pix = mse_pyramid(fake_g, real_pyr) + mse_pyramid(fine_g,
                                                                  real_pyr)
                w = self.loss_weights
                total = (w.get("adv", 1.0) * adv + w.get("kl", 1.0) * kl
                         + w.get("pixel", 1.0) * pix)
                logs.update({"kl": kl, "pixel": pix, "adv": adv})
                return total, (logs, stats_cell)

            if self.reuse_g_forward:
                (g_loss, (logs, d_stats2)), out_ct = jax.value_and_grad(
                    g_composite, has_aux=True)((fake, fine, mu, logvar))
                (g_grads,) = g_vjp(out_ct)
            else:
                def g_loss_fn(g_params):
                    fake_g, fine_g, mu_g, logvar_g, new_stats = (
                        self._g_forward(g_params, state.g_stats, batch["lr"],
                                        sent, words, mask, rng_ca))
                    total, (logs, stats_cell) = g_composite(
                        (fake_g, fine_g, mu_g, logvar_g))
                    return total, (logs, new_stats, stats_cell)

                (g_loss, (logs, new_g_stats, d_stats2)), g_grads = (
                    jax.value_and_grad(g_loss_fn, has_aux=True)(
                        state.g_params))
            d_stats2 = jax.lax.stop_gradient(d_stats2)
            g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                                state.g_params)
            g_params = optax.apply_updates(state.g_params, g_updates)
            if self.grad_accum > 1:
                # blend the EMA only on micro-steps where MultiSteps actually
                # applied the optimizer (mini_step wrapped to 0) -- otherwise
                # the frozen-params blends would compress the effective EMA
                # horizon by a factor of grad_accum
                decay = jnp.where(g_opt.mini_step == 0, self.ema_decay, 1.0)
            else:
                decay = self.ema_decay
            g_ema = jax.tree.map(
                lambda e, p: e * decay + p * (1 - decay),
                state.g_ema, g_params)

            new_state = state.replace(
                step=state.step + 1,
                g_params=g_params, g_stats=new_g_stats, g_ema=g_ema,
                d_params=d_params, d_stats=d_stats2, d_opt=d_opt, g_opt=g_opt,
            )
            if self.fsdp:
                # pin the updated state back to the FSDP storage layout:
                # without this XLA is free to emit replicated outputs, and
                # the layout (hence the memory saving) would drift on the
                # next donated step
                from tgsr_tpu.parallel.mesh import fsdp_spec

                n_data = self.mesh.shape["data"]
                new_state = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, NamedSharding(self.mesh,
                                         fsdp_spec(x.shape, n_data))),
                    new_state,
                )
            metrics = {"d_loss": d_loss, "g_loss": g_loss, **logs}
            return new_state, metrics, rng_next

        self._step_fn = step_fn
        return jax.jit(step_fn, donate_argnums=(0,))

    # -- multi-step scan ---------------------------------------------------

    def train_steps(self, state, batches, rng):
        """Run K training steps inside ONE compiled program.

        `batches`: the same pytree as train_step's batch, with a leading
        [K, ...] axis on every leaf (stack K batches). lax.scan compiles the
        step body once and iterates on-device -- no per-step dispatch, which
        matters on hosts with high dispatch overhead (this dev tunnel pays
        ~150 ms per call; a production host less, but never zero).

        Returns (state, metrics stacked [K], rng).
        """
        if self._train_scan is None:
            def scan_fn(state, batches, rng):
                def body(carry, batch):
                    st, r = carry
                    st, metrics, r = self._step_fn(st, batch, r)
                    return (st, r), metrics

                (state, rng), ms = jax.lax.scan(body, (state, rng), batches)
                return state, ms, rng

            self._train_scan = jax.jit(scan_fn, donate_argnums=(0,))
        return self._train_scan(state, batches, rng)

    # -- capacity planning -------------------------------------------------

    def plan_batch(self, state=None, budget_bytes: Optional[int] = None,
                   lo: int = 8, hi: int = 1024, quantum: int = 8) -> int:
        """Largest training batch whose fused D+G step FITS the device, by
        compile-time memory bisection (utils.memory) — the B=160/256 OOM
        region of docs/PERF.md "Training batch scaling" was mapped by
        crash-retry; this derives it from XLA's AOT plan without running
        a step. Each probe is one compile; call once per (device, model,
        remat policy). Returns 0 if even `lo` does not fit; raises
        ValueError when no budget is known (e.g. CPU backends).

        `state`: an existing GANTrainState for the param/opt shape tree
        (shapes are batch-independent); built at a tiny batch if omitted.
        """
        from tgsr_tpu.utils.memory import max_feasible_batch

        if state is None:
            state = self.init_state(jax.random.PRNGKey(0), batch_size=2)
        state_spec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            state)
        T = self.cfg.TEXT.WORDS_NUM
        base = self.cfg.TREE.BASE_SIZE
        sizes = self.sizes
        k0 = jax.random.PRNGKey(0)  # spec matches raw/typed key convention
        rng_spec = jax.ShapeDtypeStruct(k0.shape, k0.dtype)
        # production step: donated state, same jit as train_step
        step = jax.jit(self._step_fn, donate_argnums=(0,))

        def make(b):
            batch_spec = {
                "lr": jax.ShapeDtypeStruct((b, base, base, 3), jnp.float32),
                "real_pyramid": [
                    jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32)
                    for s in sizes
                ],
                "captions": jax.ShapeDtypeStruct((b, T), jnp.int32),
                "cap_lens": jax.ShapeDtypeStruct((b,), jnp.int32),
                "class_ids": jax.ShapeDtypeStruct((b,), jnp.int32),
            }
            return step, (state_spec, batch_spec, rng_spec)

        best, _ = max_feasible_batch(make, budget_bytes=budget_bytes,
                                     lo=lo, hi=hi, quantum=quantum)
        return best


def clip_by_global_norm(tx: optax.GradientTransformation,
                        max_norm: float) -> optax.GradientTransformation:
    return optax.chain(optax.clip_by_global_norm(max_norm), tx)
