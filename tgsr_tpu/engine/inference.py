"""Batched, jitted, mesh-sharded SR inference engine.

= the inference pipeline of condGANTrainer.gen_exampleSRHL
(trainer_objective.py:55-165): text-encode the caption, run the
low-frequency attentive generator, refine with the high-frequency branch,
return the finest image. Where the reference loops images one-at-a-time at
batch 1 on one GPU, this engine jits the whole chain once (static shapes),
batches it, and shards the batch over the 'data' mesh axis.

Compute dtype: `bfloat16` runs the conv/attention stack on the MXU at full
rate; params are kept in float32 and cast at use (bf16 matmul accumulates in
f32 on TPU). PSNR impact is validated in tests/bench against the f32 path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgsr_tpu.config import Config
from tgsr_tpu.models.generator import GSRNetLow, GSRNetLowStage1
from tgsr_tpu.models.generator_hf import NetGHighWeight
from tgsr_tpu.models.text_encoder import TextEncoder


class SRPipeline:
    """Text-guided SR inference: (LR, captions, cap_lens) -> SR.

    Construct with converted variable trees (see tgsr_tpu.checkpoints) or
    freshly-initialized ones. `mesh=None` runs single-device.
    """

    def __init__(
        self,
        cfg: Config,
        vocab_size: int,
        text_vars: Dict[str, Any],
        netg_vars: Dict[str, Any],
        netgh_vars: Dict[str, Any],
        mesh: Optional[Mesh] = None,
        compute_dtype: jnp.dtype = jnp.float32,
        return_attn: bool = False,
        fused_upsample: bool = False,
        quant_scales: Optional[Dict[str, Dict[str, float]]] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.return_attn = return_attn
        # int8 serving mode (engine/quant.py): {"netg": {...}, "netgh": {...}}
        # calibrated per-conv activation scales; None = full-precision path.
        # An optional "_meta" entry (cli.calibrate provenance) is split off
        # and VERIFIED against the loaded weights below — mismatched scales
        # must not apply silently.
        self.quant_scales, self.quant_meta = ({}, {})
        if quant_scales:
            from tgsr_tpu.engine.quant import check_scales, split_scales_meta

            self.quant_scales, self.quant_meta = split_scales_meta(
                quant_scales)
            check_scales(self.quant_scales, netg_vars, netgh_vars,
                         meta=self.quant_meta)
        # the HF branch's blurred-LR input (EVAL.INPUT_NETGH 'lrblur' /
        # 'lr-lrblur' = trainer_objective.py:113-114 LRimb, PIL
        # GaussianBlur(2) equivalent); low='lr' never reads it
        self._needs_lr_blur = cfg.EVAL.INPUT_NETGH != "lr"

        self.text_encoder = TextEncoder(
            vocab_size=vocab_size,
            nhidden=cfg.TEXT.EMBEDDING_DIM,
            rnn_type=cfg.RNN_TYPE,
        )
        # model family switch (= trainer_objective.py:74-88: BRANCH_NUM==4
        # uses model.py, otherwise models16)
        if cfg.TREE.BRANCH_NUM == 4:
            if cfg.EVAL.STAGE1:
                self.netg = GSRNetLowStage1(
                    ngf=cfg.GAN.GF_DIM, c_dim=cfg.GAN.CONDITION_DIM,
                    r_num=cfg.GAN.R_NUM)
            else:
                self.netg = GSRNetLow(
                    ngf=cfg.GAN.GF_DIM, c_dim=cfg.GAN.CONDITION_DIM,
                    n_stages=cfg.n_stages, r_num=cfg.GAN.R_NUM,
                    fused_upsample=fused_upsample,
                )
            self.netgh = NetGHighWeight(
                ngf=cfg.GAN.GF_DIM,
                weightmap=cfg.EVAL.WEIGHTMAP,
                low=cfg.EVAL.INPUT_NETGH,
                fused_upsample=fused_upsample,
            )
        else:
            from tgsr_tpu.models.models16 import (
                GSRNetLow16,
                NetGHighWeight16,
            )

            sizes = tuple(cfg.pyramid_sizes())
            self.netg = GSRNetLow16(ngf=cfg.GAN.GF_DIM,
                                    c_dim=cfg.GAN.CONDITION_DIM,
                                    r_num=cfg.GAN.R_NUM)
            self.netgh = NetGHighWeight16(
                ngf=cfg.GAN.GF_DIM, weightmap=cfg.EVAL.WEIGHTMAP,
                low=cfg.EVAL.INPUT_NETGH, sizes=sizes)
        self.variables = {
            "text": text_vars,
            "netg": netg_vars,
            "netgh": netgh_vars,
        }

        self._forward = self._build_forward()
        self._forward_scan = None  # built lazily (compile cost)
        self._forward_spatial = None  # built lazily by sr_spatial
        self._spatial_mesh = None

    # -- construction helpers ------------------------------------------------

    @classmethod
    def from_reference_checkpoints(
        cls, cfg: Config, vocab_size: int,
        netg_path: str, netgh_path: Optional[str] = None,
        text_encoder_path: Optional[str] = None,
        text_seed: int = 100, **kw,
    ) -> "SRPipeline":
        """Mirrors the reference loading protocol: netGH path derived from
        netG by name substitution, converter family by BRANCH_NUM
        (load_generator_pair = trainer_objective.py:74-93; no upstream
        x16 checkpoint exists today, but the path is live for
        user-trained ones from cli.train_gan)."""
        from tgsr_tpu.checkpoints.convert_torch import (
            convert_text_encoder, load_generator_pair, load_torch_state_dict,
        )

        netg_vars, netgh_vars = load_generator_pair(cfg, netg_path,
                                                    netgh_path)
        enc = TextEncoder(vocab_size=vocab_size, nhidden=cfg.TEXT.EMBEDDING_DIM,
                          rnn_type=cfg.RNN_TYPE)
        if text_encoder_path:
            if text_encoder_path.endswith(".pth"):
                text_vars = convert_text_encoder(
                    load_torch_state_dict(text_encoder_path), cfg.RNN_TYPE)
            else:
                from tgsr_tpu.checkpoints.io import load_variables

                text_vars = load_variables(text_encoder_path)
        else:
            # the reference snapshot ships no NET_E weights; fall back to a
            # seeded init (documented gap -- train with engine.damsm_trainer)
            text_vars = enc.init(
                jax.random.PRNGKey(text_seed),
                jnp.zeros((1, cfg.TEXT.WORDS_NUM), jnp.int32),
                jnp.ones((1,), jnp.int32),
            )
        return cls(cfg, vocab_size, text_vars, netg_vars, netgh_vars, **kw)

    # -- deployment artifact ---------------------------------------------

    def save_artifact(self, path: str, vocab=None,
                      return_attn: Optional[bool] = None) -> str:
        """One-directory deployment bundle, so serving needs neither the
        reference .pth files nor a YAML: config.json (full schema dump),
        variables.msgpack (text+netg+netgh trees), quant_scales.json (if
        the pipeline is int8), vocab.json (optional `data.tokenizer.Vocab`
        for caption encoding), meta.json (vocab_size, compute dtype).
        Load with `SRPipeline.load_artifact(path)`; `cli.serve
        --artifact` consumes it directly."""
        import json
        import os

        from tgsr_tpu.checkpoints.io import save_variables
        from tgsr_tpu.config import config_to_dict

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config_to_dict(self.cfg), f, indent=1, sort_keys=True)
        save_variables(os.path.join(path, "variables.msgpack"),
                       self.variables)
        if self.quant_scales:
            from tgsr_tpu.engine.quant import (SCALES_META_KEY,
                                               weights_fingerprint)

            # stamp provenance at save time: the bundle's scales are bound
            # to the bundle's own weights by construction
            meta = dict(self.quant_meta)
            meta["weights_fingerprint"] = weights_fingerprint(
                self.variables["netg"], self.variables["netgh"])
            with open(os.path.join(path, "quant_scales.json"), "w") as f:
                json.dump({**self.quant_scales, SCALES_META_KEY: meta},
                          f, indent=1, sort_keys=True)
        if vocab is not None:
            with open(os.path.join(path, "vocab.json"), "w") as f:
                json.dump({"ixtoword": vocab.ixtoword}, f)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({
                "vocab_size": self.text_encoder.vocab_size,
                "compute_dtype": jnp.dtype(self.compute_dtype).name,
                # a serving bundle should usually NOT carry return_attn:
                # attention maps are wasted compute on the /sr hot path
                "return_attn": self.return_attn if return_attn is None
                else return_attn,
            }, f)
        return path

    @classmethod
    def load_artifact(cls, path: str, mesh: Optional[Mesh] = None,
                      compute_dtype=None, use_quant: Optional[bool] = None,
                      **kw):
        """Rebuild a pipeline (and its vocab, if bundled) from
        `save_artifact`'s directory. Returns (pipeline, vocab-or-None).
        `compute_dtype`/kw override the saved settings. `use_quant`:
        None = as bundled; True = require bundled scales (ValueError if
        absent); False = ignore bundled scales (full-precision path)."""
        import json
        import os

        from tgsr_tpu.checkpoints.io import load_variables
        from tgsr_tpu.config import config_from_dict

        with open(os.path.join(path, "config.json")) as f:
            cfg = config_from_dict(json.load(f))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        variables = load_variables(os.path.join(path, "variables.msgpack"))
        scales = None
        scales_path = os.path.join(path, "quant_scales.json")
        if os.path.exists(scales_path):
            with open(scales_path) as f:
                scales = json.load(f)
        if use_quant and scales is None:
            raise ValueError(f"{path} has no quant_scales.json: re-save "
                             "from an int8 pipeline or calibrate_quant()")
        if use_quant is False:
            scales = None
        vocab = None
        vocab_path = os.path.join(path, "vocab.json")
        if os.path.exists(vocab_path):
            from tgsr_tpu.data.tokenizer import Vocab

            with open(vocab_path) as f:
                ixtoword = {int(k): v
                            for k, v in json.load(f)["ixtoword"].items()}
            vocab = Vocab(ixtoword, {w: i for i, w in ixtoword.items()})
        kw.setdefault("return_attn", meta.get("return_attn", False))
        pipe = cls(
            cfg, meta["vocab_size"], variables["text"], variables["netg"],
            variables["netgh"], mesh=mesh,
            compute_dtype=(compute_dtype
                           or jnp.dtype(meta["compute_dtype"])),
            quant_scales=scales, **kw)
        return pipe, vocab

    # -- forward -------------------------------------------------------------

    def _quant_ctx(self, which: str):
        """Interceptor context for the int8 serving mode (no-op without
        calibrated scales for `which`)."""
        import contextlib

        scales = self.quant_scales.get(which)
        if not scales:
            return contextlib.nullcontext()
        from flax import linen as nn

        from tgsr_tpu.engine.quant import (FUSED_UP_SITES,
                                           SPLIT_RES_GLU_SITES,
                                           effective_split_glu,
                                           quant_interceptor)

        return nn.intercept_methods(quant_interceptor(
            scales, split_glu=effective_split_glu(scales),
            split_res=SPLIT_RES_GLU_SITES, fused_up=FUSED_UP_SITES))

    def _lr_blur(self, lr_c):
        """Blurred LR for the HF branch (= prepare_datablur's LRimb,
        datasets.py:71-109: PIL GaussianBlur radius 2). Identity pass-through
        when INPUT_NETGH == 'lr' (the argument is unused there)."""
        if not self._needs_lr_blur:
            return lr_c
        from tgsr_tpu.ops.image import gaussian_blur

        return gaussian_blur(lr_c.astype(jnp.float32), 2.0).astype(lr_c.dtype)

    def calibrate_quant(self, lr, captions, cap_lens,
                        margin: float = 1.1) -> Dict[str, Dict[str, float]]:
        """Calibrate int8 activation scales on representative inputs by
        running the full-precision forward once (one compiled program) and
        recording every conv input's absmax (engine/quant.py). The result
        feeds SRPipeline(quant_scales=...); `margin` head-rooms unseen data.
        """
        from tgsr_tpu.engine.quant import calibrate

        cdt = self.compute_dtype
        v = self.variables

        def run_g(lr_c, words_c, sent_c, mask):
            return self.netg.apply(
                _cast_floats(v["netg"], cdt), lr_c, sent_c, words_c, mask)

        def run_gh(lr_c, fake_imgs):
            return self.netgh.apply(
                _cast_floats(v["netgh"], cdt), lr_c, fake_imgs,
                self._lr_blur(lr_c))

        words, sent = jax.jit(self.text_encoder.apply)(
            v["text"], jnp.asarray(captions), jnp.asarray(cap_lens))
        lr_c = jnp.asarray(lr).astype(cdt)
        mask = jnp.asarray(captions) == 0
        netg_scales = calibrate(
            run_g, lr_c, words.astype(cdt), sent.astype(cdt), mask,
            margin=margin)
        fake_imgs = jax.jit(run_g)(lr_c, words.astype(cdt),
                                   sent.astype(cdt), mask)[0]
        netgh_scales = calibrate(run_gh, lr_c, fake_imgs, margin=margin)
        return {"netg": netg_scales, "netgh": netgh_scales}

    def _forward_fn(self):
        """The un-jitted full forward closure; jitted by `_build_forward`
        (batch path, optionally DP-sharded) and `sr_spatial` (row-sharded)."""
        cdt = self.compute_dtype
        return_attn = self.return_attn

        def forward(variables, lr, captions, cap_lens):
            # lr: [B, h, w, 3] float32 in [-1,1]; captions [B, T] int32
            words, sent = self.text_encoder.apply(
                variables["text"], captions, cap_lens
            )
            mask = captions == 0
            lr_c = lr.astype(cdt)
            words_c = words.astype(cdt)
            sent_c = sent.astype(cdt)
            with self._quant_ctx("netg"):
                fake_imgs, att_maps, mu, logvar = self.netg.apply(
                    _cast_floats(variables["netg"], cdt), lr_c, sent_c,
                    words_c, mask
                )
            with self._quant_ctx("netgh"):
                fine, _, _ = self.netgh.apply(
                    _cast_floats(variables["netgh"], cdt), lr_c, fake_imgs,
                    self._lr_blur(lr_c)
                )
            sr = fine[-1].astype(jnp.float32)
            out = {"sr": sr, "pyramid": [f.astype(jnp.float32) for f in fine]}
            if return_attn:
                out["attn"] = [a.astype(jnp.float32) for a in att_maps]
            return out

        return forward

    def _build_forward(self):
        forward = self._forward_fn()
        if self.mesh is not None:
            from tgsr_tpu.parallel.mesh import batch_spec

            # batch axes: ('dcn','data') on hybrid meshes, 'data' otherwise
            data = NamedSharding(self.mesh, batch_spec(self.mesh, 1))
            data4 = NamedSharding(self.mesh, batch_spec(self.mesh, 4))
            data2 = NamedSharding(self.mesh, batch_spec(self.mesh, 2))
            return jax.jit(
                forward,
                in_shardings=(None, data4, data2, data),
                out_shardings=None,
            )
        return jax.jit(forward)

    def __call__(self, lr: jax.Array, captions: jax.Array,
                 cap_lens: jax.Array) -> Dict[str, Any]:
        return self._forward(self.variables, jnp.asarray(lr),
                             jnp.asarray(captions), jnp.asarray(cap_lens))

    def sr_spatial(self, lr: jax.Array, captions: jax.Array,
                   cap_lens: jax.Array,
                   mesh: Optional[Mesh] = None) -> Dict[str, Any]:
        """Spatially-partitioned forward: shard the image HEIGHT axis over
        the mesh 'data' axis (SP).

        DP (`shard_batch` + `__call__`) scales THROUGHPUT; this scales the
        LATENCY of one (or a few) large images across chips: with the input
        rows split over N devices, XLA's SPMD partitioner runs every conv
        on its row shard and inserts the halo exchanges the 3x3 receptive
        fields need over ICI; globally-coupled ops (pixel-axis attention,
        the text path, CA_NET) gather/replicate as sharding propagation
        demands. No manual collectives — the annotate-and-let-XLA-partition
        recipe. The reference has no multi-GPU analogue at all
        (SURVEY.md 2.11); use this for big `sr_arbitrary`-class geometries
        where one image's rows are worth splitting.

        Returns the same dict as `__call__`; equals the unsharded forward
        (tests/test_spatial_inference.py, incl. the int8 path).
        """
        mesh = mesh if mesh is not None else self.mesh
        if mesh is None:
            raise ValueError(
                "sr_spatial needs a mesh: pass mesh= or construct the "
                "pipeline with one")
        if self._forward_spatial is None or self._spatial_mesh is not mesh:
            rows = NamedSharding(mesh, P(None, "data", None, None))
            repl = NamedSharding(mesh, P())
            self._forward_spatial = jax.jit(
                self._forward_fn(), in_shardings=(None, rows, repl, repl))
            self._spatial_mesh = mesh
        return self._forward_spatial(self.variables, jnp.asarray(lr),
                                     jnp.asarray(captions),
                                     jnp.asarray(cap_lens))

    def forward_scan(self, lr: jax.Array, captions: jax.Array,
                     cap_lens: jax.Array) -> jax.Array:
        """High-throughput path: lr [M, B, h, w, 3], captions [M, B, T],
        cap_lens [M, B] -> SR uint8 [M, B, H, W, 3].

        Scans M microbatches inside ONE compiled dispatch, amortizing the
        ~150 ms per-dispatch overhead of this TPU stack across M batches.
        Output is uint8 on-device to quarter the HBM->host transfer.
        """
        if self._forward_scan is None:
            cdt = self.compute_dtype

            def one(variables, lr_b, cap_b, len_b):
                if lr_b.dtype == jnp.uint8:
                    # uint8 ingress: 4x less host->device transfer; the
                    # normalize fuses on-device
                    lr_b = lr_b.astype(jnp.float32) / 127.5 - 1.0
                words, sent = self.text_encoder.apply(
                    variables["text"], cap_b, len_b)
                mask = cap_b == 0
                with self._quant_ctx("netg"):
                    fake, _, _, _ = self.netg.apply(
                        _cast_floats(variables["netg"], cdt),
                        lr_b.astype(cdt), sent.astype(cdt),
                        words.astype(cdt), mask)
                with self._quant_ctx("netgh"):
                    fine, _, _ = self.netgh.apply(
                        _cast_floats(variables["netgh"], cdt),
                        lr_b.astype(cdt), fake,
                        self._lr_blur(lr_b.astype(cdt)))
                sr = fine[-1].astype(jnp.float32)
                return jnp.round(
                    jnp.clip((sr + 1.0) * 127.5, 0, 255)).astype(jnp.uint8)

            def scan_fn(variables, lr_m, cap_m, len_m):
                def body(c, x):
                    return c, one(variables, *x)

                _, srs = jax.lax.scan(body, 0, (lr_m, cap_m, len_m))
                return srs

            self._forward_scan = jax.jit(scan_fn)
        return self._forward_scan(self.variables, jnp.asarray(lr),
                                  jnp.asarray(captions),
                                  jnp.asarray(cap_lens))

    # Largest per-scan-step batch that fits v5e HBM comfortably: the 256px
    # stages keep ~25 MB of bf16 activations per image live; 768 is the
    # measured throughput sweet spot (docs/PERF.md) with ~6 GB headroom.
    DEFAULT_MICROBATCH = 768

    def plan_microbatch(self, budget_bytes: Optional[int] = None,
                        quantum: int = 64, lo: int = 64,
                        hi: int = 4096) -> int:
        """Pick the largest scan-step microbatch that FITS this device, by
        compile-time memory analysis (utils.memory) — no execution, no
        OOM crash-retry. Each bisection probe is one AOT compile
        (~30 s on the remote-compile stack), so call once per
        (device, model) and cache; falls back to DEFAULT_MICROBATCH when
        the backend reports neither memory capacity nor a usable plan.

        New-device porting tool: DEFAULT_MICROBATCH encodes the v5e
        measurement; `pipe.plan_microbatch()` re-derives the ceiling on
        anything else."""
        from tgsr_tpu.utils.memory import max_feasible_batch

        T = self.cfg.TEXT.WORDS_NUM
        h = w = self.cfg.TREE.BASE_SIZE

        def make(b):
            def f(variables, lr_b, cap_b, len_b):
                return jnp.sum(self.bench_forward(
                    variables, lr_b, cap_b, len_b).astype(jnp.float32))

            return f, (self.variables,
                       jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32),
                       jax.ShapeDtypeStruct((b, T), jnp.int32),
                       jax.ShapeDtypeStruct((b,), jnp.int32))

        try:
            best, _ = max_feasible_batch(make, budget_bytes=budget_bytes,
                                         lo=lo, hi=hi, quantum=quantum)
        except ValueError:  # no budget known for this backend
            return self.DEFAULT_MICROBATCH
        return best or self.DEFAULT_MICROBATCH

    def sr_batched(self, lr, captions, cap_lens,
                   microbatch: Optional[int] = None) -> np.ndarray:
        """Memory-planned large-batch SR: ANY number of images N.

        A single dispatch at N ~ 1024 cannot fit on one chip -- the final
        stage's GLU pre-activation alone is [N, 256, 256, 128] bf16 = 17 GB
        at N=1024 -- so this plans N into ceil(N / microbatch) scan steps
        inside ONE compiled program (forward_scan), padding the tail with
        replicas and stripping it after. Peak memory is set by `microbatch`,
        not N; per-dispatch overhead is amortized across the whole scan.

        Returns uint8 [N, H, W, 3].
        """
        lr = np.asarray(lr)
        captions = np.asarray(captions)
        cap_lens = np.asarray(cap_lens)
        n = lr.shape[0]
        if n == 0:
            h, w = lr.shape[1] * self.cfg.scale, lr.shape[2] * self.cfg.scale
            return np.empty((0, h, w, 3), np.uint8)
        b = min(microbatch or self.DEFAULT_MICROBATCH, n)
        m = -(-n // b)
        # balance the microbatch to N (N=769 with b=768 would otherwise pad
        # to 1536 -- ~2x wasted compute); quantize b up to a multiple of 64
        # so the set of compiled (m, b) shapes stays small across varied N
        balanced = -(-n // m)
        b = min(b, -(-balanced // 64) * 64)
        pad = m * b - n
        if pad:
            sel = np.arange(m * b) % n  # replicate from the start
            lr, captions, cap_lens = lr[sel], captions[sel], cap_lens[sel]
        srs = self.forward_scan(
            lr.reshape(m, b, *lr.shape[1:]),
            captions.reshape(m, b, captions.shape[-1]),
            cap_lens.reshape(m, b),
        )
        out = np.asarray(srs).reshape(m * b, *srs.shape[2:])
        return out[:n]

    def sr_arbitrary(self, lr, captions, cap_lens,
                     bucket: Optional[int] = None) -> np.ndarray:
        """Arbitrary-geometry SR (= the example-test eval path,
        datasets.py:200-278 / the coco scale-4 variant at datasets.py:1548):
        `lr` is [1, h, w, 3] float32 in [-1, 1] for ANY (h, w).

        XLA compiles one program per input shape, so fully dynamic eval
        shapes need a policy (the reference's torch path is shape-oblivious):

          * bucket=None  -- run at native shape: exact, one compile per
            DISTINCT (h, w) seen (fine for small eval sets);
          * bucket=N     -- edge-pad (h, w) up to multiples of N and crop
            the SR back to (h*scale, w*scale): the number of compiled
            programs is bounded by the bucket grid, at the cost of conv
            receptive-field bleed from the padded border (word-pixel
            attention is per-pixel over words, so padding cannot leak
            beyond the convolutional halo).

        Padding happens host-side (numpy): eager device ops on the axon TPU
        platform pay a remote-compile round trip each (docs/PERF.md).
        Compile count is observable via `self._forward._cache_size()`.
        """
        lr = np.asarray(lr, np.float32)
        assert lr.ndim == 4 and lr.shape[0] == 1, lr.shape
        h, w = lr.shape[1:3]
        if bucket:
            from tgsr_tpu.ops.image import bucket_shape

            bh, bw = bucket_shape(h, w, 1, bucket)
            lr_in = np.pad(lr, ((0, 0), (0, bh - h), (0, bw - w), (0, 0)),
                           mode="edge")
        else:
            lr_in = lr
        out = self(lr_in, captions, cap_lens)
        s = self.cfg.scale
        sr = np.asarray(out["sr"])[:, : h * s, : w * s]
        return np.round(np.clip((sr + 1.0) * 127.5, 0, 255)).astype(np.uint8)

    def bench_forward(self, variables, lr_b, cap_b, len_b):
        """The traceable (quant-aware) forward at the pipeline's own
        compute dtype, returning the final SR tensor -- the single shared
        building block for every timing probe (bench.py checksum scans,
        the latency probe's chained-K structure, the profiling tool) AND
        plan_microbatch's memory model. NOT jitted by itself: compose
        inside one jit. Must track self.compute_dtype: a hardcoded bf16
        here would make plan_microbatch bisect ~half the activation bytes
        of an f32 pipeline's real forward (OOM at runtime)."""
        cdt = self.compute_dtype
        words, sent = self.text_encoder.apply(variables["text"], cap_b,
                                              len_b)
        mask = cap_b == 0
        with self._quant_ctx("netg"):
            fake, _, _, _ = self.netg.apply(
                _cast_floats(variables["netg"], cdt), lr_b.astype(cdt),
                sent.astype(cdt), words.astype(cdt), mask)
        with self._quant_ctx("netgh"):
            fine, _, _ = self.netgh.apply(
                _cast_floats(variables["netgh"], cdt), lr_b.astype(cdt),
                fake, self._lr_blur(lr_b.astype(cdt)))
        return fine[-1]

    def checksum_fns(self):
        """Honest-timing probes: (scan_fn, one_fn), both jitted.

        scan_fn(variables, lr [M,B,h,w,3], captions [M,B,T], lens [M,B],
        salt) scans M microbatches and returns ONE f32 scalar checksum of
        the SR outputs; one_fn is the single-batch variant. Fetching the
        scalar forces full execution through a 4-byte transfer (this TPU
        stack's block_until_ready does not reliably synchronize, docs/
        PERF.md); `salt` perturbs the input per call to defeat caching.
        Uses the pipeline's own bf16/int8 configuration -- bench.py and the
        example probes share this instead of hand-rolling the forward.
        """
        sr_one = self.bench_forward

        @jax.jit
        def scan_fn(variables, lr_m, cap_m, len_m, salt):
            def body(c, x):
                sr = sr_one(variables, x[0] + salt * 1e-6, x[1], x[2])
                return c + jnp.sum(sr.astype(jnp.float32)), None

            s, _ = jax.lax.scan(body, 0.0, (lr_m, cap_m, len_m))
            return s

        @jax.jit
        def one_fn(variables, lr_b, cap_b, len_b, salt):
            return jnp.sum(sr_one(variables, lr_b + salt * 1e-6, cap_b,
                                  len_b).astype(jnp.float32))

        return scan_fn, one_fn

    def sr_uint8(self, lr, captions, cap_lens) -> np.ndarray:
        """Final SR as uint8 (save-time clip, trainer_objective.py:153-155).

        Host-side numpy: eager jnp ops on the axon TPU platform pay a
        remote-compile round trip per op, so postprocessing stays off-device.
        """
        out = self(lr, captions, cap_lens)
        sr = np.asarray(out["sr"])
        return np.round(np.clip((sr + 1.0) * 127.5, 0, 255)).astype(np.uint8)


def _cast_floats(tree, dtype):
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )
