"""Ahead-of-time compiled serving artifacts (jax.export).

The reference deploys by shipping .pth files plus the full model source:
trainer_objective.py:62-99 re-instantiates every nn.Module at load time,
so a serving host needs torch, the repo, AND matching checkpoints. The
TPU-native equivalent serializes the ENTIRE traced forward — weights
baked in as StableHLO constants — so a serving host needs only jax:
no tgsr_tpu model code, no checkpoint files, no vocab pickles, and it
runs the exact traced computation that was validated at export time
(including the int8 interceptor graph when the pipeline is quantized).
Numerical contract: XLA recompiles the deserialized module and may fuse
float ops differently than the live jit, so outputs can differ at the
last ulp — for the uint8 postprocess that is off-by-1 pixels exactly at
round boundaries (<0.2% of pixels measured on the bf16+int8 graph,
tests/test_aot_export.py); the f32 graph reproduced bit-exact in the
same tests but only the ulp-level bound is guaranteed.

Two-file directory layout:
  forward.jaxexport   serialized jax.export artifact (StableHLO + vjp-less
                      calling convention; weights inline)
  meta.json           shapes/dtypes/platform contract + postprocessing flag

The batch dimension is SYMBOLIC by default (jax.export symbolic shapes),
so one artifact serves any batch size; pass batch_size= to pin it (some
backends' autotuners prefer static shapes).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tgsr_tpu.ops.image import denormalize_to_uint8

_FORWARD_FILE = "forward.jaxexport"
_META_FILE = "meta.json"


def export_serving(
    pipeline,
    path: str,
    batch_size: Optional[int] = None,
    lr_size: Optional[int] = None,
    uint8: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Export `pipeline`'s batched SR forward as a self-contained AOT
    artifact under `path/`.

    batch_size: None -> symbolic batch ("b"), any batch size at call time.
    lr_size:    LR spatial size; defaults to cfg.TREE.BASE_SIZE (the
                pyramid-root size the eval configs define, test1.py:183).
    uint8:      bake the save-time postprocess (round(clip((x+1)*127.5)),
                trainer_objective.py:153-155) into the graph and return
                uint8 — the serving-host format; False returns float32
                in [-1, 1].
    platforms:  lowering platforms (e.g. ["tpu", "cpu"]); default = the
                current backend. Cross-platform export needs no device of
                the target kind at export time.
    """
    from jax import export as jexport

    cfg = pipeline.cfg
    lr_size = lr_size or cfg.TREE.BASE_SIZE
    t = cfg.TEXT.WORDS_NUM
    fwd = pipeline._forward_fn()
    # msgpack-loaded bundles hold numpy leaves; tracing indexes the
    # embedding table by a tracer, which numpy rejects — device arrays
    # trace fine and become the module's baked constants either way
    variables = jax.tree.map(jnp.asarray, pipeline.variables)

    def fn(lr, captions, cap_lens):
        out = fwd(variables, lr, captions, cap_lens)
        sr = out["sr"]
        if uint8:
            return denormalize_to_uint8(sr)
        return sr

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    args = (
        jax.ShapeDtypeStruct((b, lr_size, lr_size, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, t), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jexport.export(jax.jit(fn), **kw)(*args)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _FORWARD_FILE), "wb") as f:
        f.write(exp.serialize())
    meta = {
        "lr_size": lr_size,
        "words_num": t,
        "batch": "symbolic" if batch_size is None else int(batch_size),
        "uint8": uint8,
        "platforms": list(exp.platforms),
        # the traced output size scales with the ACTUAL lr_size, not the
        # config's pyramid root (lr_size may override cfg.TREE.BASE_SIZE)
        "sr_size": int(lr_size *
                       (cfg.pyramid_sizes()[-1] // cfg.TREE.BASE_SIZE)),
        "n_words": int(pipeline.text_encoder.vocab_size),
        "quantized": bool(pipeline.quant_scales),
        "compute_dtype": jnp.dtype(pipeline.compute_dtype).name,
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_serving(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Load an `export_serving` artifact. Returns (call, meta); `call(lr,
    captions, cap_lens)` runs the baked-in weights on the current backend
    (which must be in meta["platforms"]). Needs no model code."""
    from jax import export as jexport

    with open(os.path.join(path, _FORWARD_FILE), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)

    # jit the wrapper: Exported.call is traceable, and without the jit
    # every serving dispatch would re-trace the deserialized module
    # eagerly (no executable cache — ruinous on remote-dispatch stacks);
    # under jit each concrete batch shape compiles once and caches.
    @jax.jit
    def _compiled(lr, captions, cap_lens):
        return exp.call(lr, captions, cap_lens)

    def call(lr, captions, cap_lens):
        return _compiled(
            jnp.asarray(lr, jnp.float32),
            jnp.asarray(captions, jnp.int32),
            jnp.asarray(cap_lens, jnp.int32),
        )

    return call, meta


class AOTPipeline:
    """Duck-typed SRPipeline stand-in over an `export_serving` artifact:
    exposes exactly the surface the serving stack consumes
    (engine.serving.BatchingServer + cli.serve) — `cfg.TEXT.WORDS_NUM`,
    `cfg.TREE.BASE_SIZE`, `cfg.scale`, `sr_uint8` — with the computation
    coming from the baked StableHLO, no model code. Arbitrary-geometry
    (`sr_arbitrary`) is deliberately absent: shapes are fixed at export."""

    def __init__(self, path: str):
        from types import SimpleNamespace

        self._call, self.meta = load_serving(path)
        lr_size = self.meta["lr_size"]
        self.cfg = SimpleNamespace(
            TEXT=SimpleNamespace(WORDS_NUM=self.meta["words_num"]),
            TREE=SimpleNamespace(BASE_SIZE=lr_size),
            scale=self.meta["sr_size"] // lr_size,
        )
        self.quant_scales = {"aot": True} if self.meta["quantized"] else {}

    def sr_uint8(self, lr, captions, cap_lens) -> "np.ndarray":
        import numpy as np

        lr = np.asarray(lr)
        captions = np.asarray(captions)
        cap_lens = np.asarray(cap_lens)
        n, b = lr.shape[0], self.meta["batch"]
        if n == 0:
            # degenerate empty batch: row-0 padding below would IndexError
            s = self.meta["sr_size"]
            return np.empty((0, s, s, 3), np.uint8)  # both exits are uint8
        if isinstance(b, int) and n != b:
            # pinned-batch artifact: pad by repeating row 0 (real caption
            # semantics, unlike zeros) and strip — so the serving stack's
            # planned batch sizes keep working against a pinned export
            if n > b:
                raise ValueError(f"batch {n} exceeds the artifact's pinned "
                                 f"batch {b}; re-export with batch_size="
                                 f"None (symbolic) or a larger pin")
            idx = np.concatenate([np.arange(n), np.zeros(b - n, np.int64)])
            lr, captions, cap_lens = lr[idx], captions[idx], cap_lens[idx]
        out = np.asarray(self._call(lr, captions, cap_lens))[:n]
        if self.meta["uint8"]:
            return out
        # float artifact: apply the save-time postprocess on the host
        # (trainer_objective.py:153-155)
        return np.round(np.clip((out + 1.0) * 127.5, 0, 255)).astype(
            np.uint8)
