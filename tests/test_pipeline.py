"""PP (pipeline parallelism): microbatch-pipelined chain == sequential.

GPipe-style schedule over a 'stage' mesh axis (parallel/pipeline.py);
activations hop stages via lax.ppermute. The reference is single-GPU
(SURVEY.md 2.11) — no upstream counterpart; the oracle is the plain
sequential application of the same blocks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgsr_tpu.ops.blocks import ResBlock
from tgsr_tpu.parallel.pipeline import (
    extract_chain,
    make_stage_mesh,
    pipeline_apply,
    stack_block_variables,
)

NGF = 16


def _chain(n_blocks, key, B=4, hw=8):
    x = jax.random.normal(key, (B, hw, hw, NGF))
    block = ResBlock(NGF)
    keys = jax.random.split(key, n_blocks)
    vars_list = [block.init(k, x) for k in keys]
    seq = x
    for v in vars_list:
        seq = block.apply(v, seq, False)
    return x, vars_list, np.asarray(seq)


def _block_fn(v, h):
    return ResBlock(NGF).apply(v, h, False)


@pytest.mark.parametrize("n_stages,n_micro", [(6, 4), (2, 4), (3, 2)])
def test_pipeline_equals_sequential(n_stages, n_micro):
    """6 real ResBlocks split into S stages of 6/S blocks each: the
    pipelined result must equal the sequential chain."""
    x, vars_list, seq = _chain(6, jax.random.PRNGKey(0))
    stacked = stack_block_variables(vars_list)
    mesh = make_stage_mesh(n_stages)
    out = np.asarray(
        pipeline_apply(_block_fn, stacked, x, mesh, n_micro=n_micro))
    np.testing.assert_allclose(seq, out, rtol=1e-5, atol=1e-5)


def test_pipeline_single_stage_degenerate():
    """S=1 (one device) reduces to plain microbatched execution."""
    x, vars_list, seq = _chain(2, jax.random.PRNGKey(1))
    stacked = stack_block_variables(vars_list)
    mesh = make_stage_mesh(1)
    out = np.asarray(pipeline_apply(_block_fn, stacked, x, mesh, n_micro=2))
    np.testing.assert_allclose(seq, out, rtol=1e-5, atol=1e-5)


def test_pipeline_refiner_chain():
    """The real component: NetGHighWeight's residual_{0..5} chain pulled
    from a full-model init via extract_chain, pipelined over 6 stages."""
    from tgsr_tpu.models.generator_hf import NetGHighWeight

    ngf = NGF
    key = jax.random.PRNGKey(2)
    lr = jax.random.normal(key, (4, 16, 16, 3)) * 0.3
    srb = [jax.random.normal(key, (4, s, s, 3)) * 0.3 for s in (32, 64, 128)]
    net = NetGHighWeight(ngf=ngf, low="lr", sizes=(32, 64, 128))
    variables = net.init(key, lr, srb)

    names = [f"residual_{i}" for i in range(net.n_res)]
    stacked = extract_chain(variables, names)

    # oracle: the same blocks applied sequentially with the real weights
    h = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, ngf))
    seq = h
    block = ResBlock(ngf)
    for n in names:
        v = {c: variables[c][n] for c in variables if n in variables[c]}
        seq = block.apply(v, seq, False)

    mesh = make_stage_mesh(6)
    out = pipeline_apply(lambda v, y: block.apply(v, y, False),
                         stacked, h, mesh, n_micro=4)
    np.testing.assert_allclose(
        np.asarray(seq), np.asarray(out), rtol=1e-5, atol=1e-5)


def test_pipeline_validation():
    x, vars_list, _ = _chain(6, jax.random.PRNGKey(4))
    stacked = stack_block_variables(vars_list)
    with pytest.raises(ValueError, match="stages"):
        pipeline_apply(_block_fn, stacked, x, make_stage_mesh(4), n_micro=2)
    with pytest.raises(ValueError, match="n_micro"):
        pipeline_apply(_block_fn, stacked, x, make_stage_mesh(2), n_micro=3)
    with pytest.raises(ValueError, match="devices"):
        make_stage_mesh(10_000)
