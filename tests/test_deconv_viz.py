"""Deconvnet visualization (vis_layer) — oracle tests.

The reference's vis_layer/vis_layeror (miscc/utils.py:488-592) invert VGG16
features through a deconvnet (tied transposed convs + max-unpooling at the
recorded switches + ReLU on the backward signal).  Our implementation
expresses that inverse as a VJP with a custom ReLU rule; these tests pin
each identity against explicit torch ops, then the whole pipeline against a
torch autograd oracle built with the same deconvnet ReLU.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tgsr_tpu.utils.deconv_viz import (  # noqa: E402
    _select_seed, deconv_relu, forward_to_tap, vis_layer)

RNG = np.random.RandomState(0)


def test_deconv_relu_backward_rectifies_grad_not_input():
    x = jnp.asarray(RNG.randn(5, 7).astype(np.float32))
    g = RNG.randn(5, 7).astype(np.float32)
    y, vjp = jax.vjp(deconv_relu, x)
    np.testing.assert_allclose(np.asarray(y), np.maximum(np.asarray(x), 0))
    (gx,) = vjp(jnp.asarray(g))
    # Zeiler-Fergus rule: relu(g), independent of the forward sign pattern.
    np.testing.assert_allclose(np.asarray(gx), np.maximum(g, 0))


def test_conv_vjp_is_tied_transposed_conv():
    """Input-gradient of a SAME 3x3 conv == torch conv_transpose2d with the
    tied kernel and no bias — the deconvnet's 'deconv' layer."""
    cin, cout, h, w = 3, 5, 8, 8
    k = RNG.randn(3, 3, cin, cout).astype(np.float32)  # HWIO
    x = jnp.asarray(RNG.randn(1, h, w, cin).astype(np.float32))
    g = RNG.randn(1, h, w, cout).astype(np.float32)

    def f(x):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(k), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    _, vjp = jax.vjp(f, x)
    (gx,) = vjp(jnp.asarray(g))

    kt = torch.from_numpy(k.transpose(3, 2, 0, 1))  # OIHW
    gt = torch.from_numpy(g.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.conv_transpose2d(gt, kt, padding=1)
    np.testing.assert_allclose(
        np.asarray(gx), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-5,
        atol=1e-5)


def test_pool_vjp_is_max_unpool_at_switches():
    x_np = RNG.randn(1, 8, 8, 4).astype(np.float32)
    g_np = RNG.randn(1, 4, 4, 4).astype(np.float32)

    def pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    _, vjp = jax.vjp(pool, jnp.asarray(x_np))
    (gx,) = vjp(jnp.asarray(g_np))

    xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
    _, idx = torch.nn.functional.max_pool2d(xt, 2, 2, return_indices=True)
    ref = torch.nn.functional.max_unpool2d(
        torch.from_numpy(g_np.transpose(0, 3, 1, 2)), idx, 2, 2)
    np.testing.assert_allclose(
        np.asarray(gx), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-5,
        atol=1e-5)


def test_select_seed_reference_logic():
    fmap = np.maximum(RNG.randn(6, 6, 8).astype(np.float32), 0)
    # mode='max' (vis_layeror): only the argmax pixel of the argmax channel.
    seed, max_act = _select_seed(fmap, "max")
    mark = int(np.argmax(fmap.reshape(-1, 8).max(0)))
    assert max_act == fmap[:, :, mark].max()
    assert np.count_nonzero(seed) == 1
    others = np.delete(seed, mark, axis=2)
    assert not others.any()
    # mode='four' (vis_layer default): >= 10th percentile, midpoint interp.
    seed4, _ = _select_seed(fmap, "four")
    q = np.percentile(fmap[:, :, mark], 10, method="midpoint")
    expect = np.where(fmap[:, :, mark] >= q, fmap[:, :, mark], 0.0)
    np.testing.assert_allclose(seed4[:, :, mark], expect)
    # mode='all': untouched tensor.
    seed_all, _ = _select_seed(fmap, "all")
    np.testing.assert_allclose(seed_all, fmap)


class _DeconvReLU(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x):
        return torch.relu(x)

    @staticmethod
    def backward(ctx, g):
        return torch.relu(g)


def _torch_oracle(params, x_np, layer, seed_np):
    """Torch mirror of forward_to_tap + VJP: same normalization, convs with
    converted weights, deconvnet ReLU, pool — autograd.grad with the seed."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = torch.from_numpy(x_np.transpose(0, 3, 1, 2)).requires_grad_(True)
    h = ((x + 1.0) / 2.0 - mean) / std
    cfg = [(64, 2), (128, 2)]
    li = 0
    tap = None
    for bi, (_width, n_convs) in enumerate(cfg):
        for _ in range(n_convs):
            p = params[f"conv{li}"]
            w = torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
            b = torch.from_numpy(np.asarray(p["bias"]))
            h = torch.nn.functional.conv2d(h, w, b, padding=1)
            h = _DeconvReLU.apply(h)
            if li == layer:
                tap = h
                break
            li += 1
        if tap is not None:
            break
        h = torch.nn.functional.max_pool2d(h, 2, 2)
    seed = torch.from_numpy(seed_np.transpose(0, 3, 1, 2))
    (gx,) = torch.autograd.grad(tap, x, grad_outputs=seed)
    return gx.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("layer", [1, 3])
def test_vis_layer_matches_torch_deconvnet_oracle(layer):
    """Full pipeline vs a torch deconvnet (crosses the pool for layer=3)."""
    widths = [64, 64, 128, 128]
    params, cin = {}, 3
    for li in range(layer + 1):
        cout = widths[li]
        params[f"conv{li}"] = {
            "kernel": (RNG.randn(3, 3, cin, cout) * 0.1).astype(np.float32),
            "bias": (RNG.randn(cout) * 0.01).astype(np.float32),
        }
        cin = cout
    x_np = RNG.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)

    img, max_act = vis_layer(params, jnp.asarray(x_np), layer, mode="four")
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8

    feats = np.asarray(forward_to_tap(params, jnp.asarray(x_np), layer))
    seed, ref_max = _select_seed(feats[0], "four")
    assert max_act == int(ref_max)
    recon = _torch_oracle(params, x_np, layer, seed[None])[0]
    lo, hi = recon.min(), recon.max()
    ref_img = ((recon - lo) / max(hi - lo, 1e-12) * 255.0).astype(np.uint8)
    assert np.abs(img.astype(int) - ref_img.astype(int)).max() <= 1
