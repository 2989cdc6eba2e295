"""x16 variants: shapes + the weight-tying quirks (models16.py:13-14,48,53)."""

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.models.models16 import GSRNetLow16, NetGHigh16, NetGHighWeight16


def _text(B=1, T=6, E=256):
    k = jax.random.PRNGKey(0)
    words = jax.random.normal(k, (B, T, E))
    sent = jax.random.normal(jax.random.fold_in(k, 1), (B, E))
    mask = jnp.zeros((B, T), bool)
    return words, sent, mask


def test_low16_shapes_and_tying():
    B, base = 1, 16
    lr = jnp.zeros((B, base, base, 3))
    words, sent, mask = _text(B)
    m = GSRNetLow16(ngf=32)
    v = m.init(jax.random.PRNGKey(0), lr, sent, words, mask)
    fake, atts, mu, logvar = m.apply(v, lr, sent, words, mask)
    assert [f.shape[1] for f in fake] == [32, 64, 128, 256]
    assert [a.shape[-1] for a in atts] == [16, 32, 64, 128]
    # tying: exactly ONE next-stage (h_net2) and ONE image head (img_net1)
    top = set(v["params"].keys())
    assert "h_net2" in top and "h_net3" not in top and "h_net4" not in top
    assert "img_net1" in top and "img_net2" not in top
    # x16 heads HAVE tanh (GET_IMAGE_G, models16.py:14)
    assert float(jnp.abs(fake[-1]).max()) <= 1.0


def test_high16_tying_and_shapes():
    B, base = 1, 16
    lr = jnp.zeros((B, base, base, 3))
    srb = [jnp.zeros((B, s, s, 3)) for s in (32, 64, 128, 256)]
    m = NetGHigh16(ngf=32)
    v = m.init(jax.random.PRNGKey(0), lr, srb, lr)
    ims = m.apply(v, lr, srb, lr)
    assert [f.shape[1] for f in ims] == [32, 64, 128, 256]
    top = set(v["params"].keys())
    # one tied upscale + one tied residual seq
    assert "upscale2x" in top and "upscale4x" not in top
    assert "residual24" in top and "residual48" not in top


def test_highweight16_weightmap_and_bug_parity():
    B, base = 1, 16
    lr = jnp.zeros((B, base, base, 3))
    srb = [jnp.zeros((B, s, s, 3)) for s in (32, 64, 128, 256)]
    m = NetGHighWeight16(ngf=32, weightmap=True, low="lr")
    v = m.init(jax.random.PRNGKey(0), lr, srb, lr)
    ims, a4, one = m.apply(v, lr, srb, lr)
    assert [f.shape[1] for f in ims] == [32, 64, 128, 256]
    top = set(v["params"].keys())
    # faithful bug: residual816/upscale16x never execute -> no params
    assert "residual816" not in top and "upscale16x" not in top
    assert "residual48" in top and "upscale8x" in top

    # fixed variant uses the declared 16x blocks
    mf = NetGHighWeight16(ngf=32, weightmap=True, low="lr", fix_bugs=True)
    vf = mf.init(jax.random.PRNGKey(0), lr, srb, lr)
    topf = set(vf["params"].keys())
    assert "residual816" in topf and "upscale16x" in topf
