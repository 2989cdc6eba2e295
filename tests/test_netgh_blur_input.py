"""EVAL.INPUT_NETGH blur wiring (high-severity round-2 review finding).

The HF branch's 'lrblur' / 'lr-lrblur' modes take the BLURRED LR
(trainer_objective.py:113-114 LRimb via prepare_datablur); previously both
engines passed the raw LR, making 'lr-lrblur' an all-zero input (garbage
SR at eval; zero-variance-BN NaN in training)."""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tgsr_tpu.config import Config
from tgsr_tpu.engine.inference import SRPipeline
from tgsr_tpu.models.generator import GSRNetLow
from tgsr_tpu.models.generator_hf import NetGHighWeight
from tgsr_tpu.models.text_encoder import TextEncoder


def _build(input_netgh):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=16),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16),
        EVAL=dataclasses.replace(cfg.EVAL, INPUT_NETGH=input_netgh),
    )
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=41, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.ones((2, 18), jnp.int32)
    lens = jnp.full((2,), 5, jnp.int32)
    tv = enc.init(k, caps, lens)
    words, sent = enc.apply(tv, caps, lens)
    lr = jax.random.normal(k, (2, 16, 16, 3)) * 0.3
    netg = GSRNetLow(ngf=16, n_stages=3)
    gv = netg.init(k, lr, sent, words, caps == 0)
    fake, *_ = netg.apply(gv, lr, sent, words, caps == 0)
    netgh = NetGHighWeight(ngf=16, low=input_netgh, sizes=(32, 64, 128))
    ghv = netgh.init(k, lr, fake, lr)
    pipe = SRPipeline(cfg, 41, tv, gv, ghv)
    return pipe, np.asarray(lr), np.asarray(caps), np.asarray(lens)


def test_lr_blur_modes_receive_blurred_lr():
    pipe, lr, caps, lens = _build("lr-lrblur")
    assert pipe._needs_lr_blur
    blurred = np.asarray(pipe._lr_blur(jnp.asarray(lr)))
    # actually blurred, not the identity (the old bug): lr - blur != 0
    assert np.abs(lr - blurred).max() > 1e-3
    out = np.asarray(pipe(lr, caps, lens)["sr"])
    assert np.isfinite(out).all()

    pipe_b, _, _, _ = _build("lrblur")
    pipe_b.variables = pipe.variables  # same weights, different input mode
    out_b = np.asarray(pipe_b(lr, caps, lens)["sr"])
    assert np.isfinite(out_b).all()
    # the two modes feed the HF branch different inputs -> different SR
    assert np.abs(out - out_b).max() > 1e-5

    pipe_plain, _, _, _ = _build("lr")
    assert not pipe_plain._needs_lr_blur
    same = pipe_plain._lr_blur(jnp.asarray(lr))
    np.testing.assert_array_equal(np.asarray(same), lr)


@pytest.mark.slow
def test_trainer_blur_mode_finite():
    """gan_trainer with INPUT_NETGH='lr-lrblur': the HF branch input is the
    (nonzero) high-frequency residual -> train step stays finite (was NaN
    through zero-variance BN before the fix)."""
    from tgsr_tpu.engine.gan_trainer import GANTrainer

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        TREE=dataclasses.replace(cfg.TREE, BRANCH_NUM=4, BASE_SIZE=8),
        GAN=dataclasses.replace(cfg.GAN, GF_DIM=16, DF_DIM=16),
        TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=2),
        EVAL=dataclasses.replace(cfg.EVAL, INPUT_NETGH="lr-lrblur"),
    )
    rng = np.random.RandomState(0)
    k = jax.random.PRNGKey(0)
    enc = TextEncoder(vocab_size=41, nhidden=cfg.TEXT.EMBEDDING_DIM)
    caps = jnp.asarray(rng.randint(1, 41, (2, 18)), jnp.int32)
    lens = jnp.full((2,), 18, jnp.int32)
    tv = enc.init(k, caps, lens)
    tr = GANTrainer(cfg, 41, tv)
    assert tr.netgh.low == "lr-lrblur"
    state = tr.init_state(k, batch_size=2)
    batch = {
        "lr": jnp.asarray(rng.randn(2, 8, 8, 3) * 0.3, jnp.float32),
        "real_pyramid": [
            jnp.asarray(rng.randn(2, s, s, 3) * 0.3, jnp.float32)
            for s in cfg.pyramid_sizes()
        ],
        "captions": caps,
        "cap_lens": lens,
        "class_ids": jnp.arange(2, dtype=jnp.int32),
    }
    state, metrics, _ = tr.train_step(state, batch, jax.random.PRNGKey(1))
    for name, v in metrics.items():
        assert np.isfinite(float(v)), (name, float(v))


def test_blur_modes_oracle_vs_reference():
    """NetGHighWeight 'lrblur' and 'lr-lrblur' vs the unmodified reference
    NetG_highweight with the SAME blurred tensor and converted random-init
    weights (torch oracle for the mode plumbing + math)."""
    import pytest

    torch = pytest.importorskip("torch")
    from tests.reference_oracle import load_reference

    from tgsr_tpu.checkpoints.convert_torch import convert_netgh_weight

    ref = load_reference()
    for low in ("lrblur", "lr-lrblur"):
        torch.manual_seed(21)
        net = ref["model"].NetG_highweight(weightmap=False, low=low)
        net.eval()
        with torch.no_grad():
            for m in net.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.3)
                    m.running_var.uniform_(0.5, 2.0)
        g = torch.Generator().manual_seed(22)
        lr_t = torch.randn(1, 3, 32, 32, generator=g) * 0.5
        lrb_t = torch.randn(1, 3, 32, 32, generator=g) * 0.5
        srb_t = [torch.randn(1, 3, s, s, generator=g) * 0.5
                 for s in (64, 128, 256)]
        with torch.no_grad():
            fine_t, _, _ = net(lr_t, srb_t, lrb_t)

        variables = convert_netgh_weight(net.state_dict())
        m = NetGHighWeight(ngf=32, weightmap=False, low=low)
        to_nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
        fine_j, _, _ = m.apply(variables, to_nhwc(lr_t),
                               [to_nhwc(s) for s in srb_t], to_nhwc(lrb_t))
        for i, (t, j) in enumerate(zip(fine_t, fine_j)):
            np.testing.assert_allclose(
                t.numpy(), np.asarray(j).transpose(0, 3, 1, 2),
                rtol=1e-3, atol=1e-4, err_msg=f"{low} scale {i}")


def test_pipeline_blur_close_to_pil_gaussian():
    """SRPipeline._lr_blur vs the reference's PIL GaussianBlur(radius=2)
    LRimb (prepare_datablur) on the real test image. Pillow implements
    GaussianBlur as a triple BOX-blur approximation of the Gaussian, so a
    true separable Gaussian cannot match it exactly -- parity is
    tolerance-level (same standard as test_image_ops'
    test_gaussian_blur_close_to_pil): ~2/255 mean over the interior, with
    larger deviation confined to the border where the box passes handle
    edge extension differently."""
    import os

    import pytest

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    from PIL import Image, ImageFilter

    img = Image.open("/root/reference/data/face/000155.png").convert("RGB")
    lr_pil = img.resize((32, 32), Image.BICUBIC)
    lrb_pil = np.asarray(lr_pil.filter(ImageFilter.GaussianBlur(radius=2)),
                         np.float32) / 127.5 - 1.0

    pipe, _, _, _ = _build("lr-lrblur")
    lr = np.asarray(lr_pil, np.float32)[None] / 127.5 - 1.0
    ours = np.asarray(pipe._lr_blur(jnp.asarray(lr)))[0]
    d = np.abs(ours - lrb_pil)
    assert d.mean() < 2.5 / 127.5, d.mean()
    assert d[4:-4, 4:-4].max() < 8.0 / 127.5, d[4:-4, 4:-4].max()
