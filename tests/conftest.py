"""Test configuration: force an 8-virtual-device CPU backend (the TPU-world
substitute for a fake distributed backend) and make the repo importable."""

import os
import sys

# Must run before jax is imported anywhere. Force-assign: the environment
# presets JAX_PLATFORMS=axon (the TPU plugin), which must not leak into the
# CPU-mesh test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize additionally calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# overrides the env var -- undo it here (before any backend is used).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual device threads share ONE physical core here; under
    # external load the default 40 s rendezvous deadline SIGABRTs the
    # whole pytest process mid-collective (observed: a concurrent
    # compile job starved test_distributed_checkpoint's all-gather; a
    # round-5 run with THREE concurrent jobs blew even a 600 s deadline).
    # Slow is recoverable, aborted is not: 1800 s matches pyproject's
    # faulthandler_timeout so a genuine deadlock dumps tracebacks before
    # the rendezvous guard can kill the whole session; warn_stuck keeps
    # printing progress warnings every 2 min meanwhile.
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1800"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
os.environ["XLA_FLAGS"] = flags

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def make_celeba_fixture(tmp_path, n_train=4, n_test=2, img_size=64):
    """Shared synthetic CelebA-format fixture: attr table + NOISE images
    (constant images NaN through train-mode BN -- CLAUDE.md trap) under
    tmp_path. attr index 10 'Blurry' == 1 selects the test split
    (TextFaceDataset convention, reference datasets.py:934-961); attr 0 is
    forced positive so every caption is nonempty. Returns tmp_path; the
    caller writes its own config YAML next to it."""
    import numpy as np
    from PIL import Image

    attrs = ["Attractive", "Young", "Smiling", "Male", "BlackHair",
             "BlondHair", "Eyeglasses", "Bangs", "BigLips", "BigNose",
             "Blurry", "Chubby"]
    rng = np.random.RandomState(0)
    rows = [" ".join(attrs) + " "]
    img_dir = tmp_path / "Img"
    img_dir.mkdir()
    for i in range(n_train + n_test):
        vals = ["1" if rng.rand() < 0.5 else "0" for _ in attrs]
        vals[10] = "0" if i < n_train else "1"
        vals[0] = "1"
        rows.append(f"{i:06d}.jpg " + " ".join(vals))
        im = (rng.rand(img_size, img_size, 3) * 255).astype(np.uint8)
        Image.fromarray(im).save(img_dir / f"{i:06d}.png")
    (tmp_path / "list_attr_celeba.txt").write_text("\n".join(rows) + "\n")
    return tmp_path
