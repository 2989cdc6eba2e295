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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
