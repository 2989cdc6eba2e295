"""Driver-contract tests for __graft_entry__.

The round-1 driver artifact failed because dryrun_multichip assumed the
caller pre-forced an n-device backend; on the single-chip axon platform it
died with "need 8 devices, have 1". The fix re-execs in a subprocess with a
forced CPU backend. This test reproduces the driver's situation: a parent
interpreter whose jax backend is already initialized with ONE device
(CPU x1 stands in for axon x1 — the device-count failure mode is identical),
then calls dryrun_multichip(8) and expects success.
"""

import os
import subprocess
import sys

import pytest

from tests.conftest import REPO_ROOT


@pytest.mark.slow
def test_dryrun_multichip_self_forces_backend():
    env = dict(os.environ)
    # Simulate the driver: a live backend with only ONE device and no
    # xla_force_host_platform_device_count, platform pinned at startup.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        t for t in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in t
    )
    env.pop("_TGSR_DRYRUN_CHILD", None)
    prog = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"  # driver's world
        f"import sys; sys.path.insert(0, {REPO_ROOT!r})\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", prog], env=env, cwd=REPO_ROOT,
        # 6 legs; measured 843 s under a fully loaded host (round 5)
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(8) OK" in proc.stdout, proc.stdout


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and out.shape[-1] == 3
