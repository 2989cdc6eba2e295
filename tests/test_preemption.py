"""SIGTERM preemption handling (utils/preemption.py).

TPU VMs announce preemption with SIGTERM; both training CLIs route it
onto their graceful KeyboardInterrupt path (final snapshot + async
checkpoint-writer join). The reference handles only Ctrl-C
(pretrain_DAMSM.py:293-295).
"""

import os
import signal
import subprocess
import sys
import threading
import time

import pytest

from tgsr_tpu.utils.preemption import graceful_sigterm

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigterm_raises_keyboardinterrupt_in_main_thread():
    prev = signal.getsignal(signal.SIGTERM)
    with pytest.raises(KeyboardInterrupt):
        with graceful_sigterm() as installed:
            assert installed
            os.kill(os.getpid(), signal.SIGTERM)
            time.sleep(5)  # interrupted by the handler long before 5 s
            pytest.fail("SIGTERM handler did not fire")
    # previous disposition restored on exit
    assert signal.getsignal(signal.SIGTERM) is prev


def test_noop_outside_main_thread():
    """In-process CLI invocations from worker threads (the serving tests'
    pattern) must not crash: the manager yields False and does nothing."""
    out = []

    def run():
        with graceful_sigterm() as installed:
            out.append(installed)

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert out == [False]


def _face_fixture(tmp_path):
    # shared synthetic CelebA-format fixture (tests.conftest builder)
    from tests.conftest import make_celeba_fixture

    make_celeba_fixture(tmp_path, n_train=4, n_test=0, img_size=64)
    cfg = tmp_path / "train_face.yml"
    cfg.write_text(
        "CONFIG_NAME: 'smoke'\n"
        "DATASET_NAME: 'face'\n"
        f"DATA_DIR: '{tmp_path}'\n"
        "TREE:\n    BRANCH_NUM: 4\n    BASE_SIZE: 8\n"
        "GAN:\n    GF_DIM: 16\n    DF_DIM: 16\n"
        "TRAIN:\n    FLAG: True\n    BATCH_SIZE: 2\n    MAX_EPOCH: 1\n"
        "    SNAPSHOT_INTERVAL: 1\n"
    )
    return cfg


@pytest.mark.slow
def test_train_gan_cli_survives_sigterm(tmp_path):
    """E2E: a SIGTERM'd training run exits 0 with a resumable checkpoint
    (the driver-facing preemption contract)."""
    cfg = _face_fixture(tmp_path)
    out = tmp_path / "out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["PYTHONUNBUFFERED"] = "1"
    prog = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from tgsr_tpu.cli.train_gan import main\n"
        f"main(['--cfg', {str(cfg)!r}, '--data_dir', {str(tmp_path)!r},\n"
        f"      '--out_dir', {str(out)!r}, '--epochs', '999',\n"
        "      '--log_every', '1'])\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", prog], env=env, cwd=REPO_ROOT,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # wait for the first logged step so the handler is installed and at
    # least one state exists, then preempt
    deadline = time.time() + 600
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if " it 1:" in line or time.time() > deadline:
            break
    proc.send_signal(signal.SIGTERM)
    try:
        rest, _ = proc.communicate(timeout=300)
    except subprocess.TimeoutExpired:
        proc.kill()
        pytest.fail("CLI did not exit after SIGTERM:\n" + "".join(lines))
    output = "".join(lines) + rest
    assert proc.returncode == 0, output
    assert "interrupted; saving final checkpoint" in output, output

    from tgsr_tpu.checkpoints.orbax_io import latest_step

    assert latest_step(str(out / "ckpt")) is not None, output
