"""bench.py's backend-init watchdog: cancel path is silent, fire path
prints the driver-contract failure JSON and exits 17 (a dead axon relay
previously hung the bench forever in PJRT client init)."""

import json
import os
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_watchdog_cancel_is_silent():
    import bench

    cancel = bench._init_watchdog(0.5)
    cancel()
    time.sleep(1.0)  # would have fired (and os._exit'd) by now


def test_watchdog_fire_prints_contract_json():
    p = subprocess.run(
        [sys.executable, "-c",
         "import bench, time\nbench._init_watchdog(0.5)\ntime.sleep(30)"],
        capture_output=True, text=True, timeout=60, cwd=REPO)
    assert p.returncode == 17
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert rec["value"] == 0 and rec["vs_baseline"] == 0
    assert "init timed out" in rec["metric"]


def test_deadline_watchdog_partial_and_failure():
    """The bench deadline watchdog (round 5: the remote-compile service can
    wedge MID-RUN, not just at init): with a collected result it prints a
    PARTIAL line and exits 0 (usable artifact); with nothing it prints the
    failure contract line and exits 18."""
    p = subprocess.run(
        [sys.executable, "-c",
         "import bench, time\n"
         "box = {'metric': 'images/sec/chip (t)', 'value': 123.0,\n"
         "       'unit': 'img/s', 'vs_baseline': 45.6}\n"
         "bench._deadline_watchdog(box, seconds=0.5)\ntime.sleep(30)"],
        capture_output=True, text=True, timeout=60, cwd=REPO)
    assert p.returncode == 0
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert rec["value"] == 123.0 and rec["metric"].startswith("PARTIAL")

    p = subprocess.run(
        [sys.executable, "-c",
         "import bench, time\n"
         "bench._deadline_watchdog({}, seconds=0.5)\ntime.sleep(30)"],
        capture_output=True, text=True, timeout=60, cwd=REPO)
    assert p.returncode == 18
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert rec["value"] == 0 and "FAILED" in rec["metric"]


def test_deadline_watchdog_cancel_is_silent():
    import bench

    cancel = bench._deadline_watchdog({}, seconds=0.5)
    cancel()
    time.sleep(1.0)  # would have fired by now
