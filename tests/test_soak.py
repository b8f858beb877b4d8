"""Kill-injection lifecycle soak (tools/soak.py) — suite-sized run.

The full harness (100+ cycles) runs as a tool on the round cadence;
this keeps a 2-cycle smoke in the suite so the harness itself (victim
workload, ledger discipline, void resolution, invariant checks) can't
rot. Two cycles ≈ 50 s: one mid-work kill and whatever the seed's
second draw gives.
"""

import os
import subprocess
import sys

import logsqlite_spark

REPO = os.path.dirname(os.path.dirname(logsqlite_spark.__file__))


def test_soak_two_cycles_green(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "soak.py"),
         "--cycles", "2", "--seed", "2", "--root", str(tmp_path / "soak")],
        capture_output=True, text=True, timeout=420,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "soak_cycles_green" in out


def test_soak_stream_profile_two_cycles_green(tmp_path):
    """The r15 Structured-Streaming profile (checkpoint-resume under
    kills) — 2-cycle smoke so the stream victim + stream drain can't
    rot; the 100-cycle evidence run is the round-cadence tool."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "soak.py"),
         "--cycles", "2", "--seed", "3", "--profile", "stream",
         "--root", str(tmp_path / "soak")],
        capture_output=True, text=True, timeout=420,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "soak_cycles_green" in out


def test_soak_ivf_profile_two_cycles_green(tmp_path):
    """The r15 IVF index lifecycle profile (append/erase/compact +
    staged-swap adoption under kills) — 2-cycle smoke."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "soak.py"),
         "--cycles", "2", "--seed", "4", "--profile", "ivf",
         "--root", str(tmp_path / "soak")],
        capture_output=True, text=True, timeout=420,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "soak_cycles_green" in out
