"""Multi-host runtime validation: runs the 2-process CPU-cluster dryrun
(tools/multihost_dryrun.py) as a subprocess cluster.

Covers: jax.distributed bootstrap (2 processes x 2 virtual devices, one
4-device mesh, gloo collectives across the process boundary), DCN raw-
row feeding over a real TCP link, replicated control-block distribution,
a follower-side retune flowing upstream, per-host channel-range audio
extraction, and bit-identity against the single-process pipeline."""

import subprocess
import sys
from pathlib import Path

import pytest


def test_multihost_dryrun_two_processes(tmp_path):
    tool = Path(__file__).resolve().parent.parent / "tools" / "multihost_dryrun.py"
    res = subprocess.run(
        [sys.executable, str(tool), "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=280,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "MULTIHOST_DRYRUN_OK" in res.stdout, res.stdout + res.stderr
    # the comparison itself printed per-host zero-error lines
    assert "max |err| = 0" in res.stdout
