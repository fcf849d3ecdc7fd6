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

import numpy as np
import pytest


def test_control_codec_roundtrip():
    """pack_control/unpack_control must stay in lockstep (every column
    of the channel table, incl. the nr and rds opt-ins, plus views,
    wf meta and the optional reset mask survive the wire)."""
    from phantomsdr_tpu.parallel.multihost import (
        pack_control, unpack_control,
    )

    rng = np.random.default_rng(0)
    c, w = 8, 5
    tbl = (rng.integers(0, 1000, c).astype(np.int32),
           rng.integers(0, 1000, c).astype(np.int32),
           rng.integers(0, 1000, c).astype(np.int32),
           rng.integers(0, 4, c).astype(np.int32),
           rng.integers(0, 2, c).astype(bool),
           rng.integers(0, 2, c).astype(bool),
           rng.integers(0, 2, c).astype(bool))
    mid = rng.standard_normal(c)
    views = (rng.integers(0, 99, w).astype(np.int32),
             rng.integers(0, 99, w).astype(np.int32))
    wfm = tuple(rng.integers(0, 99, w).astype(np.int32) for _ in range(3))
    for reset in (None, rng.integers(0, 3, c).astype(np.int32)):
        hdr, blob = pack_control(tbl, mid, views, wfm, reset)
        tbl2, mid2, views2, wfm2, reset2 = unpack_control(hdr, blob)
        for a, b in zip(tbl, tbl2):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(mid, mid2)
        for a, b in zip(views + wfm, views2 + wfm2):
            np.testing.assert_array_equal(a, b)
        if reset is None:
            assert reset2 is None
        else:
            np.testing.assert_array_equal(reset, reset2)


def test_host_update_codec_roundtrip():
    """pack_host_update/unpack_host_update lockstep: the follower's
    8 channel-range arrays (incl. mid, nr, rds), reset mask, and the
    waterfall range's 5 view arrays."""
    from phantomsdr_tpu.parallel.multihost import (
        pack_host_update, unpack_host_update,
    )

    rng = np.random.default_rng(1)
    c, w = 4, 3
    ctbl = (rng.integers(0, 99, c).astype(np.int32),
            rng.integers(0, 99, c).astype(np.int32),
            rng.integers(0, 99, c).astype(np.int32),
            rng.integers(0, 4, c).astype(np.int32),
            rng.integers(0, 2, c).astype(bool),
            rng.standard_normal(c),
            rng.integers(0, 2, c).astype(bool),
            rng.integers(0, 2, c).astype(bool))
    wrows = tuple(rng.integers(0, 99, w).astype(np.int32)
                  for _ in range(5))
    for resets in (None, rng.integers(0, 3, c).astype(np.int32)):
        hdr, blob = pack_host_update(2, c, ctbl, resets, 1, w, wrows)
        tbl2, resets2, wrows2 = unpack_host_update(hdr, blob)
        assert hdr["chan_offset"] == 2 and hdr["wf_offset"] == 1
        for a, b in zip(ctbl, tbl2):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(wrows, wrows2):
            np.testing.assert_array_equal(a, b)
        if resets is None:
            assert resets2 is None
        else:
            np.testing.assert_array_equal(resets, resets2)


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
