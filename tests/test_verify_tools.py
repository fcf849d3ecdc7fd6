"""CI smoke for tools/verify: every capture variant must generate a
config the server's own loader accepts, a capture of the right size
and a truth.json the client can act on.  (The full signal-level flows
run against live servers — verify skill — and are too slow for CI;
this pins the generator/config surface so refactors can't silently
break the e2e tooling.)"""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

from phantomsdr_tpu.config import load_config

_spec = importlib.util.spec_from_file_location(
    "verify_captures",
    Path(__file__).resolve().parent.parent / "tools" / "verify"
    / "captures.py")
captures = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(captures)


@pytest.mark.parametrize("variant", ["tone", "am", "stereo", "rds",
                                     "both", "nr", "lms", "nb", "de"])
def test_variant_generates_loadable_config(variant, tmp_path):
    truth = captures.make(variant, tmp_path, 19999, secs=1.0)
    cfg = load_config(tmp_path / "config.toml")
    assert cfg.port == 19999
    assert cfg.sps == truth["sps"]
    assert cfg.fft_size == truth["fft_size"]
    assert cfg.audio_sps == truth["audio_sps"]
    # capture is interleaved s16 IQ at sps for ~secs
    n = (tmp_path / "capture.s16").stat().st_size // 4
    assert n == pytest.approx(truth["sps"], rel=0.01)
    # the client needs the carrier position for every variant
    assert "f_off_hz" in truth
    if variant in ("rds", "both"):
        assert cfg.rds and truth["pi"] == "54A7"
    if variant in ("nr", "lms", "nb"):
        assert cfg.nr
    assert cfg.nr_algo == {"lms": "lms", "nb": "nb"}.get(
        variant, "spectral")
    if variant == "de":
        assert cfg.deemphasis == truth["tau_us"]


def test_mesh_and_cluster_configs(tmp_path):
    captures.make("rds", tmp_path, 19999, secs=1.0, mesh=4)
    cfg = load_config(tmp_path / "config.toml")
    assert cfg.mesh_devices == 4
    assert cfg.hop_batch % 4 == 0
    assert cfg.rds  # the [tpu] section must not swallow [input] keys


def test_av1_waterfall_config(tmp_path):
    captures.make("tone", tmp_path, 19999, secs=1.0,
                  wf_compression="av1")
    cfg = load_config(tmp_path / "config.toml")
    assert cfg.waterfall_compression == "av1"


def test_capture_is_not_clipped(tmp_path):
    """s16 clipping reshapes the NB clicks (verify-skill gotcha) --
    every variant must stay inside full scale."""
    for variant in ("tone", "am", "nr", "lms", "nb", "both"):
        d = tmp_path / variant
        captures.make(variant, d, 19999, secs=1.0)
        s = np.fromfile(d / "capture.s16", np.int16)
        assert np.abs(s.astype(np.int32)).max() < 32767, variant
