"""Long-run soak gating (VERDICT r4 item 4).

The full >=1 h soak (`-m soak`, deselected by default so CI stays
fast) asserts the resource bounds that were previously vouched for by
reasoning only: bounded RSS (<5%/hour growth post-warmup), flat step
latency, zero client/decode/device errors across hours of churn.  The
smoke variant runs in every CI pass and checks the same harness
mechanics on a 75 s window (everything except the hourly RSS budget,
which cannot be measured meaningfully in 75 s)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

TOOL = Path(__file__).resolve().parent.parent / "tools" / "soak.py"


def _run_soak(args, timeout):
    res = subprocess.run(
        [sys.executable, str(TOOL)] + args,
        capture_output=True, text=True, timeout=timeout)
    tail = "\n".join(res.stdout.splitlines()[-40:])
    assert res.returncode == 0, tail + res.stderr[-2000:]
    return json.loads(tail)


def test_soak_smoke():
    v = _run_soak(["--secs", "75", "--sample-secs", "10",
                   "--audio", "6", "--wf", "3", "--churn", "20",
                   "--port", "19612", "--dir", "/tmp/soak_ci",
                   "--rss-budget-pct", "1e9", "--lat-factor", "4"],
                  timeout=300)
    assert v["pass"], v
    assert v["decode_errors"] == 0 and v["client_errors"] == 0, v
    assert v["audio_pkts"] > 100 and v["wf_pkts"] > 100, v


@pytest.mark.soak
def test_soak_one_hour():
    """The claim-of-record run: 1 h, 24 audio + 8 wf with churn,
    RSS growth < 5%/hour post-warmup, flat latency, zero errors.
    Writes SOAK.json at the repo root (the committed artifact)."""
    v = _run_soak(["--secs", "3600", "--audio", "24", "--wf", "8",
                   "--churn", "45", "--port", "19613",
                   "--dir", "/tmp/soak_hour",
                   "--out", str(TOOL.parent.parent / "SOAK.json")],
                  timeout=4200)
    assert v["pass"], v
    assert v["rss_pct_per_hour"] < 5.0, v
