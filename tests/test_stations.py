"""Frequency-label DB generator (tools/generate_stations.py) -- the
TPU-repo equivalent of the reference's frequencylist/
generateshortwave.py: HFCC fixed-column schedule + broadcaster legend
-> sorted ``{"f","d","m"}`` JSON rows for the UI overlay."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from generate_stations import build  # noqa: E402


def _rec(khz: int, code: str) -> str:
    """One schedule record: kHz in cols 0-5, code in cols 117-120
    (reference frequencylist/generateshortwave.py:14-17)."""
    line = f"{khz:>5}" + " " * 112 + code
    assert line[117:120] == code
    return line


def test_build_shortwave_db(tmp_path):
    sched = tmp_path / "B21all00.TXT"
    sched.write_text("\n".join([
        "; HFCC comment",
        _rec(9580, "ABC") + " tail",
        _rec(9580, "BBC"),
        _rec(6030, "BBC"),
        _rec(6030, "BBC"),          # duplicate entries collapse
        _rec(7310, "XYZ"),          # code missing from the legend
        "short line",               # ignored (no column 117)
    ]) + "\n")
    leg = tmp_path / "broadcas.txt"
    leg.write_text("; legend\n"
                   "ABC Australian Broadcasting Corp.\n"
                   "BBC BBC World Service\n")
    rows = build(str(sched), str(leg))
    assert rows == [
        {"f": 6030000, "d": "BBC World Service", "m": "AM"},
        {"f": 7310000, "d": "XYZ", "m": "AM"},
        {"f": 9580000,
         "d": "Australian Broadcasting Corp.\nBBC World Service",
         "m": "AM"},
    ]
    # frequencies ascend and are in Hz (the reference emits khz*1000)
    fs = [r["f"] for r in rows]
    assert fs == sorted(fs)


def test_multispace_legend_names_not_indented(tmp_path):
    """HFCC legends separate code and name with column-aligned runs of
    spaces; the name must come out unindented (the reference's
    split(' ', 1) keeps the padding glued to the name)."""
    sched = tmp_path / "s.txt"
    sched.write_text(_rec(9580, "ABC") + "\n")
    leg = tmp_path / "b.txt"
    leg.write_text("ABC    Australian Broadcasting Corp.\n")
    rows = build(str(sched), str(leg))
    assert rows[0]["d"] == "Australian Broadcasting Corp."
