"""Build ``shortwavestations.json`` (the UI's frequency-label DB) from
an HFCC broadcast schedule.

TPU-repo equivalent of the reference's one-off script
(reference: frequencylist/generateshortwave.py): the frontend fetches
a JSON array of ``{"f": <Hz>, "d": <display text>, "m": "AM"}`` rows
sorted by frequency and overlays the labels on the waterfall.  Inputs
are the two public HFCC season files:

- the schedule (e.g. ``B21all00.TXT``): fixed-column records, kHz in
  columns 0-5 and the 3-letter broadcaster code in columns 117-120
  (reference :14-17),
- the broadcaster legend (e.g. ``broadcas.txt``): ``CODE  Name`` lines
  (reference :7-10); ``;`` starts a comment in both.

Stations sharing a frequency are joined newline-separated in sorted
order, matching the reference output on the same inputs -- except that
multi-space code/name separators in the legend are collapsed
(split(None, 1)); the reference's split(" ", 1) keeps the extra spaces
glued to the name, which indents the UI label and perturbs the sort.

Usage:
  python tools/generate_stations.py SCHEDULE.TXT broadcas.txt \
      -o html/shortwavestations.json
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def parse_broadcasters(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    with open(path, encoding="ISO-8859-1") as fh:
        for line in fh:
            if not line or line[0] == ";":
                continue
            parts = line.rstrip().split(None, 1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def parse_schedule(path: str) -> dict[int, set[str]]:
    freqs: dict[int, set[str]] = defaultdict(set)
    with open(path, encoding="ISO-8859-1") as fh:
        for line in fh:
            if not line or line[0] == ";" or len(line) < 120:
                continue
            try:
                f = int(line[:5])
            except ValueError:
                continue
            freqs[f].add(line[117:120])
    return freqs


def build(schedule: str, broadcasters: str) -> list[dict]:
    names = parse_broadcasters(broadcasters)
    rows = []
    for khz, codes in sorted(parse_schedule(schedule).items()):
        # unknown codes fall back to the raw code rather than KeyError
        # (the reference assumes a complete legend)
        d = "\n".join(sorted(names.get(c, c) for c in codes))
        rows.append({"f": khz * 1000, "d": d, "m": "AM"})
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("schedule", help="HFCC season schedule (B21all00.TXT)")
    ap.add_argument("broadcasters", help="broadcaster legend (broadcas.txt)")
    ap.add_argument("-o", "--out", default="shortwavestations.json")
    args = ap.parse_args()
    rows = build(args.schedule, args.broadcasters)
    with open(args.out, "w") as fh:
        json.dump(rows, fh, indent=4)
    print(f"wrote {len(rows)} frequencies to {args.out}")


if __name__ == "__main__":
    main()
