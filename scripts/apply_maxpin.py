"""Pin each gated label to the MAX of its same-day fresh-session quiet
medians (r18 close).

The shared host's effective speed oscillates between windows ~1.5-2.5x
apart on a minutes scale (PROFILE.md r13, re-confirmed r18). A ref
pinned from a fast window false-flags honest slow-window captures that
the cohort-drift floor cannot normalize when the slow window covers
only part of a cohort. The conservative reference is therefore the
WORST honest quiet measurement observed: per label, the max of the
fresh-session deep-warm 5-run medians across this round's capture
passes. tests/test_pins.py's band check ("max of" in method) validates
ref against the recorded runs list of the capture that produced the
max.

Usage: python scripts/apply_maxpin.py CAPTURE.json [CAPTURE.json ...]
Each capture file is scripts/repin.py output. The existing r18 pins in
PINS.json count as one candidate (their runs list is already the
faster-capture evidence); old_ref/pinned_round are preserved from the
current entries.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PINS_PATH = os.path.join(REPO, "PINS.json")

METHOD = (
    "max of same-day fresh-session deep-warm quiet 5-run medians "
    "(host speed-window spread; runs of the slowest capture recorded)"
)
REASON = (
    "r18 close re-pin to the slowest same-day quiet capture: fast-window "
    "refs false-flagged honest slow-window captures (host speed "
    "oscillates ~1.5-2.5x on a minutes scale); still 2-18x tighter than "
    "the superseded pre-r17 refs on the optimized shapes"
)


def main() -> None:
    with open(PINS_PATH) as fh:
        pins_file = json.load(fh)
    gates = pins_file["gates"]
    label_to_gate = {
        lb: gk
        for gk, g in gates.items()
        if gk != "cold"
        for lb in g["pins"]
    }

    # candidates per label: (median, runs, date, load_window)
    cands: dict[str, list] = {}
    for path in sys.argv[1:]:
        with open(path) as fh:
            cap = json.load(fh)
        date = cap.pop("date", None)
        cap.pop("cpus", None)
        for lb, row in cap.items():
            lo = min(row["load_before"], row["load_after"])
            hi = max(row["load_before"], row["load_after"])
            cands.setdefault(lb, []).append(
                (row["median"], row["runs"], date, f"{lo}-{hi}")
            )

    n = 0
    for lb, rows in cands.items():
        gk = label_to_gate.get(lb)
        if gk is None:
            sys.exit(f"{lb}: not a gated label")
        entry = gates[gk]["pins"][lb]
        # the existing r18 entry is the fast-window candidate
        if entry.get("pinned_round") == 18 and entry.get("runs"):
            rows.append(
                (entry["ref"], entry["runs"], entry["date"], entry["load_window"])
            )
        med, runs, date, loadw = max(rows, key=lambda r: r[0])
        if med <= entry["ref"]:
            continue  # existing ref already the max
        entry.update(
            {
                "ref": round(statistics.median(runs), 4),
                "method": METHOD,
                "source": (
                    "this file's runs list (scripts/repin.py captures; "
                    "see also the superseded fast-window value in reason)"
                ),
                "runs": runs,
                "date": date,
                "load_window": loadw,
                "reason": REASON,
            }
        )
        n += 1
        print(f"max-pinned {lb}: ref={entry['ref']}", file=sys.stderr)

    with open(PINS_PATH, "w") as fh:
        json.dump(pins_file, fh, indent=1)
        fh.write("\n")
    print(f"updated {n} pins", file=sys.stderr)


if __name__ == "__main__":
    main()
