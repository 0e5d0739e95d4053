"""Merge scripts/repin.py capture files into PINS.json (r18 re-pin).

Usage:
  python scripts/apply_repin.py CAPTURE.json [CAPTURE.json ...] \
      [--cold] [--round N] [--reason TEXT]

Each capture file is repin.py's output: {"date": ..., "cpus": ...,
label: {query, runs, median, load_before, load_after}, ...}. Warm
captures update the existing gate entry for each label (old_ref keeps
the superseded value); --cold captures land under the "cold" gate
(created on first use) that bench.py's report-only cold_x reads.

The provenance written satisfies tests/test_pins.py: run list, date,
load window, session=fresh-deep-warm, and ref == median(runs).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PINS_PATH = os.path.join(REPO, "PINS.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("captures", nargs="+")
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--round", type=int, default=18)
    ap.add_argument(
        "--reason",
        default=(
            "r18 re-pin on the r18 tree: lock in the r17/r18 optimization "
            "gains (r17 VERDICT item #1)"
        ),
    )
    args = ap.parse_args()

    with open(PINS_PATH) as fh:
        pins_file = json.load(fh)
    gates = pins_file["gates"]

    label_to_gate = {
        lb: gk for gk, g in gates.items() for lb in g["pins"]
    }

    method = (
        "fresh-session cold median-of-5 (cleared memos per run, one "
        "discarded JIT run)"
        if args.cold
        else "fresh-session deep-warm quiet median-of-5"
    )

    n = 0
    for path in args.captures:
        with open(path) as fh:
            cap = json.load(fh)
        date = cap.pop("date", None)
        cap.pop("cpus", None)
        for lb, row in cap.items():
            runs = row["runs"]
            med = round(statistics.median(runs), 4)
            lo = min(row["load_before"], row["load_after"])
            hi = max(row["load_before"], row["load_after"])
            entry = {
                "ref": med,
                "pinned_round": args.round,
                "method": method,
                "source": f"scripts/repin.py capture ({os.path.basename(path)}; runs below)",
                "runs": runs,
                "date": date,
                "load_window": f"{lo}-{hi}",
                "session": "fresh-deep-warm",
                "old_ref": None,
                "reason": args.reason,
            }
            if args.cold:
                g = gates.setdefault(
                    "cold",
                    {
                        "ref_round": args.round,
                        "_doc": (
                            "report-only cold refs (bench cold_x): one-time "
                            "memo-build cost per family, r17 verdict item #2"
                        ),
                        "pins": {},
                    },
                )
                old = g["pins"].get(lb)
            else:
                gk = label_to_gate.get(lb)
                if gk is None:
                    sys.exit(f"{lb}: not a gated label in PINS.json")
                g = gates[gk]
                old = g["pins"].get(lb)
            if old is not None:
                entry["old_ref"] = old["ref"]
            g["pins"][lb] = entry
            n += 1
            print(f"pinned {lb}: ref={med} (old={entry['old_ref']})", file=sys.stderr)

    with open(PINS_PATH, "w") as fh:
        json.dump(pins_file, fh, indent=1)
        fh.write("\n")
    print(f"updated {n} pins in PINS.json", file=sys.stderr)


if __name__ == "__main__":
    main()
