"""Fresh-session deep-warm quiet 5-run pin capture (PINS.json discipline).

Usage:
  python scripts/repin.py LABEL [LABEL ...] [--runs N] [--out FILE]
  python scripts/repin.py --cold LABEL [...]   # cold-pin regime

Labels are bench cohort labels (e.g. r10_triangle). Per label: resolve
the registered query via bench's cohort dicts, deep-warm exactly like
bench.time_query (plateau detection, cap 10), then N timed collect()
runs. Emits one JSON object {label: {query, runs, median, load_before,
load_after}} suitable for pasting into PINS.json provenance fields.

--cold switches to the bench's cold regime (r18): labels resolve via
BENCH_COLD_QUERIES, each run starts from a clear_memos() state and
there is no deep warm-up beyond one throwaway JIT run WITH memos
cleared before it (the bench's cold pass runs inside an already-JIT-hot
session, so a fresh-process cold pin must discard the first run or it
would pin JVM compile time into the ref).

Run this on a QUIET host in a FRESH process — the point of the pin is a
session unpolluted by a prior capture's JIT/cache state beyond the
query's own deep warm-up.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from jorvik_spark.session import get_session  # noqa: E402
from jorvik_spark.queries import QUERIES  # noqa: E402

ALL_COHORTS = (
    bench.BENCH_QUERIES,
    bench.BENCH_2C_QUERIES,
    bench.BENCH_R8_QUERIES,
    bench.BENCH_R9_QUERIES,
    bench.BENCH_R10_QUERIES,
    bench.BENCH_R11_QUERIES,
    bench.BENCH_R12_QUERIES,
    bench.BENCH_R13_QUERIES,
    bench.BENCH_R14_QUERIES,
    bench.BENCH_R15_QUERIES,
    bench.BENCH_R16_QUERIES,
)


def resolve(label: str, cold: bool = False) -> str:
    if cold:
        if label in bench.BENCH_COLD_QUERIES:
            return bench.BENCH_COLD_QUERIES[label]
        raise SystemExit(f"unknown cold bench label: {label}")
    for cohort in ALL_COHORTS:
        if label in cohort:
            return cohort[label]
    raise SystemExit(f"unknown bench label: {label}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("labels", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    spark = get_session("jorvik_repin", master=f"local[{cpus}]")

    from jorvik_spark.queries.registry import clear_memos

    out: dict = {"date": time.strftime("%Y-%m-%d"), "cpus": int(cpus)}
    for label in args.labels:
        qname = resolve(label, cold=args.cold)
        fn = QUERIES[qname]
        load_before = round(os.getloadavg()[0], 2)
        if args.cold:
            # one discarded cleared run absorbs fresh-process JIT; each
            # timed run then starts from a cleared memo state (the bench
            # cold regime)
            clear_memos()
            fn(spark, args.sf).collect()
        else:
            # bench.py's adaptive warm-up regime, verbatim
            prev = float("inf")
            plateau = 0
            for i in range(10):
                t0 = time.perf_counter()
                fn(spark, args.sf).collect()
                cur = time.perf_counter() - t0
                plateau = plateau + 1 if cur > prev * 0.97 else 0
                if i >= 2 and plateau >= 2:
                    break
                prev = min(prev, cur)
        runs = []
        for _ in range(args.runs):
            if args.cold:
                clear_memos()
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            runs.append(round(time.perf_counter() - t0, 4))
        if args.cold:
            clear_memos()
        row = {
            "query": qname,
            "runs": runs,
            "median": round(statistics.median(runs), 4),
            "load_before": load_before,
            "load_after": round(os.getloadavg()[0], 2),
        }
        out[label] = row
        print(f"{label}: {row}", file=sys.stderr)
    payload = json.dumps(out, indent=1)
    print(payload)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(payload)


if __name__ == "__main__":
    main()
