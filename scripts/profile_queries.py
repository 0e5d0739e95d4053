"""Time every registered query at a given SF to find slow outliers.

Usage: python scripts/profile_queries.py [sf_dir]
Prints one line per query: name, warm median (2 runs after 1 warm-up), rows.
Not part of the driver contract — a local perf feedback loop.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jorvik_spark.session import get_session  # noqa: E402
from jorvik_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("jorvik_spark_profile", master="local[32]")
    results = []
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        try:
            rows = len(fn(spark, sf_dir).collect())  # warm-up
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            med = statistics.median(runs)
            results.append((med, name, rows))
            print(f"{med:8.3f}s  {name:32s} rows={rows}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"   ERROR  {name:32s} {type(exc).__name__}: {exc}", flush=True)
    print("\n--- slowest ---")
    for med, name, rows in sorted(results, reverse=True)[:12]:
        print(f"{med:8.3f}s  {name:32s} rows={rows}")


if __name__ == "__main__":
    main()
