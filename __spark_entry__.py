"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship customer-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's registered operator
library (jorvik_spark.queries) for the sf0.01 DuckDB-oracle check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jorvik_spark.queries import ORACLES, QUERIES  # noqa: E402
from jorvik_spark.session import apply_runtime_confs  # noqa: E402
from jorvik_spark.tables import default_sf_dir

_SMOKE_SF_DIR = default_sf_dir()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    return QUERIES["agg_group_stats"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query.

    Oracles for filesystem-backed queries (binaryFile scans) carry a
    ``{sf_dir}`` placeholder — resolved here to the driver's correctness
    scale (sf0.01), overridable via ``SPARK_GRAFT_TEST_SF`` so the local
    parity suite can run the same oracles at other SFs.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF") or default_sf_dir("sf0.01")
    return {
        name: sql.replace("{sf_dir}", sf_dir) for name, sql in ORACLES.items()
    }
