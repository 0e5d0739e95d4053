"""Query registry: name → (spark, sf_dir) → DataFrame, plus DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2B/§2C) registers here via the
``@query`` decorator. ``__spark_entry__.py`` re-exports the two dicts for the
verification driver.

Numeric-determinism convention
------------------------------
Floating-point SUM/AVG are order-dependent, and the driver compares Spark
vs DuckDB results with a value hash. All double aggregations in registered
queries therefore go through :func:`dsum` / :func:`davg`, which aggregate in
exact DECIMAL arithmetic and cast the *result* to double — bitwise identical
on both engines regardless of partitioning or plan shape. The oracle SQL
uses the mirrored :data:`SQL_DSUM` / :data:`SQL_DAVG` templates.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# 25 integer digits / 6 decimals is ample for SF≤100k TPC-H-ish money values
# while staying far from the 38-digit overflow ceiling after SUM widening.
_DEC = "decimal(25,6)"


def dsum(col: str | Column) -> Column:
    """Order-independent SUM of a double column (exact decimal internally)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: str | Column) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register an engine query and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (non-SQL-expressible ops: streaming state, LSH, binary plumbing).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
