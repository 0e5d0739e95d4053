"""UDF / UDAF surface (SURVEY.md §2B "UDF / UDAF / UDTF").

The reference has no row-level UDFs (its transform functions are
driver-side Python composing built-ins — /root/reference/jorvik/pipelines/
etl.py:179); these two queries pin down the *engine policy* for when
Python in the data path is unavoidable:

* ``udf_pandas_scalar``  — ``@pandas_udf``: Arrow-batched, vectorized
  numpy arithmetic. ~10-100× faster than row-at-a-time ``F.udf`` and the
  only acceptable scalar-Python shape at 100 TB. The computation itself
  (net price) is chosen to be SQL-expressible so the DuckDB oracle proves
  the UDF path end-to-end, not just rows-only.
* ``udaf_grouped_apply`` — ``groupBy().applyInPandas``: grouped custom
  aggregation (median — not a single built-in expression shape) over a
  *high-cardinality* key (``l_suppkey``) so groups are many and small.
  That is the applyInPandas scale contract: each group must fit one
  executor's memory, and group count must exceed core count or the stage
  serializes. Never applyInPandas on a handful of giant groups.

Both stay deterministic cross-engine: per-row IEEE double arithmetic in
identical operation order, and exact math (whole-number quantities,
(a+b)/2 medians) in the aggregate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from jorvik_spark.tables import load_table
from jorvik_spark.queries.registry import query


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar Pandas UDF (Arrow batches) computing net price.

    The filter stays *outside* the UDF so it pushes down to the parquet
    scan; only surviving rows cross the JVM↔Python Arrow boundary.
    """
    # Defined here (not module level): pandas_udf validates its return
    # type against the active session, which doesn't exist at import time.
    @pandas_udf("double")
    def _net_price(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # Left-associative, same op order as the oracle SQL → bitwise-equal
        # IEEE doubles on both engines.
        return ext * (1.0 - disc) * (1.0 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _net_price("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
    )


def _supplier_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    q = pdf["l_quantity"].sort_values().to_numpy()
    n = len(q)
    # Exact median: middle element, or (a+b)/2 of the two middles —
    # matching DuckDB's median() formula bit for bit (quantities are
    # whole-number doubles, so all arithmetic here is exact).
    med = q[n // 2] if n % 2 else (q[n // 2 - 1] + q[n // 2]) / 2.0
    p = pdf["l_extendedprice"]
    return pd.DataFrame(
        {
            "l_suppkey": [pdf["l_suppkey"].iloc[0]],
            "n_rows": [n],
            "sum_qty": [q.sum()],  # whole numbers → exact in any order
            "median_qty": [med],
            "price_range": [p.max() - p.min()],
        }
    )


@query(
    "udaf_grouped_apply",
    oracle="""
    SELECT l_suppkey,
           COUNT(*) AS n_rows,
           SUM(l_quantity) AS sum_qty,
           median(l_quantity) AS median_qty,
           MAX(l_extendedprice) - MIN(l_extendedprice) AS price_range
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def udaf_grouped_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation via ``applyInPandas`` (one Arrow batch
    per supplier group; one shuffle on the group key, same as a hash agg)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity", "l_extendedprice"
    )
    return li.groupBy("l_suppkey").applyInPandas(
        _supplier_stats,
        schema=(
            "l_suppkey long, n_rows long, sum_qty double, "
            "median_qty double, price_range double"
        ),
    )


@query(
    "udf_map_in_pandas",
    oracle="""
    SELECT event_id, value, TRUE AS z_bounded
    FROM events
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInPandas`` partition-wise transform: per-Arrow-batch z-score
    of event values against *running* partition statistics.

    The iterator form processes one Arrow batch at a time — constant
    memory per partition regardless of partition size, the required shape
    for 100 TB map-side Python (feature extraction, tokenizer calls).

    Driver-legible form: the running (per-partition) z itself is
    partitioning-dependent by design, so it is projected to ``z_bounded``
    (finite and |z| ≤ 1e6 — true under any partitioning of this data)
    while ``event_id``/``value`` pass through untouched. The hash check
    then pins exactly what CAN break in iterator plumbing: a dropped or
    duplicated batch, a misaligned passthrough column, or a NaN/inf from
    the running-variance update — each flips a row and hash-fails.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")

    def zscore(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Null values (Arrow delivers them as NaN) are excluded from the
        # running moments — a NaN row counted in n but skipped by the
        # NaN-skipping sums would silently bias the mean for every later
        # row — and are vacuously bounded (no z is defined for them),
        # matching the oracle's unconditional TRUE.
        n, s, s2 = 0, 0.0, 0.0
        for pdf in batches:
            vals = pdf["value"]
            present = vals.notna()
            n += int(present.sum())
            s += float(vals.sum())  # pandas sum skips NaN
            s2 += float((vals**2).sum())
            mean = s / n if n else 0.0
            var = max(s2 / n - mean * mean, 1e-12) if n else 1.0
            z = (vals - mean) / (var**0.5)
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "value": vals,
                    "z_bounded": ~present
                    | (np.isfinite(z) & (z.abs() <= 1e6)),
                }
            )

    return ev.mapInPandas(
        zscore, schema="event_id long, value double, z_bounded boolean"
    )


@query(
    "udtf_sentence_split",
    oracle="""
    WITH s AS (SELECT doc_id, string_split(text, '. ') AS t
               FROM documents WHERE doc_id < 200),
    pos AS (SELECT doc_id,
                   CAST(unnest(range(0, len(t))) AS INTEGER) AS idx,
                   unnest(t) AS sentence
            FROM s)
    SELECT doc_id, idx, sentence,
           CAST(len(sentence) AS INTEGER) AS n_chars
    FROM pos
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 4): one input row → N output
    rows via ``LATERAL`` — the user-defined explode. The function splits
    each document into ('. '-delimited) sentences with their positions;
    per-sentence char counts are added JVM-side AFTER the lateral join,
    so the Python stage emits only what Python computed.

    Policy (same as the module docstring): a UDTF is a ROW-AT-A-TIME
    Python path — the demo caps the input (doc_id < 200) and the
    equivalent built-in (``posexplode(split(...))``, see
    text_explode_positional) is always preferred when the expansion is
    expressible. A UDTF earns its cost only when the row-generating
    logic genuinely needs Python (a parser, a tokenizer library); then
    ``spark.sql.execution.pythonUDTF.arrow.enabled`` switches the
    transfer to Arrow batches.

    NULL contract, mirrored by the oracle: a NULL text yields no rows
    (the generator returns without yielding), exactly as DuckDB's
    ``unnest(NULL)``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx: int, sentence: string")
    class SentSplit:
        def eval(self, text: str):  # noqa: ANN001 — UDTF signature
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield i, s

    spark.udtf.register("jorvik_sent_split", SentSplit)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.idx, s.sentence,
               CAST(length(s.sentence) AS INT) AS n_chars
        FROM _udtf_docs, LATERAL jorvik_sent_split(text) AS s
        """
    )
