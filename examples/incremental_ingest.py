"""Continuous document ingestion with incremental near-dup screening.

The deployment shape a continuously-fed training corpus actually runs:
new document dumps land in a drop directory; each micro-batch is quality-
gated, then screened against the banded-MinHash index of EVERYTHING
already accepted (``incremental_dedup_sink`` — batch-sized work per
ingest, never a full-corpus re-dedup), and survivors append to the
curated corpus while the batch's not-yet-indexed (band, key) pairs —
dropped docs' included, so screened content stays screened — extend
the index.

Composition, stage by stage:

1. ``readStream`` over the drop directory (A2 — the engine's streaming
   source, schema declared so an empty first batch cannot mis-infer).
2. A quality pre-gate on the STREAM (pure narrow expressions — the same
   Gopher-style bounds as the batch curation example), so junk never
   costs signature work or index space.
3. ``incremental_dedup_sink``: per batch, banded-MinHash signatures,
   collision screen vs the persisted index + smaller-id batch siblings,
   index-first appends (replay-convergent — see the sink's docstring).

Run ``python examples/incremental_ingest.py`` to ingest the sf0.001
documents table in two simulated drops and print the corpus/index
state after each.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F
from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)

from jorvik_spark.storage import BasicStorage  # noqa: E402
from jorvik_spark.streaming import incremental_dedup_sink  # noqa: E402
from jorvik_spark.queries.text_analysis import _TOKENS  # noqa: E402

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

MIN_TOKENS = 5


def quality_gate(stream: DataFrame) -> DataFrame:
    """Narrow pre-filter on the stream: too-short docs are dropped
    BEFORE they cost MinHash signatures or index rows."""
    return stream.filter(
        F.expr(f"size({_TOKENS})") >= MIN_TOKENS
    )


def ingest_drop(
    spark: SparkSession, drop_dir: str, lake: str, run_tag: str
):
    """One availableNow pass over the drop directory: gate, screen,
    append. The shared checkpoint makes successive passes resume where
    the previous one stopped (only NEW files are processed)."""
    st = BasicStorage()
    stream = st.readStream(drop_dir, "parquet", schema=DOCUMENTS_SCHEMA)
    q = incremental_dedup_sink(
        quality_gate(stream),
        index_path=f"{lake}/dedup_index",
        out_path=f"{lake}/curated",
        checkpoint=f"{lake}/cp/ingest",
    )
    if not q.awaitTermination(300):
        # still running: stop before reading, or the counts below race
        # the in-flight foreachBatch appends
        q.stop()
        raise TimeoutError(f"[{run_tag}] ingest did not drain in 300s")
    n_docs = spark.read.parquet(f"{lake}/curated").count()
    n_bands = spark.read.parquet(f"{lake}/dedup_index").count()
    print(f"[{run_tag}] curated docs: {n_docs}, index bands: {n_bands}")
    return n_docs, n_bands


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("incremental_ingest_example")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    lake = tempfile.mkdtemp(prefix="jorvik_ingest_")
    drop = f"{lake}/drop"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # Drop 1: the first half of the dump.
    docs.filter("doc_id % 2 = 0").write.mode("append").parquet(drop)
    ingest_drop(spark, drop, lake, "drop-1")

    # Drop 2: the second half PLUS exact re-sends of drop 1 (the
    # upstream crawler re-emitting old files) — the re-sends must be
    # screened out by the index, not re-accepted.
    docs.filter("doc_id % 2 = 1").write.mode("append").parquet(drop)
    docs.filter("doc_id % 2 = 0").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    ).write.mode("append").parquet(drop)
    ingest_drop(spark, drop, lake, "drop-2")


if __name__ == "__main__":
    main()
