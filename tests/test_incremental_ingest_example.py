"""End-to-end run of the incremental-ingest example
(examples/incremental_ingest): two drops through one checkpoint, with
drop 2 containing re-sent drop-1 content under new ids — the persisted
band index must screen the re-sends while admitting the genuinely new
half."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from examples.incremental_ingest import ingest_drop, quality_gate
from jorvik_spark.tables import default_sf_dir

SF_DIR = default_sf_dir()


def test_two_drops_with_resends(spark):
    lake = tempfile.mkdtemp(prefix="jorvik_ingest_test_")
    drop = f"{lake}/drop"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_even = docs.filter("doc_id % 2 = 0").count()
    gated_even = quality_gate(docs.filter("doc_id % 2 = 0")).count()

    docs.filter("doc_id % 2 = 0").write.mode("append").parquet(drop)
    # junk rows the quality gate must drop BEFORE they cost index space
    spark.createDataFrame(
        [(5_000_000, "too short", "en", "junk", 9),
         (5_000_001, None, "en", "junk", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("append").parquet(drop)
    n1, bands1 = ingest_drop(spark, drop, lake, "t-drop-1")
    # only gated docs are ingested (minus same-batch near-dup collisions)
    assert 0 < n1 <= gated_even <= n_even
    # Index contract (round 8): one row per DISTINCT (band, key) of every
    # gated doc — dropped docs' bands included, so screened content stays
    # screened. With ≤4 MinHash + 1 exact band per doc, that is bounded
    # by the gated count, and must at least cover the accepted docs.
    assert 5 * n1 <= bands1 <= 5 * gated_even
    index = spark.read.parquet(f"{lake}/dedup_index")
    assert index.count() == index.select("band", "key").distinct().count()
    assert (
        spark.read.parquet(f"{lake}/curated")
        .filter("doc_id >= 5000000").count() == 0
    )

    # drop 2: odd half + exact re-sends of the even half under NEW ids.
    docs.filter("doc_id % 2 = 1").write.mode("append").parquet(drop)
    docs.filter("doc_id % 2 = 0").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    ).write.mode("append").parquet(drop)
    n2, bands2 = ingest_drop(spark, drop, lake, "t-drop-2")

    curated = spark.read.parquet(f"{lake}/curated")
    # no re-sent id survived: every re-send collides with its drop-1
    # original in the index.
    assert curated.filter("doc_id >= 1000000").count() == 0
    assert n2 > n1  # the odd half added genuinely new docs
    # Exact re-sends contribute ZERO index rows (their (band, key) pairs
    # are all already present): growth is bounded by the odd half's
    # distinct bands, and the key-set stays duplicate-free.
    gated_odd = quality_gate(docs.filter("doc_id % 2 = 1")).count()
    assert bands1 < bands2 <= bands1 + 5 * gated_odd
    index = spark.read.parquet(f"{lake}/dedup_index")
    assert index.count() == index.select("band", "key").distinct().count()
