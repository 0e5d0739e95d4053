"""Round-14 operator tests.

Covers the round's advice fixes (autocorr chunk-boundary ordering,
tv-distance disjoint pairs, benford empty-input guard) and the operators
added this round.
"""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jorvik_spark.tables import default_sf_dir

_SF = default_sf_dir()


def test_running_autocorr_pairs_survive_arrow_chunk_boundaries(
    spark, tmp_path
):
    """Advice r13 (medium): with a key's micro-batch spanning multiple
    Arrow record batches, pairs straddling a chunk boundary must still
    form in (ts_us, event_id) order — a per-chunk sort silently pairs
    them in arrival order instead. Pin: tiny maxRecordsPerBatch, one
    20-row micro-batch written in scrambled arrival order, live == batch
    bit-for-bit."""
    from jorvik_spark.streaming.ops import running_autocorr

    base = datetime.datetime(2024, 5, 1, 9, 0, 0)
    # Alternating series → r ≈ −1, but ONLY when paired in ts order;
    # arrival-order pairing over the scramble destroys the alternation.
    rows = [
        (
            i + 1,
            base + datetime.timedelta(minutes=i),
            1,
            "purchase",
            1000.0 if i % 2 == 0 else 10.0,
            None,
        )
        for i in range(20)
    ]
    # Scramble deterministically: reverse-interleave so consecutive ts
    # land in different Arrow chunks.
    scrambled = [rows[i] for i in range(1, 20, 2)] + [
        rows[i] for i in range(18, -1, -2)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df = spark.createDataFrame(scrambled, schema)
    src, dst, cp = (str(tmp_path / d) for d in ("src", "dst", "cp"))
    df.coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_autocorr(stream)
            .writeStream.foreachBatch(
                lambda b, i: b.write.mode("append").parquet(dst)
            )
            .option("checkpointLocation", cp)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    live = sorted(
        tuple(r)
        for r in spark.read.parquet(dst)
        .select("user_id", "n_pairs", "r_u")
        .collect()
    )
    batch = sorted(
        tuple(r)
        for r in running_autocorr(spark.createDataFrame(rows, schema))
        .select("user_id", "n_pairs", "r_u")
        .collect()
    )
    assert live == batch
    assert live[0][1] == 19
    assert live[0][2] < -900_000  # alternation detected → r ≈ −1


def test_tv_distance_reports_disjoint_vocab_pair(spark, tmp_path):
    """Advice r13 (low): a source pair sharing ZERO tokens must still
    appear with the maximal TV (1,000,000 ppm) instead of vanishing
    from the divergence report."""
    from jorvik_spark.queries import QUERIES

    d = str(tmp_path / "tv")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "source": ["alpha", "alpha", "beta", "gamma"],
            "lang": ["en"] * 4,
            "text": [
                "apple banana cherry",
                "apple banana",
                "apple dog elephant",
                "zebra yak xylophone",  # disjoint from both others
            ],
        }
    ).to_parquet(f"{d}/documents.parquet")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in QUERIES["corpus_source_tv_distance"](spark, d).collect()
    }
    assert set(got) == {
        ("alpha", "beta"),
        ("alpha", "gamma"),
        ("beta", "gamma"),
    }
    assert got[("alpha", "gamma")]["tv_ppm"] == 1_000_000
    assert got[("alpha", "gamma")]["n_common_types"] == 0
    assert got[("beta", "gamma")]["tv_ppm"] == 1_000_000
    assert 0 < got[("alpha", "beta")]["tv_ppm"] < 1_000_000


def test_benford_digits_empty_input_yields_null_report(spark, tmp_path):
    """Advice r13 (low): zero qualifying rows (all prices NULL or ≤ 0)
    must produce the 9-digit frame with NULL obs_ppm/chi2 — not a NaN
    cast that crashes the DuckDB oracle while the engine 'succeeds'."""
    import shutil

    from jorvik_spark.queries import QUERIES

    d = str(tmp_path / "benford")
    os.makedirs(d, exist_ok=True)
    src = spark.read.parquet(os.path.join(_SF, "lineitem.parquet"))
    src.limit(50).withColumn(
        "l_extendedprice", F.lit(None).cast("double")
    ).write.parquet(f"{d}/lineitem.parquet")
    rows = sorted(
        tuple(r) for r in QUERIES["audit_benford_digits"](spark, d).collect()
    )
    assert len(rows) == 9
    for digit, n_obs, obs_ppm, exp_ppm, chi2 in rows:
        assert n_obs == 0
        assert obs_ppm is None
        assert chi2 is None
        assert exp_ppm > 0
    shutil.rmtree(d, ignore_errors=True)
