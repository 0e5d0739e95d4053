"""End-to-end run of the LLM-curation example pipeline
(examples/documents_pipeline) on sf0.001: schema smoke tests per stage,
then a full bronze → silver → gold run checked against an independent
DuckDB computation of the curation semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from examples import documents_pipeline as pipe
from jorvik_spark.pipelines.testing import smoke_test_etl
from jorvik_spark.tables import default_sf_dir

SF_DIR = default_sf_dir()


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("doclake"))
    pipe.run_pipeline(SF_DIR, lake)
    return lake


def test_smoke_all_stages(spark, tmp_path):
    lake = str(tmp_path)
    smoke_test_etl(pipe.make_bronze_documents(SF_DIR, lake))
    smoke_test_etl(pipe.make_silver_curated(lake))
    smoke_test_etl(pipe.make_gold_corpus_stats(lake))


def test_silver_curated_semantics(spark, lake):
    """Dedup kept exactly one row per distinct text, the quality gate
    held, and lang partitioning survived the round-trip."""
    silver = spark.read.parquet(f"{lake}/silver/curated")
    rows = silver.collect()
    texts = [r.text for r in rows]
    assert len(texts) == len(set(texts)), "exact dedup left duplicate text"
    assert all(r.n_tokens >= pipe.MIN_TOKENS for r in rows)
    assert all(
        r.stopword_ratio >= pipe.MIN_STOPWORD_RATIO
        for r in rows
        if r.lang == "en"
    )
    # partitioned by lang: the column is present and non-null after read-back
    assert silver.filter(F.col("lang").isNull()).count() == 0


def test_gold_matches_duckdb_rollup(spark, lake):
    """Gold per-language stats equal an independent DuckDB rollup of the
    silver table (sums of bigints + avg — engine-agnostic)."""
    gold = {
        r.lang: (r.n_docs, r.total_tokens, r.total_bpe_tokens)
        for r in spark.read.parquet(f"{lake}/gold/corpus_stats").collect()
    }
    con = duckdb.connect()
    want = {
        lang: (n, t, b)
        for lang, n, t, b in con.execute(
            "SELECT lang, COUNT(*), SUM(n_tokens), SUM(n_bpe_tokens) "
            f"FROM read_parquet('{lake}/silver/curated/*/*.parquet', "
            "hive_partitioning=true) GROUP BY lang"
        ).fetchall()
    }
    assert gold == want
