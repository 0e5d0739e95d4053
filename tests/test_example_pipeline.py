"""End-to-end run of the medallion example pipeline (examples/orders_pipeline)
on sf0.001 — the "reference user switches engines" integration test, plus
the schema-only smoke test the reference ships for its own example
(/root/reference/examples/databricks/transactions/tests)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from examples import orders_pipeline as pipe
from jorvik_spark.pipelines.testing import smoke_test_etl
from jorvik_spark.tables import default_sf_dir

SF_DIR = default_sf_dir()


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake"))
    pipe.run_pipeline(SF_DIR, lake)
    return lake


def test_smoke_all_stages(spark, tmp_path):
    lake = str(tmp_path)
    smoke_test_etl(pipe.make_bronze_orders(SF_DIR, lake))
    smoke_test_etl(pipe.make_bronze_customers(SF_DIR, lake))
    smoke_test_etl(pipe.make_silver_clean_orders(lake))
    smoke_test_etl(pipe.make_gold_customer_summary(lake))


def test_silver_partitioned_and_clean(spark, lake):
    silver = spark.read.parquet(f"{lake}/silver/clean_orders")
    raw = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert silver.count() == raw.filter("o_totalprice > 0").count()
    assert set(silver.columns) == {
        "o_orderkey", "o_custkey", "o_totalprice",
        "order_date", "order_month", "is_urgent",
    }
    # partitionBy(order_month) must produce hive-style directories.
    import os

    assert any(
        d.startswith("order_month=")
        for d in os.listdir(f"{lake}/silver/clean_orders")
    )


def test_gold_summary_matches_direct_computation(spark, lake):
    gold = spark.read.parquet(f"{lake}/gold/customer_summary")
    raw = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        "o_totalprice > 0"
    )
    want = raw.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("n"),
        F.sum("o_totalprice").alias("spent"),
    )
    got_n = {r["customer_id"]: r["total_orders"] for r in gold.collect()}
    for r in want.collect():
        assert got_n[r["o_custkey"]] == r["n"]
    # segment rule holds on every row
    bad = gold.filter(
        (
            (F.col("total_spent") >= 1_000_000)
            & (F.col("customer_segment") != "High Value")
        )
        | (
            (F.col("total_spent") < 300_000)
            & (F.col("customer_segment") != "Low Value")
        )
    ).count()
    assert bad == 0
    # left join keeps every ordering customer and names are joined in
    assert gold.filter(F.col("customer_name").isNull()).count() == 0
