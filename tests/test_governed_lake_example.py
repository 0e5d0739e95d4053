"""End-to-end run of the governed-warehouse example
(examples/governed_lake) on sf0.001: dirty CSV landing survives
PERMISSIVE ingest, the audit gate passes on the clean slice and FAILS
loudly when violations are seeded, SCD2 versioning holds its
invariants, and the gold revenue report matches an independent DuckDB
computation over the same semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from examples import governed_lake as pipe
from jorvik_spark.tables import default_sf_dir

SF_DIR = default_sf_dir()


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("govlake"))
    report = pipe.run_pipeline(spark, SF_DIR, lake)
    return lake, report


def test_bronze_keeps_and_flags_corrupt_rows(spark, lake):
    lake_dir, _ = lake
    bronze = spark.read.parquet(f"{lake_dir}/bronze/orders")
    n_total = bronze.count()
    n_corrupt = bronze.filter(F.col("_corrupt_record").isNotNull()).count()
    n_src = duckdb.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0"
        f" END) FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchone()
    assert n_total == n_src[0], "PERMISSIVE dropped rows"
    assert n_corrupt == n_src[1], "corrupt flagging off"
    # the corrupted field is nulled, the raw line is quarantined
    bad = bronze.filter(F.col("_corrupt_record").isNotNull()).first()
    assert bad.o_totalprice is None
    assert "not-a-price" in bad._corrupt_record


def test_audit_gate_green_and_fails_on_seeded_violation(spark, lake):
    lake_dir, report = lake
    rows = {r.check_name: r.n_violations for r in report.collect()}
    assert rows == {
        "pk_orders_unique": 0,
        "fk_orders_customer": 0,
        "range_price_positive": 0,
    }
    # seed a PK violation: duplicate the bronze table into itself
    dup_lake = lake_dir + "_dup"
    spark.read.parquet(f"{lake_dir}/bronze/orders").unionAll(
        spark.read.parquet(f"{lake_dir}/bronze/orders")
    ).write.mode("overwrite").parquet(f"{dup_lake}/bronze/orders")
    with pytest.raises(pipe.AuditGateError, match="pk_orders_unique"):
        pipe.audit_gate(spark, SF_DIR, dup_lake)


def test_scd2_dim_invariants(spark, lake):
    lake_dir, _ = lake
    dim = spark.read.parquet(f"{lake_dir}/silver/dim_customer")
    # exactly one CURRENT row per key
    per_key = dim.filter("is_current").groupBy("c_custkey").count()
    assert per_key.filter("count != 1").count() == 0
    # changed keys: closed old version + open UPDATED version
    changed = dim.filter(F.col("c_custkey") % 4 == 0)
    closed = changed.filter(~F.col("is_current"))
    assert closed.count() > 0
    assert closed.filter(F.col("valid_to").isNull()).count() == 0
    assert (
        changed.filter("is_current")
        .filter(F.col("c_mktsegment") != "UPDATED")
        .count()
        == 0
    )


def test_gold_revenue_matches_duckdb(spark, lake):
    lake_dir, _ = lake
    gold = {
        r.segment: (r.n_orders, round(r.revenue, 2))
        for r in spark.read.parquet(
            f"{lake_dir}/gold/revenue_by_segment"
        ).collect()
    }
    want = {
        seg: (n, rev)
        for seg, n, rev in duckdb.sql(
            f"""
            SELECT CASE WHEN c.c_custkey % 4 = 0 THEN 'UPDATED'
                        ELSE c.c_mktsegment END AS segment,
                   COUNT(*) AS n,
                   round(SUM(o.o_totalprice), 2) AS rev
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_parquet('{SF_DIR}/customer.parquet') c
              ON c.c_custkey = o.o_custkey
            WHERE o.o_orderkey % 10 <> 0
            GROUP BY 1
            """
        ).fetchall()
    }
    assert gold == want
