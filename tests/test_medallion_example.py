"""The medallion example (examples/medallion) end-to-end.

Reference test pattern: transactions/tests/* — one smoke test per
notebook (schema-only, empty inputs) plus the full pipeline on real
data. The gold stage additionally proves MERGE convergence: re-running
the pipeline must leave the summary in the same state, and a bronze
correction must flow through as an UPDATE, not a duplicate row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jorvik_spark.pipelines.testing import smoke_test_etl
from jorvik_spark.storage import configure

from jorvik_spark.tables import default_sf_dir

from examples.medallion import run_pipeline, schemas
from examples.medallion import (
    nb_clean_orders,
    nb_create_customer_summary,
    nb_ingest_raw_customers,
    nb_ingest_raw_orders,
)

SF_DIR = default_sf_dir()


@pytest.mark.parametrize(
    "build",
    [
        lambda lake: nb_ingest_raw_orders.build(SF_DIR, lake),
        lambda lake: nb_ingest_raw_customers.build(SF_DIR, lake),
        nb_clean_orders.build,
        nb_create_customer_summary.build,
    ],
    ids=["ingest_orders", "ingest_customers", "clean_orders", "summary"],
)
def test_stage_smoke(spark, tmp_path, build):
    """Per-notebook schema smoke test (reference transactions/tests/*):
    the transform applied to EMPTY inputs must already produce the
    declared output schema — schema drift fails without reading data."""
    smoke_test_etl(build(str(tmp_path)))


def test_pipeline_end_to_end_and_merge_convergence(spark, tmp_path):
    lake = str(tmp_path / "lake")
    run_pipeline(SF_DIR, lake)
    st = configure()

    gold = st.read(f"{lake}/{schemas.customer_summary.table}", schemas.FORMAT)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    want = (
        orders.filter("o_totalprice > 0")
        .groupBy("o_custkey")
        .agg(
            F.count("o_orderkey").alias("n"),
            F.sum("o_totalprice").alias("spent"),
        )
    )
    got = {r.customer_id: r for r in gold.collect()}
    for w in want.collect():
        g = got[w.o_custkey]
        assert g.total_orders == w.n
        assert g.total_spent == pytest.approx(w.spent)
        assert g.customer_segment in ("High Value", "Medium Value", "Low Value")
    assert len(got) == want.count()
    # every summarized customer that exists in the dimension got a name
    dim = {
        r.c_custkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    named = [g for g in got.values() if g.customer_id in dim]
    assert named and all(g.customer_name is not None for g in named)

    # Scheduled re-run: MERGE converges — same rows, same values.
    run_pipeline(SF_DIR, lake)
    again = {
        r.customer_id: r
        for r in st.read(
            f"{lake}/{schemas.customer_summary.table}", schemas.FORMAT
        ).collect()
    }
    assert len(again) == len(got)
    sample = next(iter(got))
    assert again[sample].total_spent == got[sample].total_spent


def test_bronze_correction_updates_gold_row(spark, tmp_path):
    """Late/corrected bronze data flows through as an UPDATE: doubling a
    customer's order prices changes their gold row in place — no
    duplicate customer_id, everyone else untouched."""
    lake = str(tmp_path / "lake")
    run_pipeline(SF_DIR, lake)
    st = configure()
    gold_path = f"{lake}/{schemas.customer_summary.table}"
    before = {r.customer_id: r for r in st.read(gold_path, schemas.FORMAT).collect()}
    victim = min(before)

    bronze_path = f"{lake}/{schemas.raw_orders.table}"
    corrected = (
        st.read(bronze_path, schemas.FORMAT)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_custkey") == victim, F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
        )
        # materialize before overwriting the path we just read (lazy
        # read + overwrite of the same files is the standard footgun)
        .localCheckpoint()
    )
    st.write(corrected, bronze_path, schemas.FORMAT, mode="overwrite")
    nb_clean_orders.build(lake).run()
    nb_create_customer_summary.build(lake).run()

    after = {r.customer_id: r for r in st.read(gold_path, schemas.FORMAT).collect()}
    assert len(after) == len(before)
    assert after[victim].total_spent == pytest.approx(
        before[victim].total_spent * 2
    )
    untouched = next(k for k in before if k != victim)
    assert after[untouched].total_spent == before[untouched].total_spent
