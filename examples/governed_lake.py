"""Governed-warehouse pipeline: dirty ingest → audit gate → SCD2 dim →
enriched gold report, on the engine's own ETL framework.

The data-governance composition a warehouse team deploys (the
complement of the curation story in ``documents_pipeline``): bronze
lands a dirty CSV drop under the PERMISSIVE malformed-record contract
(bad rows quarantined, never dropped silently or fatally); an AUDIT
GATE refuses to publish unless the expectation suite (PK uniqueness,
FK orphans, ranges, not-null) comes back violation-free on the clean
slice; the customer dimension is maintained as SCD2 (close-and-insert
versioning via the composite-merge-key trick, `merge_scd2_apply`
semantics); gold enriches orders against the CURRENT dimension slice
and publishes per-segment revenue.

Every hop is an ``@etl`` pipeline with declared, verified schemas
(reference framework, etl.py:145-217). All transforms are built-in
expressions; the audit gate is the only action taken on the driver, and
it reads back a five-row report — auditing 100 TB costs one pass and
returns kilobytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from jorvik_spark.pipelines import ETL, FileInput, FileOutput, etl

BRONZE_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_totalprice", DoubleType()),
        StructField("_corrupt_record", StringType()),
    ]
)

DIM_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_mktsegment", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("valid_to", TimestampType()),
        StructField("is_current", BooleanType()),
    ]
)

GOLD_SCHEMA = StructType(
    [
        StructField("segment", StringType()),
        StructField("n_orders", LongType()),
        StructField("revenue", DoubleType()),
    ]
)


class AuditGateError(RuntimeError):
    """Raised when the expectation suite finds violations — the publish
    step must not run."""


def land_dirty_csv(spark: SparkSession, sf_dir: str, lake: str) -> str:
    """Simulate the upstream drop: orders as CSV with every 10th price
    corrupted (the landing zone this pipeline is built to survive)."""
    src = f"{lake}/landing/orders_csv"
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.concat_ws(
                ",",
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.when(
                    F.col("o_orderkey") % 10 == 0, F.lit("not-a-price")
                ).otherwise(F.col("o_totalprice").cast("string")),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(src)
    )
    return src


def ingest_bronze(spark: SparkSession, landing: str, lake: str) -> None:
    """Bronze: PERMISSIVE CSV ingest — corrupt rows kept + flagged.

    Uses the raw DataFrameReader rather than ``FileInput``: PERMISSIVE
    corrupt-record capture requires a DECLARED read schema (the
    ``_corrupt_record`` column must be in it), and the reference's A1
    read surface — which FileInput faithfully wraps — carries options
    but no schema-on-read. The write side stays on the framework via
    the FileOutput in the silver/gold stages.
    """
    (
        spark.read.schema(BRONZE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(landing)
        .write.mode("overwrite")
        .parquet(f"{lake}/bronze/orders")
    )


def audit_gate(spark: SparkSession, sf_dir: str, lake: str) -> DataFrame:
    """The expectation suite over the CLEAN bronze slice; raises
    AuditGateError on any violation. Same checks as
    ``audit_referential_integrity``, run as a publish gate."""
    orders = spark.read.schema(BRONZE_SCHEMA).parquet(
        f"{lake}/bronze/orders"
    ).filter(F.col("_corrupt_record").isNull())
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    report = (
        one(
            "pk_orders_unique",
            orders.agg(
                (F.count("o_orderkey") - F.countDistinct("o_orderkey")).alias(
                    "n"
                )
            ),
        )
        .unionByName(
            one(
                "fk_orders_customer",
                orders.join(
                    customer,
                    orders.o_custkey == customer.c_custkey,
                    "left_anti",
                ).agg(F.count(F.lit(1)).alias("n")),
            )
        )
        .unionByName(
            one(
                "range_price_positive",
                orders.filter(F.col("o_totalprice") <= 0).agg(
                    F.count(F.lit(1)).alias("n")
                ),
            )
        )
    )
    rows = report.collect()
    bad = {r.check_name: r.n_violations for r in rows if r.n_violations}
    if bad:
        raise AuditGateError(f"audit gate failed: {bad}")
    return report


def build_scd2_dim(spark: SparkSession, sf_dir: str, lake: str) -> None:
    """Customer dimension as SCD2: initial versions at 1990-01-01, one
    deterministic CDC batch applied (every 4th key re-segmented at
    1995-06-01) — close-and-insert in one write, merge_scd2_apply
    semantics inlined."""
    eff = F.lit("1995-06-01").cast("timestamp")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    dim0 = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changed = dim0.filter(F.col("c_custkey") % 4 == 0)
    unchanged = dim0.filter(F.col("c_custkey") % 4 != 0)
    closed = changed.select(
        "c_custkey", "c_mktsegment", "valid_from",
        eff.alias("valid_to"), F.lit(False).alias("is_current"),
    )
    reopened = changed.select(
        "c_custkey", F.lit("UPDATED").alias("c_mktsegment"),
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    (
        unchanged.unionByName(closed)
        .unionByName(reopened)
        .write.mode("overwrite")
        .parquet(f"{lake}/silver/dim_customer")
    )


def make_gold_revenue(lake: str) -> ETL:
    """Gold: clean orders enriched against the CURRENT dimension slice
    (the SCD2 read pattern), per-segment revenue."""
    bronze = FileInput(path=f"{lake}/bronze/orders", schema=BRONZE_SCHEMA)
    dim = FileInput(path=f"{lake}/silver/dim_customer", schema=DIM_SCHEMA)
    gold = FileOutput(
        path=f"{lake}/gold/revenue_by_segment",
        mode="overwrite",
        schema=GOLD_SCHEMA,
    )

    @etl([bronze, dim], gold)
    def revenue_by_segment(orders: DataFrame, dim_c: DataFrame) -> DataFrame:
        clean = orders.filter(F.col("_corrupt_record").isNull())
        current = dim_c.filter("is_current").select(
            "c_custkey", F.col("c_mktsegment").alias("segment")
        )
        return (
            clean.join(
                F.broadcast(current),
                clean.o_custkey == current.c_custkey,
            )
            .groupBy("segment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("o_totalprice").alias("revenue"),
            )
        )

    return revenue_by_segment


def run_pipeline(spark: SparkSession, sf_dir: str, lake: str) -> DataFrame:
    """landing → bronze → audit gate → SCD2 dim → gold; returns the
    audit report so callers can archive the evidence."""
    landing = land_dirty_csv(spark, sf_dir, lake)
    ingest_bronze(spark, landing, lake)
    report = audit_gate(spark, sf_dir, lake)
    build_scd2_dim(spark, sf_dir, lake)
    make_gold_revenue(lake).run()
    return report
