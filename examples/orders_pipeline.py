"""Medallion example pipeline on the engine's own framework.

Mirrors the reference's transactions example (bronze ingest → silver clean
→ gold customer summary — /root/reference/examples/databricks/transactions/
bronze/nb_ingest_raw_transactions.py, silver/nb_clean_transactions.py:40-48,
silver/nb_create_customer_summary.py:26-64) re-expressed over the driver
testdata tables with declared schemas at every hop.

Pipelines are built by factories (paths injected) so tests and deployments
choose their own lake root; the reference's module-scope notebook globals
are a Databricks-ism, not part of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from jorvik_spark.pipelines import ETL, FileInput, FileOutput, etl

ORDERS_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

CUSTOMER_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_mktsegment", StringType()),
        StructField("c_acctbal", DoubleType()),
    ]
)

CLEAN_ORDERS_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_totalprice", DoubleType()),
        StructField("order_date", TimestampType()),
        StructField("order_month", IntegerType()),
        StructField("is_urgent", StringType()),
    ]
)

CUSTOMER_SUMMARY_SCHEMA = StructType(
    [
        StructField("customer_id", LongType()),
        StructField("customer_name", StringType()),
        StructField("customer_segment", StringType()),
        StructField("total_orders", LongType()),
        StructField("total_spent", DoubleType()),
        StructField("avg_order_value", DoubleType()),
        StructField("first_order_date", TimestampType()),
        StructField("last_order_date", TimestampType()),
    ]
)


def make_bronze_orders(sf_dir: str, lake: str) -> ETL:
    """Bronze: schema-verified ingest of the raw orders extract."""
    raw = FileInput(path=f"{sf_dir}/orders.parquet", schema=ORDERS_SCHEMA)
    bronze = FileOutput(
        path=f"{lake}/bronze/orders", mode="overwrite", schema=ORDERS_SCHEMA
    )

    @etl(raw, bronze)
    def ingest_orders(orders: DataFrame) -> DataFrame:
        return orders

    return ingest_orders


def make_bronze_customers(sf_dir: str, lake: str) -> ETL:
    raw = FileInput(path=f"{sf_dir}/customer.parquet", schema=CUSTOMER_SCHEMA)
    bronze = FileOutput(
        path=f"{lake}/bronze/customers", mode="overwrite", schema=CUSTOMER_SCHEMA
    )

    @etl(raw, bronze)
    def ingest_customers(customers: DataFrame) -> DataFrame:
        return customers

    return ingest_customers


def make_silver_clean_orders(lake: str) -> ETL:
    """Silver: validity filter + computed columns (reference
    nb_clean_transactions.py:40-48 shape)."""
    bronze = FileInput(path=f"{lake}/bronze/orders", schema=ORDERS_SCHEMA)
    silver = FileOutput(
        path=f"{lake}/silver/clean_orders",
        mode="overwrite",
        partition_fields="order_month",
        schema=CLEAN_ORDERS_SCHEMA,
    )

    @etl(bronze, silver)
    def clean_orders(orders: DataFrame) -> DataFrame:
        return (
            orders.filter("o_totalprice > 0")
            # session tz is UTC (ENGINE_CONFS), so day-truncation is stable
            .withColumn("order_date", F.date_trunc("day", "o_orderdate"))
            # yyyyMM int (not month-of-year, which folds all years into
            # 12 partitions), matching hive partition-value inference
            .withColumn(
                "order_month",
                (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast(
                    "int"
                ),
            )
            .withColumn(
                "is_urgent",
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "Y"
                ).otherwise("N"),
            )
            .select(
                "o_orderkey",
                "o_custkey",
                "o_totalprice",
                "order_date",
                "order_month",
                "is_urgent",
            )
        )

    return clean_orders


def make_gold_customer_summary(lake: str) -> ETL:
    """Gold: per-customer stats + value segments + left join to the
    dimension (reference nb_create_customer_summary.py:26-64 shape)."""
    clean = FileInput(path=f"{lake}/silver/clean_orders", schema=CLEAN_ORDERS_SCHEMA)
    customers = FileInput(path=f"{lake}/bronze/customers", schema=CUSTOMER_SCHEMA)
    summary = FileOutput(
        path=f"{lake}/gold/customer_summary",
        mode="overwrite",
        schema=CUSTOMER_SUMMARY_SCHEMA,
    )

    def statistics_per_customer(orders: DataFrame) -> DataFrame:
        return orders.groupBy("o_custkey").agg(
            F.count("o_orderkey").alias("total_orders"),
            F.sum("o_totalprice").alias("total_spent"),
            F.avg("o_totalprice").alias("avg_order_value"),
            F.min("order_date").alias("first_order_date"),
            F.max("order_date").alias("last_order_date"),
        )

    def segments(stats: DataFrame) -> DataFrame:
        return stats.withColumn(
            "customer_segment",
            F.when(F.col("total_spent") >= 1_000_000, "High Value")
            .when(F.col("total_spent") >= 300_000, "Medium Value")
            .otherwise("Low Value"),
        )

    @etl(inputs=[clean, customers], outputs=summary)
    def create_customer_summary(
        clean_orders: DataFrame, customers: DataFrame
    ) -> DataFrame:
        stats = statistics_per_customer(clean_orders)
        return (
            stats.join(F.broadcast(customers), stats.o_custkey == customers.c_custkey, "left")
            .transform(segments)
            .select(
                F.col("o_custkey").alias("customer_id"),
                F.col("c_name").alias("customer_name"),
                "customer_segment",
                "total_orders",
                "total_spent",
                "avg_order_value",
                "first_order_date",
                "last_order_date",
            )
        )

    return create_customer_summary


def run_pipeline(sf_dir: str, lake: str) -> None:
    """bronze → silver → gold, in dependency order."""
    make_bronze_orders(sf_dir, lake).run()
    make_bronze_customers(sf_dir, lake).run()
    make_silver_clean_orders(lake).run()
    make_gold_customer_summary(lake).run()
