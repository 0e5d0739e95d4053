"""Declared dataset schemas, shared by producer and consumer stages.

Reference layout: bronze/schemas/raw_transactions.py etc. — one schema
definition per produced table, imported by both the notebook that writes
it and every notebook that reads it, so a drift fails schema verification
at the @etl boundary instead of corrupting downstream tables silently.

``FORMAT`` is "delta" when delta-spark is importable and "parquet"
otherwise — the storage layer keeps MERGE first-class on either, so the
pipeline's semantics don't change, only the table format.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

try:  # delta-spark is optional in this environment
    import delta  # noqa: F401

    FORMAT = "delta"
except ImportError:
    FORMAT = "parquet"


class raw_orders:
    """Bronze: the orders extract as delivered by the upstream system."""

    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    table = "bronze/raw_orders"


class raw_customers:
    """Bronze: the customer dimension extract."""

    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_mktsegment", StringType()),
            StructField("c_acctbal", DoubleType()),
        ]
    )
    table = "bronze/raw_customers"


class clean_orders:
    """Silver: validity-filtered orders with derived columns."""

    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("order_date", TimestampType()),
            StructField("order_month", IntegerType()),
            StructField("is_urgent", StringType()),
        ]
    )
    table = "silver/clean_orders"


class customer_summary:
    """Gold: one row per customer, upserted by MERGE on every run."""

    schema = StructType(
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
    table = "gold/customer_summary"
