"""Gold: per-customer summary, UPSERTED into the serving table.

Reference: silver/nb_create_customer_summary.py:26-64 — statistics per
customer, value segments, left join to the dimension. The sink here is
the reference's ``MergeDeltaOutput`` pattern rather than an overwrite:
each scheduled run recomputes the summary from silver and MERGEs it on
``customer_id``, so concurrent readers never see a truncated table and
re-runs converge instead of churning the whole file set. Delta MERGE
when delta-spark is installed; the storage layer's relational merge on
parquet otherwise.

Scale shape: the per-customer aggregation is map-side combined on the
silver scan; the dimension join is an explicit broadcast (customers is
the small side at any realistic scale — and if it ever isn't, AQE
demotes it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jorvik_spark.pipelines import ETL, FileInput, MergeDeltaOutput, etl

from examples.medallion import schemas


def calculate_statistics_per_customer(orders: DataFrame) -> DataFrame:
    return orders.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("total_orders"),
        F.sum("o_totalprice").alias("total_spent"),
        F.avg("o_totalprice").alias("avg_order_value"),
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("last_order_date"),
    )


def create_segments(stats: DataFrame) -> DataFrame:
    return stats.withColumn(
        "customer_segment",
        F.when(F.col("total_spent") >= 1_000_000, "High Value")
        .when(F.col("total_spent") >= 300_000, "Medium Value")
        .otherwise("Low Value"),
    )


def build(lake: str) -> ETL:
    orders = FileInput(
        path=f"{lake}/{schemas.clean_orders.table}",
        format=schemas.FORMAT,
        schema=schemas.clean_orders.schema,
    )
    customers = FileInput(
        path=f"{lake}/{schemas.raw_customers.table}",
        format=schemas.FORMAT,
        schema=schemas.raw_customers.schema,
    )
    summary = MergeDeltaOutput(
        path=f"{lake}/{schemas.customer_summary.table}",
        merge_condition="full.customer_id = incremental.customer_id",
        schema=schemas.customer_summary.schema,
    )

    @etl(inputs=[orders, customers], outputs=summary)
    def create_customer_summary(
        clean_orders: DataFrame, customers: DataFrame
    ) -> DataFrame:
        stats = calculate_statistics_per_customer(clean_orders)
        return (
            stats.join(
                F.broadcast(customers),
                stats.o_custkey == customers.c_custkey,
                "left",
            )
            .transform(create_segments)
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
