"""Silver: validity filter + derived columns over bronze orders.

Reference: silver/nb_clean_transactions.py:40-48 — drop rows failing
business validity (there: negative quantity/price; here: non-positive
total price), derive the analysis columns, and project to the declared
silver schema. Partitioned by month: the medallion convention that lets
downstream month-scoped reads prune at the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jorvik_spark.pipelines import ETL, FileInput, FileOutput, etl

from examples.medallion import schemas


def build(lake: str) -> ETL:
    bronze = FileInput(
        path=f"{lake}/{schemas.raw_orders.table}",
        format=schemas.FORMAT,
        schema=schemas.raw_orders.schema,
    )
    silver = FileOutput(
        path=f"{lake}/{schemas.clean_orders.table}",
        format=schemas.FORMAT,
        mode="overwrite",
        partition_fields="order_month",
        schema=schemas.clean_orders.schema,
    )

    @etl(inputs=bronze, outputs=silver)
    def clean_orders(orders: DataFrame) -> DataFrame:
        return (
            orders.filter("o_totalprice > 0")
            # session tz is UTC (ENGINE_CONFS): day truncation is stable
            .withColumn("order_date", F.date_trunc("day", "o_orderdate"))
            # yyyyMM, not month-of-year: a bare month(1-12) key would
            # fold every year into 12 partitions and month-scoped reads
            # could never prune to one calendar month
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
            .select(*[f.name for f in schemas.clean_orders.schema.fields])
        )

    return clean_orders
