"""Bronze: schema-verified ingest of the raw orders extract.

Reference: bronze/nb_ingest_raw_transactions.py — there the "production
system" is a MemoryInput of dummy rows; here it is the testdata lake's
orders table, read with the DECLARED schema (not inferred) so an
upstream contract change fails this stage instead of propagating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from jorvik_spark.pipelines import ETL, FileInput, FileOutput, etl

from examples.medallion import schemas


def build(sf_dir: str, lake: str) -> ETL:
    source = FileInput(
        path=f"{sf_dir}/orders.parquet", schema=schemas.raw_orders.schema
    )
    bronze = FileOutput(
        path=f"{lake}/{schemas.raw_orders.table}",
        format=schemas.FORMAT,
        mode="overwrite",
        schema=schemas.raw_orders.schema,
    )

    @etl(inputs=source, outputs=bronze)
    def ingest_raw_orders(orders: DataFrame) -> DataFrame:
        return orders

    return ingest_raw_orders
