"""Bronze: schema-verified ingest of the customer dimension.

Reference: bronze/nb_ingest_raw_customers.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from jorvik_spark.pipelines import ETL, FileInput, FileOutput, etl

from examples.medallion import schemas


def build(sf_dir: str, lake: str) -> ETL:
    source = FileInput(
        path=f"{sf_dir}/customer.parquet", schema=schemas.raw_customers.schema
    )
    bronze = FileOutput(
        path=f"{lake}/{schemas.raw_customers.table}",
        format=schemas.FORMAT,
        mode="overwrite",
        schema=schemas.raw_customers.schema,
    )

    @etl(inputs=source, outputs=bronze)
    def ingest_raw_customers(customers: DataFrame) -> DataFrame:
        return customers

    return ingest_raw_customers
