"""Pipeline testing helpers (reference: /root/reference/jorvik/pipelines/testing.py).

``smoke_test_etl`` is the reference's signature trick: run the transform on
*empty* DataFrames built from the declared input schemas and assert the
output schemas — catches schema drift without reading any data (reference
testing.py:22-32).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.testing import assertSchemaEqual

from jorvik_spark.pipelines.etl import ETL


def smoke_test_etl(etl: ETL) -> None:
    """Schema-only smoke test on empty inputs."""
    spark = SparkSession.getActiveSession()
    data = tuple(spark.createDataFrame([], i.schema) for i in etl.inputs)

    transformed = etl.transform_func(*data)
    if not isinstance(transformed, tuple):
        transformed = (transformed,)

    for df, out in zip(transformed, etl.outputs):
        assertSchemaEqual(df.schema, out.schema)
