"""Pipeline testing helpers (reference: /root/reference/jorvik/pipelines/testing.py).

``smoke_test_etl`` is the reference's signature trick: run the transform on
*empty* DataFrames built from the declared input schemas and assert the
output schemas — catches schema drift without reading any data (reference
testing.py:22-32).

Deliberate deviation: the assertion uses the SAME schema-equality contract
as the runtime gate (``audit.schemas.are_equal`` — name-keyed, column-order-
and nullability-insensitive) instead of the reference's
``pyspark.testing.assertSchemaEqual`` (order-sensitive by default). The
reference's pairing red-flags pipelines whose transform returns columns in
a different order even though ``ETL.run()``'s own
``verify_output_schemas`` accepts them — a smoke test stricter than the
thing it smoke-tests is a false alarm, not a gate.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from jorvik_spark.audit import schemas
from jorvik_spark.pipelines.etl import ETL


def smoke_test_etl(etl: ETL) -> None:
    """Schema-only smoke test on empty inputs."""
    spark = SparkSession.getActiveSession()
    data = tuple(spark.createDataFrame([], i.schema) for i in etl.inputs)

    transformed = etl.transform_func(*data)
    if not isinstance(transformed, tuple):
        transformed = (transformed,)

    for df, out in zip(transformed, etl.outputs):
        if not schemas.are_equal(df.schema, out.schema):
            raise AssertionError(
                "Transform output schema does not match the declared "
                "output schema:\n" + schemas.diff(out.schema, df.schema)
            )
