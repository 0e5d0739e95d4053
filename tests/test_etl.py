"""ETL framework tests, ported from /root/reference/test/pipelines/test_etl.py
and test/fixtures/pipelines.py (simple_join + merge pipelines), on parquet.
Also covers smoke_test_etl (reference test/pipelines/test_testing.py) and
the Q1 fix (MergeOutput passes its options to merge by keyword).
"""

import pytest
from pyspark.sql import DataFrame
from pyspark.testing import assertDataFrameEqual
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from jorvik_spark import storage
from jorvik_spark.pipelines import ETL, FileInput, FileOutput, MergeOutput, etl
from jorvik_spark.pipelines.testing import smoke_test_etl

FIRST_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("value", StringType(), True),
    ]
)
SECOND_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("another_name", StringType(), True),
        StructField("another_value", StringType(), True),
    ]
)
OUT_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("value", StringType(), True),
        StructField("another_name", StringType(), True),
        StructField("another_value", StringType(), True),
    ]
)


def _write_inputs(spark, base):
    st = storage.configure()
    first = spark.createDataFrame(
        [(1, "Alice", "1.0"), (2, "Bob", "2.0"), (3, "Cathy", "3.0")],
        FIRST_SCHEMA,
    )
    second = spark.createDataFrame(
        [(1, "A. Alice", "1.0"), (2, "A. Bob", "2.0"), (3, "A. Cathy", "3.0")],
        SECOND_SCHEMA,
    )
    st.write(first, f"{base}/first", format="parquet", mode="overwrite")
    st.write(second, f"{base}/second", format="parquet", mode="overwrite")
    return first, second


def _simple_join(base, in_schemas=(FIRST_SCHEMA, SECOND_SCHEMA),
                 out_schema=OUT_SCHEMA, validate=True) -> ETL:
    first = FileInput(path=f"{base}/first", format="parquet", schema=in_schemas[0])
    second = FileInput(path=f"{base}/second", format="parquet", schema=in_schemas[1])
    out = FileOutput(
        path=f"{base}/out", format="parquet", mode="overwrite", schema=out_schema
    )

    @etl(inputs=[first, second], outputs=[out], validate_schemas=validate)
    def transform(first: DataFrame, second: DataFrame):
        return first.join(second, on=["id"], how="inner")

    return transform


def test_etl_runs_success(spark, tmp_path):
    base = str(tmp_path)
    first, second = _write_inputs(spark, base)
    _simple_join(base).run()
    st = storage.configure()
    result = st.read(f"{base}/out", format="parquet")
    assertDataFrameEqual(result, first.join(second, on=["id"], how="inner"))


def test_etl_with_incorrect_schemas_fail(spark, tmp_path):
    base = str(tmp_path)
    _write_inputs(spark, base)
    wrong = StructType(
        [StructField("id", StringType(), True)]  # actual id is long
    )
    with pytest.raises(RuntimeError, match="Input schema"):
        _simple_join(base, in_schemas=(wrong, SECOND_SCHEMA)).run()


def test_etl_with_incorrect_output_schema_fails(spark, tmp_path):
    base = str(tmp_path)
    _write_inputs(spark, base)
    wrong_out = StructType([StructField("id", LongType(), True)])
    with pytest.raises(RuntimeError, match="Output schema"):
        _simple_join(base, out_schema=wrong_out).run()


def test_etl_with_incorrect_schemas_can_succeed(spark, tmp_path):
    base = str(tmp_path)
    _write_inputs(spark, base)
    wrong_out = StructType([StructField("id", LongType(), True)])
    _simple_join(base, out_schema=wrong_out, validate=False).run()


def test_etl_without_schema_warns():
    with pytest.warns(UserWarning, match="Missing schema"):
        FileInput(path="/nowhere", format="parquet")


def test_etl_with_merge(spark, tmp_path):
    """Merge pipeline (reference test_etl.py:110-134), exercising the Q1
    fix: update/insert conditions reach merge() as keywords."""
    base = str(tmp_path)
    st = storage.configure()
    df = spark.createDataFrame(
        [(1, "existing"), (2, "existing"), (3, "existing")], "id long, value string"
    )
    st.write(df, f"{base}/in_df", format="parquet", mode="overwrite")
    st.write(df, f"{base}/out", format="parquet", mode="overwrite")

    kv_schema = StructType(
        [
            StructField("id", LongType(), True),
            StructField("value", StringType(), True),
        ]
    )
    inp = FileInput(path=f"{base}/in_df", format="parquet", schema=kv_schema)
    out = MergeOutput(
        path=f"{base}/out",
        merge_condition="full.id == incremental.id",
        update_condition="incremental.id == 3",
        insert_condition="incremental.id == 4",
        schema=kv_schema,
    )

    @etl(inputs=inp, outputs=out)
    def transform(df: DataFrame):
        from pyspark.sql import functions as F

        return df.withColumn(
            "value", F.when(F.col("id") >= 3, "updated").otherwise(F.col("value"))
        ).unionByName(
            spark.createDataFrame([(4, "added")], kv_schema)
        )

    transform.run()
    expected = spark.createDataFrame(
        [(1, "existing"), (2, "existing"), (3, "updated"), (4, "added")],
        kv_schema,
    )
    assertDataFrameEqual(st.read(f"{base}/out", format="parquet"), expected)


def test_smoke_test_etl(spark, tmp_path):
    smoke_test_etl(_simple_join(str(tmp_path)))


def test_smoke_test_etl_catches_drift(spark, tmp_path):
    wrong_out = StructType([StructField("id", LongType(), True)])
    with pytest.raises(Exception):
        smoke_test_etl(_simple_join(str(tmp_path), out_schema=wrong_out))


def test_run_returns_per_output_load_results(spark, tmp_path):
    """ETL.run surfaces each output's load() result so a streaming
    output's StreamingQuery handle is not lost (batch outputs yield
    None). Deviation from the reference documented in ETL.load."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame([(1,)], "id long").write.parquet(src)

    schema = StructType([StructField("id", LongType())])

    @etl(
        FileInput(path=src, schema=schema),
        FileOutput(path=out, schema=schema, mode="overwrite"),
    )
    def passthrough(df):
        return df

    results = passthrough.run()
    assert results == [None]  # batch FileOutput.load returns nothing
    assert spark.read.parquet(out).count() == 1
