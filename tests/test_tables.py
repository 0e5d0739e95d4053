"""load_table normalization under physical-type drift.

The lake's events.ts has already shipped as INT64 TIMESTAMP(NANOS) (rounds
1-4) and as timestamp[us] (round 5+, which Spark 4.x infers as
TIMESTAMP_NTZ unless inferTimestampNTZ is disabled). load_table must
resolve every variant to a plain TIMESTAMP so downstream consumers
(unix_micros, range windows) never see a surprise type.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from jorvik_spark.tables import load_table

_TS = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)


def _write_events(tmp_path, ts_type):
    arr = pa.array([_TS], type=ts_type)
    table = pa.table({"event_id": pa.array([1], type=pa.int64()), "ts": arr})
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("us"), pa.timestamp("ns"), pa.timestamp("us", tz="UTC")],
    ids=["us-ntz", "ns", "us-utc"],
)
def test_events_ts_always_resolves_to_timestamp(spark, tmp_path, ts_type):
    df = load_table(spark, _write_events(tmp_path, ts_type), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # value survives normalization exactly (µs precision)
    got = df.select(F.unix_micros("ts").alias("us")).collect()[0]["us"]
    want = int(_TS.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert got == want


def test_events_ts_normalizes_even_with_ntz_inference_on(spark, tmp_path):
    """Host sessions we don't build may leave inferTimestampNTZ enabled;
    the cast fallback in load_table must still deliver TIMESTAMP."""
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "true")
    try:
        df = load_table(spark, _write_events(tmp_path, pa.timestamp("us")), "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set(key, old)
