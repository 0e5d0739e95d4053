"""Local re-implementation of the driver's DuckDB-oracle comparison.

Runs an engine query and its oracle SQL side by side and asserts
row-count + column-name + value equality (order-insensitive, column-name
sorted — mirroring CORRECTNESS_r{N}.json's method) so mismatches surface
in pytest before the driver runs.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from jorvik_spark.tables import default_sf_dir, TABLES

SF_DIR = default_sf_dir()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            # Normalize ns→µs exactly like jorvik_spark.tables.load_table
            # (truncating cast), so oracle comparisons see µs on both sides.
            con.execute(
                "CREATE VIEW events AS SELECT event_id, "
                "CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props "
                f"FROM read_parquet('{sf_dir}/events.parquet')"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object and s.map(
            lambda v: v is None or hasattr(v, "toordinal"), na_action="ignore"
        ).all() and s.notna().any():
            s = pd.to_datetime(s)  # datetime.date objects → datetime64
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64").where(s.notna())
        elif s.dtype == object:
            df[c] = s.astype(str).where(s.notna())
    key = df.columns.tolist()
    return df.sort_values(by=key, na_position="first").reset_index(drop=True)


def _values_close(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _assert_no_int_float_split(got: pd.DataFrame, want: pd.DataFrame, name: str):
    """An integer column on one engine vs float on the other hashes
    differently in the driver even when every value compares equal
    (5 == 5.0) — the blind spot that shipped the r3 ntile dtype bug."""
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if {gk, wk} <= {"i", "u", "f"}:
            assert (gk in "iu") == (wk in "iu"), (
                f"{name}: column {c} int-vs-float dtype split "
                f"{got[c].dtype} vs {want[c].dtype}"
            )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    _assert_no_int_float_split(got, want, name)
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        bad = [
            (i, g, w) for i, (g, w) in enumerate(zip(gv, wv)) if not _values_close(g, w)
        ]
        assert not bad, f"{name}: column {c} first mismatches {bad[:5]}"
    return len(got)
