"""Regression tests for the local oracle-comparison harness itself."""

import pandas as pd
import pytest

from tests.oracle_utils import _assert_no_int_float_split, compare, duck_con
from jorvik_spark.tables import default_sf_dir


def test_int_vs_float_split_fails():
    got = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    want = pd.DataFrame({"x": pd.Series([1.0, 2.0], dtype="float64")})
    with pytest.raises(AssertionError, match="int-vs-float"):
        _assert_no_int_float_split(got, want, "t")
    # and symmetrically
    with pytest.raises(AssertionError, match="int-vs-float"):
        _assert_no_int_float_split(want, got, "t")


def test_same_numeric_kind_passes():
    a = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"x": pd.Series([1, 2], dtype="int32")})
    _assert_no_int_float_split(a, b, "t")
    f = pd.DataFrame({"x": pd.Series([1.5], dtype="float64")})
    g = pd.DataFrame({"x": pd.Series([1.5], dtype="float32")})
    _assert_no_int_float_split(f, g, "t")


def test_compare_rejects_equal_valued_dtype_split(spark):
    # Values are equal (5 == 5.0) so the old compare passed; the driver's
    # value hash would not. compare() must now fail.
    df = spark.range(1).selectExpr("CAST(5 AS BIGINT) AS x")
    con = duck_con(default_sf_dir())
    with pytest.raises(AssertionError, match="int-vs-float"):
        compare(df, con, "SELECT 5.0 AS x", "dtype_split")
    # identical dtypes still pass
    compare(df, con, "SELECT CAST(5 AS BIGINT) AS x", "dtype_same")
