"""Schema-audit tests, ported from /root/reference/test/audit/test_schemas.py
plus cases for the two reference bugs fixed here (SURVEY.md Q4/Q5):
real recursion into nested structs and nullability-insensitivity at depth.
"""

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from jorvik_spark.audit import schemas


def _person(extra_nested=None):
    nested = [StructField("city", StringType(), True)]
    if extra_nested:
        nested.append(extra_nested)
    return StructType(
        [
            StructField("name", StringType(), True),
            StructField("age", IntegerType(), True),
            StructField("address", StructType(nested), True),
        ]
    )


def test_schemas_are_equal():
    assert schemas.are_equal(_person(), _person())


def test_schemas_are_not_equal_nested():
    """Q4 fix: the nested difference must actually be detected."""
    assert not schemas.are_equal(
        _person(), _person(StructField("street", StringType(), True))
    )


def test_equal_ignores_order_and_nullability():
    s1 = StructType(
        [
            StructField("a", LongType(), True),
            StructField("b", StringType(), False),
        ]
    )
    s2 = StructType(
        [
            StructField("b", StringType(), True),
            StructField("a", LongType(), False),
        ]
    )
    assert schemas.are_equal(s1, s2)


def test_equal_ignores_nested_nullability():
    """Q5 fix: nullability below the top level must not matter."""
    s1 = StructType(
        [StructField("address",
                     StructType([StructField("city", StringType(), True)]), True)]
    )
    s2 = StructType(
        [StructField("address",
                     StructType([StructField("city", StringType(), False)]), False)]
    )
    assert schemas.are_equal(s1, s2)
    # arrays too
    a1 = StructType([StructField("xs", ArrayType(LongType(), True), True)])
    a2 = StructType([StructField("xs", ArrayType(LongType(), False), True)])
    assert schemas.are_equal(a1, a2)


def test_is_subset():
    sub = StructType(
        [
            StructField("name", StringType(), True),
            StructField("age", IntegerType(), True),
        ]
    )
    assert schemas.is_subset(sub, _person())
    assert not schemas.is_subset(_person(), sub)


def test_is_subset_type_mismatch():
    sub = StructType([StructField("age", LongType(), True)])
    assert not schemas.is_subset(sub, _person())  # long != int


def test_diff_readable():
    out = schemas.diff(
        StructType([StructField("a", LongType(), True)]),
        StructType([StructField("b", StringType(), True)]),
    )
    assert "only in first" in out and "only in second" in out
