"""Property-based tests (hypothesis) for the pure-Python contract layers.

The golden contract suites (test_storage_basic / test_isolation /
test_schemas_audit) pin the reference's documented cases; these properties
pin the *laws* those cases are instances of, over randomized inputs:

* schema audit: reflexivity, permutation/nullability invariance, subset
  antisymmetry up to normalization;
* MERGE semantics: for random upsert batches, the engine's parquet MERGE
  equals the relational reconstruction the oracle SQL uses (update rows
  replace matches, inserts are the anti-join).

Both run against real Spark where needed, but input generation is tiny
(≤8 rows) so the suite stays fast.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from jorvik_spark.audit import schemas as audit

_LEAF_TYPES = [IntegerType(), LongType(), DoubleType(), StringType()]


@st.composite
def struct_types(draw, max_fields=5, depth=2):
    n = draw(st.integers(1, max_fields))
    names = draw(
        st.lists(
            st.text("abcdefgh", min_size=1, max_size=4),
            min_size=n, max_size=n, unique=True,
        )
    )
    fields = []
    for name in names:
        if depth > 0 and draw(st.booleans()) and draw(st.booleans()):
            dt = draw(struct_types(max_fields=2, depth=depth - 1))
        elif draw(st.booleans()):
            dt = ArrayType(draw(st.sampled_from(_LEAF_TYPES)), draw(st.booleans()))
        else:
            dt = draw(st.sampled_from(_LEAF_TYPES))
        fields.append(StructField(name, dt, draw(st.booleans())))
    return StructType(fields)


def _shuffled(schema: StructType, seed: int) -> StructType:
    fields = list(schema.fields)
    random.Random(seed).shuffle(fields)
    return StructType(fields)


def _flip_nullability(schema: StructType) -> StructType:
    return StructType(
        [StructField(f.name, f.dataType, not f.nullable) for f in schema.fields]
    )


@given(struct_types())
@settings(max_examples=50, deadline=None)
def test_schema_equality_reflexive_and_invariant(s):
    assert audit.are_equal(s, s)
    assert audit.are_equal(s, _shuffled(s, 7))
    assert audit.are_equal(s, _flip_nullability(s))
    assert audit.is_subset(s, s)
    assert audit.is_subset(s, _shuffled(s, 11))


@given(struct_types(), st.integers(0, 10_000))
@settings(max_examples=50, deadline=None)
def test_schema_subset_of_extension(s, salt):
    extended = StructType(
        list(s.fields) + [StructField(f"extra_{salt}", StringType(), True)]
    )
    assert audit.is_subset(s, extended)
    # strict extension is not equal, and not a subset the other way
    assert not audit.are_equal(s, extended)
    assert not audit.is_subset(extended, s)


@given(struct_types())
@settings(max_examples=30, deadline=None)
def test_schema_diff_empty_iff_equal(s):
    assert audit.diff(s, _shuffled(s, 3)) == "  (schemas equal)" or not audit.are_equal(
        s, _shuffled(s, 3)
    )


# ---------------------------------------------------------------------------
# MERGE law: engine merge == relational reconstruction, on random batches.
# ---------------------------------------------------------------------------

_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 100)),
    min_size=1, max_size=8,
    unique_by=lambda t: t[0],
)


@given(target=_rows, source=_rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_matches_relational_model(spark, tmp_path_factory, target, source):
    from jorvik_spark.storage import BasicStorage

    st_ = BasicStorage()
    path = str(tmp_path_factory.mktemp("merge_prop")) + "/t"
    tgt = spark.createDataFrame(target, "id int, v int")
    src = spark.createDataFrame(source, "id int, v int")
    st_.write(tgt, path, mode="overwrite")
    st_.merge(src, path, "full.id = incremental.id")

    got = {(r.id, r.v) for r in st_.read(path).collect()}
    # relational model: source wins on matched ids, unmatched target kept
    tmap = dict(target)
    tmap.update(dict(source))
    assert got == set(tmap.items())
