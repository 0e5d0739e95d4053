"""Golden tests for BasicStorage, ported from the reference contract suite
(/root/reference/test/storage/test_basic.py:27-249), adapted to the
delta-less container: the format matrix drops 'delta' and MERGE runs the
native parquet reconstruction path.
"""

import pytest
from pyspark.testing import assertDataFrameEqual

from jorvik_spark.storage.basic import BasicStorage


@pytest.fixture
def data(spark):
    return spark.createDataFrame(
        [(1, "Alice", 1.0), (2, "Bob", 2.0), (3, "Cathy", 3.0)],
        ["id", "name", "value"],
    )


@pytest.fixture
def st():
    return BasicStorage()


FORMATS = ["parquet", "json", "csv", "orc"]


@pytest.mark.parametrize("format", FORMATS)
def test_read_and_write(data, st, format, tmp_path):
    target = str(tmp_path / "t")
    st.write(data, target, format, "overwrite")
    result = st.read(target, format)
    if format == "csv":  # inferSchema reads small ints as int
        result = result.withColumn("id", result["id"].cast("long"))
    assertDataFrameEqual(data, result)


@pytest.mark.parametrize("format", ["parquet", "json", "orc"])
def test_read_and_write_streams(data, st, format, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    cp = str(tmp_path / "cp")
    st.write(data, src, format, "overwrite")
    stream = st.readStream(src, format)
    assert stream.isStreaming
    query = st.writeStream(stream, dst, format, checkpoint=cp)
    query.processAllAvailable()
    query.stop()
    result = st.read(dst, format)
    assertDataFrameEqual(data, result)


def test_read_stream_uses_declared_schema(data, st, tmp_path):
    """Q3 fix: a declared schema skips the batch-inference read."""
    src = str(tmp_path / "src")
    st.write(data, src, "parquet", "overwrite")
    stream = st.readStream(src, "parquet", schema=data.schema)
    assert stream.schema == data.schema


def test_unsupported_format(data, st, tmp_path):
    with pytest.raises(ValueError, match="Unsupported format"):
        st.read(str(tmp_path), "avro")
    with pytest.raises(ValueError, match="Unsupported format"):
        st.write(data, str(tmp_path), "xml", "overwrite")


def test_mixed_formats(data, st, tmp_path):
    target = str(tmp_path / "t")
    st.write(data, target, "csv", "overwrite")
    with pytest.raises(Exception):
        st.read(target, "parquet").collect()


def test_exists_empty_folder(spark, st, tmp_path):
    """Quirk Q7 (kept): directory existence counts, even empty."""
    empty = tmp_path / "empty"
    empty.mkdir()
    assert st.exists(str(empty))
    assert not st.exists(str(tmp_path / "never_created"))


@pytest.mark.parametrize("format", FORMATS)
def test_exists(data, st, format, tmp_path):
    target = str(tmp_path / "t")
    st.write(data, target, format, "overwrite")
    assert st.exists(target)


def test_write_observers_notified(data, st, tmp_path):
    seen = []

    class Obs:
        def update(self, df, output_path):
            seen.append(output_path)

    st.register_output_observer(Obs())
    target = str(tmp_path / "t")
    st.write(data, target, "parquet", "overwrite")
    assert seen == [target]


# -- MERGE golden tests (reference test_basic.py:112-249) ------------------


def kv(spark, rows):
    return spark.createDataFrame(rows, "id long, value string")


def test_merge(spark, st, tmp_path):
    """Conditional insert + update + keep (reference test_basic.py:112-146)."""
    target = str(tmp_path / "t")
    st.write(
        kv(spark, [(1, "existing"), (2, "existing"), (3, "existing")]),
        target, "parquet", "overwrite",
    )
    incremental = kv(
        spark, [(2, "updated"), (3, "updated"), (4, "added"), (5, "added")]
    )
    st.merge(
        incremental, target,
        merge_condition="full.id == incremental.id",
        insert_condition="incremental.id != 4",
        update_condition="incremental.id != 2",
    )
    expected = kv(
        spark, [(1, "existing"), (2, "existing"), (3, "updated"), (5, "added")]
    )
    assertDataFrameEqual(st.read(target, "parquet"), expected)


def test_merge_cdc_delete(spark, st, tmp_path):
    """delete_condition (engine extension): a CDC batch with a tombstone
    column deletes its matched target rows, updates the others, inserts
    unseen keys — and the insert condition keeps tombstones for unseen
    keys OUT of the table."""
    target = str(tmp_path / "t")
    st.write(
        kv(spark, [(1, "a"), (2, "b"), (3, "c")]), target, "parquet", "overwrite"
    )
    cdc = spark.createDataFrame(
        [
            (2, "b2", "U"),   # matched update
            (3, None, "D"),   # matched delete
            (4, "d", "I"),    # unmatched insert
            (5, None, "D"),   # unmatched tombstone: must NOT insert
        ],
        "id long, value string, op string",
    )
    st.merge(
        cdc.select("id", "value", "op"),
        target,
        merge_condition="full.id == incremental.id",
        delete_condition="incremental.op = 'D'",
        insert_condition="incremental.op != 'D'",
        merge_schemas=True,  # target gains the op column (null for keeps)
    )
    got = {
        r.id: (r.value, r.op)
        for r in st.read(target, "parquet").collect()
    }
    assert got == {1: ("a", None), 2: ("b2", "U"), 4: ("d", "I")}


def test_merge_delete_takes_precedence_over_update(spark, st, tmp_path):
    """A matched row satisfying BOTH delete and update conditions is
    deleted — same clause order as Delta's whenMatchedDelete-first."""
    target = str(tmp_path / "t")
    st.write(kv(spark, [(1, "a"), (2, "b")]), target, "parquet", "overwrite")
    st.merge(
        kv(spark, [(1, "x"), (2, "y")]),
        target,
        merge_condition="full.id == incremental.id",
        delete_condition="incremental.id = 1",
        update_condition=True,
        insert_condition=False,
    )
    got = {r.id: r.value for r in st.read(target, "parquet").collect()}
    assert got == {2: "y"}


def test_merge_delete_only_is_a_valid_operation(spark, st, tmp_path):
    """update=False + insert=False is no longer an error when a delete
    condition gives the merge an effect (delete-only anti-merge)."""
    target = str(tmp_path / "t")
    st.write(kv(spark, [(1, "a"), (2, "b"), (3, "c")]), target, "parquet", "overwrite")
    st.merge(
        kv(spark, [(2, "zz"), (9, "zz")]),
        target,
        merge_condition="full.id == incremental.id",
        update_condition=False,
        insert_condition=False,
        delete_condition=True,
    )
    got = sorted(r.id for r in st.read(target, "parquet").collect())
    assert got == [1, 3]
    # ...but with delete disabled too, the all-no-op error stands
    with pytest.raises(ValueError, match="no effect"):
        st.merge(
            kv(spark, [(1, "x")]), target,
            merge_condition="full.id == incremental.id",
            update_condition=False, insert_condition=False,
        )


def test_merge_duplicate_delete_matches_raise(spark, st, tmp_path):
    """Two source rows deleting the same target row is the same
    ambiguous-match contract violation as two updates."""
    target = str(tmp_path / "t")
    st.write(kv(spark, [(1, "a")]), target, "parquet", "overwrite")
    dup = spark.createDataFrame(
        [(1, "x", "D"), (1, "y", "D")], "id long, value string, op string"
    )
    with pytest.raises(ValueError, match="Multiple source rows"):
        st.merge(
            dup, target,
            merge_condition="full.id == incremental.id",
            delete_condition="incremental.op = 'D'",
            merge_schemas=True,
        )


def test_merge_multi_match_failure_leaves_target_intact(spark, st, tmp_path):
    """r18: the multi-match guard is folded into the single rewrite
    action (no separate count pass, no persist), so the contract raise
    now surfaces from inside the write — which must happen BEFORE any
    rename: the target stays readable and unchanged, and a subsequent
    clean merge on the same path succeeds (the stranded __tmp__ dir is
    overwritten, not tripped over)."""
    target = str(tmp_path / "t")
    st.write(kv(spark, [(1, "a"), (2, "b")]), target, "parquet", "overwrite")
    dup = kv(spark, [(1, "x"), (1, "y")])
    with pytest.raises(ValueError, match="Multiple source rows"):
        st.merge(dup, target, merge_condition="full.id == incremental.id")
    # target untouched by the failed merge
    assert sorted((r.id, r.value) for r in st.read(target, "parquet").collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # a clean retry converges normally
    st.merge(
        kv(spark, [(1, "x"), (3, "c")]),
        target,
        merge_condition="full.id == incremental.id",
    )
    assert sorted((r.id, r.value) for r in st.read(target, "parquet").collect()) == [
        (1, "x"),
        (2, "b"),
        (3, "c"),
    ]


def test_merge_creates_missing_target(spark, st, tmp_path):
    target = str(tmp_path / "t")
    incremental = kv(spark, [(1, "a"), (2, "b")])
    st.merge(incremental, target, merge_condition="full.id == incremental.id")
    assertDataFrameEqual(st.read(target, "parquet"), incremental)


def test_merge_with_schema_changes(spark, st, tmp_path):
    """Schema drift errors unless merge_schemas=True, then null-fills both
    directions (reference test_basic.py:149-186)."""
    target = str(tmp_path / "t")
    st.write(
        spark.createDataFrame(
            [(1, "existing", 1), (2, "existing", 1), (3, "existing", 1)],
            "id long, value string, old long",
        ),
        target, "parquet", "overwrite",
    )
    incremental = spark.createDataFrame(
        [(3, "updated", 2), (4, "added", 2)], "id long, value string, new long"
    )
    with pytest.raises(ValueError):
        st.merge(incremental, target, merge_condition="full.id == incremental.id")

    st.merge(
        incremental, target,
        merge_condition="full.id == incremental.id",
        merge_schemas=True,
    )
    expected = spark.createDataFrame(
        [
            (1, "existing", 1, None),
            (2, "existing", 1, None),
            (3, "updated", None, 2),
            (4, "added", None, 2),
        ],
        "id long, value string, old long, new long",
    )
    result = st.read(target, "parquet").select("id", "value", "old", "new")
    assertDataFrameEqual(result, expected)


def test_merge_ignore_updates(spark, st, tmp_path):
    target = str(tmp_path / "t")
    st.write(
        kv(spark, [(1, "existing"), (2, "existing"), (3, "existing")]),
        target, "parquet", "overwrite",
    )
    st.merge(
        kv(spark, [(3, "updated"), (4, "added")]), target,
        merge_condition="full.id == incremental.id",
        update_condition=False,
    )
    expected = kv(
        spark, [(1, "existing"), (2, "existing"), (3, "existing"), (4, "added")]
    )
    assertDataFrameEqual(st.read(target, "parquet"), expected)


def test_merge_ignore_inserts(spark, st, tmp_path):
    target = str(tmp_path / "t")
    st.write(
        kv(spark, [(1, "existing"), (2, "existing"), (3, "existing")]),
        target, "parquet", "overwrite",
    )
    st.merge(
        kv(spark, [(3, "updated"), (4, "added")]), target,
        merge_condition="full.id == incremental.id",
        insert_condition=False,
    )
    expected = kv(spark, [(1, "existing"), (2, "existing"), (3, "updated")])
    assertDataFrameEqual(st.read(target, "parquet"), expected)


def test_inserts_and_updates_are_ignored(st):
    with pytest.raises(ValueError):
        st.merge(None, "", "", insert_condition=False, update_condition=False)


def test_merge_multiple_matches_raise(spark, st, tmp_path):
    """Delta MERGE contract: several source rows updating one target row."""
    target = str(tmp_path / "t")
    st.write(kv(spark, [(1, "existing")]), target, "parquet", "overwrite")
    with pytest.raises(ValueError, match="[Mm]ultiple source rows"):
        st.merge(
            kv(spark, [(1, "a"), (1, "b")]), target,
            merge_condition="full.id == incremental.id",
        )


def test_merge_update_condition_on_both_sides(spark, st, tmp_path):
    """Update condition may compare full vs incremental columns."""
    target = str(tmp_path / "t")
    st.write(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, score long"),
        target, "parquet", "overwrite",
    )
    st.merge(
        spark.createDataFrame([(1, 5), (2, 30)], "id long, score long"),
        target,
        merge_condition="full.id == incremental.id",
        update_condition="incremental.score > full.score",  # only id=2
    )
    expected = spark.createDataFrame([(1, 10), (2, 30)], "id long, score long")
    assertDataFrameEqual(st.read(target, "parquet"), expected)


def test_merge_recovers_interrupted_swap(spark, st, tmp_path):
    """A crash between _atomic_overwrite's two renames leaves the table
    at …__jorvik_merge_old__ and nothing at the real path. The next merge
    must roll the old copy forward and merge into it — not rebuild the
    table from the incremental rows alone and then delete the only full
    copy as a stale leftover."""
    import os

    target = str(tmp_path / "t")
    st.write(kv(spark, [(1, "keep"), (2, "update-me")]), target,
             "parquet", "overwrite")
    # Simulate the crash window: table moved aside, nothing at `target`.
    os.rename(target, target + "__jorvik_merge_old__")
    assert not os.path.exists(target)

    st.merge(
        kv(spark, [(2, "updated"), (3, "inserted")]), target,
        merge_condition="full.id == incremental.id",
    )
    expected = kv(spark, [(1, "keep"), (2, "updated"), (3, "inserted")])
    assertDataFrameEqual(st.read(target, "parquet"), expected)
    assert not os.path.exists(target + "__jorvik_merge_old__")
