"""Lineage tests ported from the reference golden suite:
/root/reference/test/fixtures/data_lineage.py:23-90 (hardcoded Databricks
plan), test_execution_plan.py:8-101, test_node_handler.py:7-35, and the
end-to-end write-log test (test_write_log.py:15-44, on parquet here).
"""

import pytest
from pyspark.sql import functions as F

from jorvik_spark import storage
from jorvik_spark.data_lineage import execution_plan, node_handler
from jorvik_spark.data_lineage.observer import LINEAGE_SCHEMA, DataLineageLogger
from jorvik_spark.tables import default_sf_dir

# Golden fixture: Databricks-formatted explain of a Delta scan left-joined
# with an in-memory DataFrame (reference fixtures/data_lineage.py:23-90).
EXPLAIN_RESULT = """== Physical Plan ==
AdaptiveSparkPlan (12)
+- == Initial Plan ==
   Project (11)
   +- SortMergeJoin LeftOuter (10)
      :- Sort (5)
      :  +- Exchange (4)
      :     +- Project (3)
      :        +- Filter (2)
      :           +- Scan parquet  (1)
      +- Sort (9)
         +- Exchange (8)
            +- Filter (7)
               +- Scan ExistingRDD (6)


(1) Scan parquet
Output [3]: [SalesOrderNumber#16, SalesTerritoryKey#21, Sales#24]
Batched: true
Location: PreparedDeltaFileIndex [dbfs:/mnt/bronze/adventure_works/sales/data]
ReadSchema: struct<SalesOrderNumber:string,SalesTerritoryKey:int,Sales:string>

(2) Filter
Input [3]: [SalesOrderNumber#16, SalesTerritoryKey#21, Sales#24]
Condition : isnotnull(SalesTerritoryKey#21)

(3) Project
Output [3]: [SalesOrderNumber#16, SalesTerritoryKey#21, Sales#24]
Input [3]: [SalesOrderNumber#16, SalesTerritoryKey#21, Sales#24]

(4) Exchange
Input [3]: [SalesOrderNumber#16, SalesTerritoryKey#21, Sales#24]
Arguments: hashpartitioning(cast(SalesTerritoryKey#21 as bigint), 200), ENSURE_REQUIREMENTS, [plan_id=236]

(5) Sort
Input [3]: [SalesOrderNumber#16, SalesTerritoryKey#21, Sales#24]
Arguments: [cast(SalesTerritoryKey#21 as bigint) ASC NULLS FIRST], false, 0

(6) Scan ExistingRDD
Output [2]: [SalesTerritoryKey#36L, region_name#37]
Arguments: [SalesTerritoryKey#36L, region_name#37], MapPartitionsRDD[4], ExistingRDD, UnknownPartitioning(0)

(7) Filter
Input [2]: [SalesTerritoryKey#36L, region_name#37]
Condition : isnotnull(SalesTerritoryKey#36L)

(8) Exchange
Input [2]: [SalesTerritoryKey#36L, region_name#37]
Arguments: hashpartitioning(SalesTerritoryKey#36L, 200), ENSURE_REQUIREMENTS, [plan_id=237]

(9) Sort
Input [2]: [SalesTerritoryKey#36L, region_name#37]
Arguments: [SalesTerritoryKey#36L ASC NULLS FIRST], false, 0

(10) SortMergeJoin
Left keys [1]: [cast(SalesTerritoryKey#21 as bigint)]
Right keys [1]: [SalesTerritoryKey#36L]
Join type: LeftOuter
Join condition: None

(11) Project
Output [3]: [SalesTerritoryKey#21, SalesOrderNumber#16, region_name#37]
Input [4]: [SalesOrderNumber#16, SalesTerritoryKey#21, Sales#24, region_name#37]

(12) AdaptiveSparkPlan
Output [3]: [SalesTerritoryKey#21, SalesOrderNumber#16, region_name#37]
Arguments: isFinalPlan=false
"""


def test_capture_explain_live(spark):
    """Live round-trip (reference test_execution_plan.py:8-19)."""
    df = spark.createDataFrame([("Alice", 30), ("Bob", 25)], ["name", "age"])
    out = execution_plan.capture_explain(df)
    assert isinstance(out, str)
    assert "== Physical Plan ==" in out


def test_split_formatted_explain():
    tree, details = execution_plan.split_formatted_explain(EXPLAIN_RESULT)
    assert "== Physical Plan ==" in tree
    assert "(1) Scan parquet" in details


def test_parse_node_details():
    details = execution_plan.parse_node_details(
        execution_plan.split_formatted_explain(EXPLAIN_RESULT)[1]
    )
    assert set(details.keys()) == set(range(1, 13))
    assert (
        details[1]["Location"]
        == "PreparedDeltaFileIndex [dbfs:/mnt/bronze/adventure_works/sales/data]"
    )


def test_parse_node_line():
    assert execution_plan.parse_node_line(
        "* ShuffleQueryStage (11), Statistics(sizeInBytes=1669.9 MiB)"
    ) == (11, "ShuffleQueryStage")


def test_build_execution_tree_golden():
    """Exact (id, name, height) triples + tree shape (reference
    test_execution_plan.py:67-101)."""
    root = execution_plan.build_execution_tree(EXPLAIN_RESULT)
    assert (root.id, root.name, root.height) == (12, "AdaptiveSparkPlan", 0)
    assert len(root.children) == 1
    project = root.children[0]
    assert (project.id, project.name) == (11, "Project")
    join = project.children[0]
    assert join.name == "SortMergeJoin LeftOuter"
    assert len(join.children) == 2

    expected = {
        (1, "Scan parquet", 7),
        (2, "Filter", 6),
        (3, "Project", 5),
        (4, "Exchange", 4),
        (5, "Sort", 3),
        (6, "Scan ExistingRDD", 6),
        (7, "Filter", 5),
        (8, "Exchange", 4),
        (9, "Sort", 3),
    }
    got = set()

    def walk(n):
        got.add((n.id, n.name, n.height))
        for c in n.children:
            walk(c)

    walk(root)
    assert expected <= got

    leaves = {(n.id, n.name) for n in root.leaves}
    assert leaves == {(1, "Scan parquet"), (6, "Scan ExistingRDD")}


def test_multiple_roots_raise():
    bad = "A (1)\nB (2)\n\n\n(1) A\n\n(2) B\n"
    with pytest.raises(ValueError, match="multiple roots"):
        execution_plan.build_execution_tree(bad)


# -- node handler (reference test_node_handler.py) -------------------------


def test_extract_first_bracket_content():
    f = node_handler.extract_first_bracket_content
    assert f("PreparedDeltaFileIndex [dbfs:/mnt/a/b]") == "dbfs:/mnt/a/b"
    assert f("X [first] more [second]") == "first"
    assert f("No brackets here") is None


def test_handle_truncated_path():
    f = node_handler.handle_truncated_path
    assert f("dbfs:/mnt/bronze/sales/data") == "dbfs:/mnt/bronze/sales/data"
    assert (
        f("/lake/cleansed/sales_data/date_part=2024-07-20, ... 13 entries")
        == "/lake/cleansed/sales_data"
    )
    assert (
        f("/lake/cleansed/customer_info/part-00000-tid-751.snappy.orc, ... 12 entries")
        == "/lake/cleansed/customer_info"
    )


def test_extract_data_source():
    n = execution_plan.PlanNode(
        1, "Scan parquet", 1,
        {"Location": "PreparedDeltaFileIndex [dbfs:/mnt/a/sales/data]"},
    )
    assert node_handler.extract_data_source(n) == ("file_scan", "dbfs:/mnt/a/sales/data")

    n = execution_plan.PlanNode(2, "Scan ExistingRDD", 1)
    assert node_handler.extract_data_source(n) == ("memory_scan", "Scan ExistingRDD")

    n = execution_plan.PlanNode(
        3,
        "Scan JDBCRelation((select * from SALES_TABLE) SPARK_GEN_SUBQ_0) "
        "[numPartitions=1]",
        1,
    )
    assert node_handler.extract_data_source(n) == (
        "jdbc_scan", "select * from SALES_TABLE"
    )


# -- end-to-end write log (reference test_write_log.py, on parquet) --------


@pytest.fixture
def lineage_conf(spark, tmp_path):
    log_path = str(tmp_path / "lineage_logs")
    spark.conf.set("io.jorvik.data_lineage.log_path", log_path)
    yield log_path
    spark.conf.unset("io.jorvik.data_lineage.log_path")


def test_write_lineage_log(spark, tmp_path, lineage_conf):
    df = spark.createDataFrame(
        [(1, "Alice", "1.0"), (2, "Bob", "2.0")], "id long, name string, value string"
    )
    st = storage.configure()
    assert any(isinstance(o, DataLineageLogger) for o in st.output_observers)

    output_path = str(tmp_path / "sample_data")
    st.write(df, output_path, format="parquet", mode="overwrite")

    log = (
        st.read(lineage_conf, format="parquet")
        .orderBy(F.desc("observation_ts"))
        .limit(1)
    )
    assert log.schema == LINEAGE_SCHEMA
    row = log.collect()[0]
    assert row.output_path == output_path
    assert row.data_sources == ["memory_scan: Scan ExistingRDD"]
    assert "test_data_lineage.py" in row.transform_code_file


def test_write_lineage_log_file_scan(spark, tmp_path, lineage_conf):
    """A parquet-scan source must be recorded as its file path."""
    src = str(tmp_path / "src")
    spark.range(10).write.parquet(src)
    st = storage.configure()
    out = str(tmp_path / "out")
    st.write(st.read(src, "parquet"), out, format="parquet", mode="overwrite")

    row = (
        st.read(lineage_conf, format="parquet")
        .orderBy(F.desc("observation_ts"))
        .limit(1)
        .collect()[0]
    )
    assert row.output_path == out
    assert len(row.data_sources) == 1
    assert row.data_sources[0].endswith("/src") or "/src" in row.data_sources[0]


def test_lineage_captures_all_sources_of_a_join_dag(spark, tmp_path, lineage_conf):
    """A multi-scan transform (broadcast join of two parquet sources plus
    an aggregate) must record EVERY source path — the lineage answer to
    'which tables fed this gold output', exercised on a realistic plan
    with BroadcastExchange/HashAggregate nodes, not a single-scan toy."""
    sf = default_sf_dir()
    st = storage.configure()
    orders = st.read(f"{sf}/orders.parquet", format="parquet")
    customer = st.read(f"{sf}/customer.parquet", format="parquet")
    gold = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    out = str(tmp_path / "gold")
    st.write(gold, out, format="parquet", mode="overwrite")

    row = (
        st.read(lineage_conf, format="parquet")
        .orderBy(F.desc("observation_ts"))
        .limit(1)
        .collect()[0]
    )
    assert row.output_path == out
    srcs = " ".join(row.data_sources)
    assert "orders.parquet" in srcs
    assert "customer.parquet" in srcs
    assert len(row.data_sources) == 2
