"""Round-13 operator tests: star-contraction components kernel."""

import pytest
from pyspark.sql import functions as F

from jorvik_spark.queries import components as comp_mod
from jorvik_spark.queries.components import (
    ComponentsNotConverged,
    star_contract_components,
)


def _brute_components(edges):
    """Driver-side union-find ground truth for small fixtures."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_contraction_matches_union_find_on_mixed_graph(spark):
    # chain + triangle + isolated pair + a star: every shape at once
    edges = (
        [(i, i + 1) for i in range(100, 120)]  # 21-node chain
        + [(1, 2), (2, 3), (3, 1)]  # triangle
        + [(50, 60)]  # pair
        + [(70, 71), (70, 72), (70, 73), (70, 74)]  # star, hub smallest
        + [(201, 200), (202, 200)]  # star, hub NOT smallest
    )
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["node"]: r["component"]
        for r in star_contract_components(df, "node", "component").collect()
    }
    assert got == _brute_components(edges)


def test_star_contraction_round_count_is_logarithmic_on_chain(spark):
    # a 200-link chain costs ~200 rounds under one-hop label propagation
    # (the round-12 verdict's pathological case); star contraction must
    # resolve it in O(log n) — the 64-round bound becomes provably
    # generous instead of hopeful.
    n = 201
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["a", "b"])
    labels = star_contract_components(df, "node", "component")
    assert labels.select(F.count_distinct("component")).first()[0] == 1
    assert labels.count() == n
    assert labels.filter(F.col("component") != 0).count() == 0
    assert comp_mod.last_round_count <= 12, comp_mod.last_round_count


def test_star_contraction_raises_loudly_when_bound_exhausted(
    spark, monkeypatch
):
    # ADVICE r12 (graphs.py): never silently return unconverged labels.
    monkeypatch.setattr(comp_mod, "_MAX_ROUNDS", 1)
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], ["a", "b"]
    )
    with pytest.raises(ComponentsNotConverged, match="did not converge"):
        star_contract_components(df, "node", "component")


def test_incremental_ivf_sink_zero_norm_out_of_scope(spark, tmp_path):
    """r12 ADVICE: zero-norm vectors must not be re-appended as novel on
    every replay — they are declared out of scope and dropped at ingest,
    on first delivery AND on checkpoint replay."""
    from jorvik_spark.streaming.sinks import incremental_ivf_sink

    src = str(tmp_path / "src")
    paths = [str(tmp_path / p) for p in ("idx", "cents", "out", "cp")]

    def drain() -> None:
        stream = (
            spark.readStream.schema(
                "vec_id long, embedding array<float>, label int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = incremental_ivf_sink(stream, *paths)
        try:
            q.awaitTermination(300)
        finally:
            q.stop()

    def write(rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.mode("append").parquet(src)

    hist = [(i, [0.0] * i + [1.0] + [0.0] * (9 - i), 0) for i in range(10)]
    write(hist)
    drain()

    # two zero-norm rows + one novel positive-norm row
    batch = [
        (200, [0.0] * 10, 0),
        (201, [0.0] * 10, 0),
        (202, [0.0] * 8 + [0.7, -0.7], 0),
    ]
    write(batch)
    drain()
    kept = sorted(
        r["vec_id"]
        for r in spark.read.parquet(paths[2]).collect()
        if r["vec_id"] >= 200
    )
    assert kept == [202]

    # replay the same vectors: zero-norm rows must STILL not appear,
    # and 202 self-collides — out_path is unchanged.
    write(batch)
    drain()
    kept2 = sorted(
        r["vec_id"]
        for r in spark.read.parquet(paths[2]).collect()
        if r["vec_id"] >= 200
    )
    assert kept2 == [202]


def test_sql_api_views_reregister_after_user_rebind(spark):
    """r12 ADVICE: a user createOrReplaceTempView on one of the four
    names between invocations must not make the cached skip path read
    the wrong table."""
    from jorvik_spark.queries import QUERIES
    from jorvik_spark.tables import default_sf_dir

    sf = default_sf_dir()
    want = QUERIES["sql_api_revenue_report"](spark, sf).collect()
    # sabotage: rebind lineitem to an empty same-schema relation
    empty = spark.createDataFrame(
        [], QUERIES["sql_api_revenue_report"](spark, sf).sparkSession.read.parquet(
            f"{sf}/lineitem.parquet"
        ).schema,
    )
    empty.createOrReplaceTempView("lineitem")
    got = QUERIES["sql_api_revenue_report"](spark, sf).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_star_contraction_empty_and_self_loop_edges(spark):
    empty = spark.createDataFrame([], "a long, b long")
    assert star_contract_components(empty, "node", "component").count() == 0
    loops = spark.createDataFrame([(7, 7), (8, 9)], ["a", "b"])
    got = {
        r["node"]: r["component"]
        for r in star_contract_components(loops, "node", "component").collect()
    }
    # self-loop-only node 7 is dropped with its edge (no pair membership)
    assert got == {8: 8, 9: 8}
