"""Round-12 operator tests: the corpus-adaptive IVF coarse quantizer
(K = ivf_k(n) = max(8, ceil(sqrt(n)))) — the scale behavior the
round-11 verdict flagged as its headline item. Oracle parity for the
query forms runs through tests/test_oracle_parity.py; these pin the
properties the hash compare can't see: the K derivation itself and the
sub-quadratic Sigma|cell|^2 bound on a replicated 10x corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jorvik_spark.queries.similarity import _ivf_assign, ivf_k
from jorvik_spark.tables import default_sf_dir

SF_DIR = default_sf_dir()


def test_ivf_k_derivation():
    """K floors at 8 for tiny corpora and tracks ceil(sqrt(n)) above
    the floor — the exact scalar the DuckDB oracle CTE computes."""
    assert ivf_k(0) == 8
    assert ivf_k(64) == 8
    assert ivf_k(65) == 9
    assert ivf_k(500) == 23
    assert ivf_k(2000) == 45
    assert ivf_k(40_000) == 200
    assert ivf_k(10_000) == 100  # perfect square: IEEE sqrt is exact
    assert ivf_k(10**10) == 100_000  # the 100 TB figure in the K note


@pytest.fixture(scope="module")
def corpus_10x(spark, tmp_path_factory):
    """A 10x replicated embedding corpus (the stress_scale.py recipe:
    vec_id-shifted exact replicas), written as one parquet table."""
    d = tmp_path_factory.mktemp("emb10x")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * 10_000_000))
        for r in range(10)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionAll(p)
    union.coalesce(4).write.parquet(f"{d}/embeddings.parquet")
    return str(d)


def test_cell_pair_work_is_subquadratic_on_10x_corpus(spark, corpus_10x):
    """Sigma|cell|^2 — the aggregate work of every within-cell pair
    consumer (k-NN graph, SemDeDup, outlier census, link prediction,
    cosine near-dup) — must stay O(n^1.5) under the adaptive quantizer.

    With K = ceil(sqrt(n)) the balanced expectation is exactly n^1.5;
    the factor-8 headroom absorbs the replica-induced cell skew of this
    corpus (every vector appears 10x, so cells inherit the base
    distribution's lumps). The fixed-K=8 quantizer this replaced would
    put Sigma|cell|^2 at ~n^2/8 — over the bound by >5x at this n and
    growing linearly with n.
    """
    assign = _ivf_assign(spark, corpus_10x)
    cells = assign.filter(F.col("rn") == 1)
    stats = (
        cells.groupBy("cent_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.sum(F.col("sz") * F.col("sz")).alias("sum_sq"),
            F.sum("sz").alias("n"),
            F.count(F.lit(1)).alias("k_nonempty"),
        )
        .collect()[0]
    )
    n = stats["n"]
    assert n >= 5000  # the corpus really is 10x
    assert stats["sum_sq"] <= 8 * n**1.5
    # the quantizer actually scaled K with the corpus (vs the old
    # fixed 8): most of the ceil(sqrt(n)) cells are live
    assert stats["k_nonempty"] > ivf_k(n) // 2


def test_assignment_materializes_exactly_nprobe_ranks(spark, corpus_10x):
    """The assignment memo holds exactly rn in 1.._IVF_NPROBE per vector
    (the map-side top-NPROBE slice — never the n x K ranking the old
    window formulation shuffled), and the rn=1 home cells span the
    adaptive centroid range [0, ivf_k(n))."""
    from jorvik_spark.queries.similarity import _IVF_NPROBE

    assign = _ivf_assign(spark, corpus_10x)
    n = assign.filter(F.col("rn") == 1).count()
    per_vec = assign.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("c"),
        F.sort_array(F.collect_list("rn")).alias("rns"),
    )
    bad = per_vec.filter(
        (F.col("c") != _IVF_NPROBE)
        | (F.col("rns") != F.array(*[F.lit(i + 1) for i in range(_IVF_NPROBE)]))
    ).count()
    assert bad == 0
    # r13 hash-spread seed: centroid ids are md5-rank-chosen vec_ids —
    # no longer the contiguous [0, K) prefix — so pin (a) every probed
    # cent_id IS a corpus vec_id, (b) at most K distinct centroids are
    # ever referenced, (c) adaptive K engages (more live cells than the
    # old fixed 8).
    k = ivf_k(n)
    corpus_ids = {r["vec_id"] for r in assign.select("vec_id").collect()}
    cent_ids = {
        r["cent_id"] for r in assign.select("cent_id").distinct().collect()
    }
    assert cent_ids <= corpus_ids
    assert len(cent_ids) <= k
    assert len(cent_ids) > 8  # adaptive: more than the old fixed-8 cells


# --- bounded-window seatbelt (registry.guarded_global_window) ---------

_GUARDED_SITES = [
    # (query name, a bound small enough that the site's relation trips)
    ("window_ntile", 5),
    ("window_peak_concurrency", 1),
    ("sample_weighted_systematic", 1),
    ("text_vocab_oov_rate", 5),
]


@pytest.mark.parametrize("name,bound", _GUARDED_SITES)
def test_global_window_guard_trips_on_oversized_relation(
    spark, monkeypatch, name, bound
):
    """Each guarded unpartitioned-window site must raise LOUDLY (with
    the site name in the message) when its input exceeds the row bound
    — the CellImbalanceError discipline applied to windows."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from jorvik_spark.queries import QUERIES

    monkeypatch.setenv("JORVIK_MAX_GLOBAL_WINDOW_ROWS", str(bound))
    with pytest.raises(
        (Py4JJavaError, PySparkException), match="unpartitioned window"
    ):
        QUERIES[name](spark, SF_DIR).collect()


def test_global_window_guard_passes_and_disables(spark, monkeypatch):
    """Under the default bound the guarded value is unchanged, and
    JORVIK_MAX_GLOBAL_WINDOW_ROWS=0 disables the guard entirely."""
    from jorvik_spark.queries import QUERIES

    want = sorted(
        tuple(r) for r in QUERIES["window_ntile"](spark, SF_DIR).collect()
    )
    monkeypatch.setenv("JORVIK_MAX_GLOBAL_WINDOW_ROWS", "0")
    got = sorted(
        tuple(r) for r in QUERIES["window_ntile"](spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0


def test_global_window_guard_shares_the_window_exec(spark):
    """The guard's row_number must fold into the SAME WindowExec as the
    guarded value (identical partition/order spec) — zero extra sort,
    exchange, or Window node in the plan."""
    import contextlib
    import io

    from jorvik_spark.queries import QUERIES

    for name, n_windows in [
        ("window_ntile", 1),
        ("window_peak_concurrency", 2),
        ("sample_weighted_systematic", 2),
    ]:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, SF_DIR).explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        assert tree.count(" Window (") == n_windows, name


def test_ra_shortlist_rank_is_plan_bounded(spark):
    """The RA top-20 (graphs.py) needs no runtime guard: Catalyst's
    rank-limit pushdown inserts WindowGroupLimit, so each map task
    emits <= 20 rows before the single-partition final sort."""
    import contextlib
    import io

    from jorvik_spark.queries import QUERIES

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["graph_knn_linkpred_ra"](spark, SF_DIR).explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert tree.count("WindowGroupLimit") >= 2


def test_triangle_degree_broadcast_is_size_gated(spark, monkeypatch):
    """The deliberate degree-relation broadcast must be SIZE-GATED
    (round-11 verdict watch item): under the row budget the hint is
    applied (BroadcastHashJoin on both degree joins); past it the plan
    falls through to the optimizer's shuffle joins — and both shapes
    return the identical census row. memo_df is pass-through'd so the
    explain shows the build lineage instead of the checkpointed RDD
    scan."""
    import contextlib
    import io

    import jorvik_spark.queries.graphs as G

    monkeypatch.setattr(
        G, "memo_df", lambda key, s, build, **kw: build()
    )

    def tree() -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            G.graph_triangle_count(spark, SF_DIR).explain("formatted")
        return buf.getvalue().split("\n\n")[0]

    # pin this test to the WEDGE-JOIN plan: the r17 broadcast-adjacency
    # fast path (its own gate + test below) would otherwise change the
    # shapes asserted here
    monkeypatch.setenv("JORVIK_TRI_ADJ_MAX_NODES", "0")
    monkeypatch.setenv("JORVIK_DEGREE_BCAST_MAX_ROWS", "10000000")
    hinted = tree()
    # r12 ADVICE hardening: the pass-through memo_df means each phase
    # must BUILD its own degree-join shape — a lineage-cut LogicalRDD
    # leaf in the tree would mean the memo leaked back in and the
    # explain observed a cached relation instead of the gate.
    assert "Scan ExistingRDD" not in hinted
    assert "BroadcastHashJoin" in hinted
    assert "SortMergeJoin" not in hinted  # whole hinted plan broadcasts
    want = G.graph_triangle_count(spark, SF_DIR).collect()

    monkeypatch.setenv("JORVIK_DEGREE_BCAST_MAX_ROWS", "1")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        unhinted = tree()
        assert "Scan ExistingRDD" not in unhinted
        assert "SortMergeJoin" in unhinted
        # the gate really dropped the hint: with the auto threshold
        # disabled a surviving F.broadcast would still force BHJ
        assert "BroadcastHashJoin" not in unhinted
        got = G.graph_triangle_count(spark, SF_DIR).collect()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", old_thresh
        )
    assert got == want and len(got) == 1


def test_triangle_intersect_fast_path_matches_wedge_join(spark, monkeypatch):
    """r17 optimization: the broadcast-adjacency per-edge intersection
    fast path must return the identical census row as the wedge-join
    plan, and its gate must actually switch the shape (the packed-bitmap
    bit_count intersection present only under the node budget)."""
    import contextlib
    import io

    import jorvik_spark.queries.graphs as G

    monkeypatch.setattr(G, "memo_df", lambda key, s, build, **kw: build())

    def tree() -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            G.graph_triangle_count(spark, SF_DIR).explain("formatted")
        return buf.getvalue()

    monkeypatch.setenv("JORVIK_TRI_ADJ_MAX_NODES", "10000000")
    fast_plan = tree()
    assert "bit_count" in fast_plan
    fast = G.graph_triangle_count(spark, SF_DIR).collect()

    monkeypatch.setenv("JORVIK_TRI_ADJ_MAX_NODES", "0")
    slow_plan = tree()
    assert "bit_count" not in slow_plan
    slow = G.graph_triangle_count(spark, SF_DIR).collect()

    assert fast == slow and len(fast) == 1

    # default budget (no env): metadata-derived isqrt(bytes/8) — sane
    monkeypatch.delenv("JORVIK_TRI_ADJ_MAX_NODES", raising=False)
    assert G._tri_adj_bcast_max_nodes(spark) > 0


def test_triangle_bitmap_rank_guard(spark, monkeypatch):
    """r18 (r17 ADVICE): the packed-bitmap fast path sizes nw from the
    supplier-count UPPER bound, but ranks come from the actual co-supply
    node set — an FK violation must raise loudly instead of silently
    dropping bits; and the test-only env override is clamped to the
    node count whose worst-case bitmap saturates Spark's 8 GiB
    broadcast hard cap."""
    import contextlib
    import io

    import jorvik_spark.queries.graphs as G

    # clamp: the env can never push the gate past isqrt(8 GiB / 8)
    monkeypatch.setenv("JORVIK_TRI_ADJ_MAX_NODES", "10000000")
    assert G._tri_adj_bcast_max_nodes(spark) == 32768
    monkeypatch.setenv("JORVIK_TRI_ADJ_MAX_NODES", "0")
    assert G._tri_adj_bcast_max_nodes(spark) == 0

    # wiring: the guard expression is in the fast-path plan
    monkeypatch.setenv("JORVIK_TRI_ADJ_MAX_NODES", "10000000")
    monkeypatch.setattr(G, "memo_df", lambda key, s, build, **kw: build())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        G.graph_triangle_count(spark, SF_DIR).explain("formatted")
    assert "raise_error" in buf.getvalue()

    # mechanism: an out-of-bound rank raises instead of dropping a bit
    from pyspark.sql import Window

    df = spark.range(70).select(F.col("id").alias("node"))
    rk0 = F.row_number().over(Window.orderBy("node")) - 1
    guarded = df.select(
        F.when(rk0 < 64, rk0)
        .otherwise(
            F.expr("raise_error('triangle bitmap rank overflow')").cast(
                "int"
            )
        )
        .alias("rk")
    )
    with pytest.raises(Exception, match="rank overflow"):
        guarded.collect()


def test_degree_bcast_budget_parses_conf_sizes(spark, monkeypatch):
    from jorvik_spark.queries.graphs import _degree_bcast_budget_rows

    monkeypatch.delenv("JORVIK_DEGREE_BCAST_MAX_ROWS", raising=False)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, rows in [
            ("10485760", 10485760 // 32),
            ("10MB", (10 << 20) // 32),
            ("1g", (1 << 30) // 32),
            ("512k", (512 << 10) // 32),
            ("-1", 0),
        ]:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert _degree_bcast_budget_rows(spark) == rows, raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# --- live twins: running CUSUM + incremental IVF sink ------------------


def test_running_cusum_matches_batch_across_restart(spark, tmp_path):
    """The live CUSUM detector must converge to its batch branch, with
    the frozen baseline and the accumulating S statistic surviving a
    kill: user 1 finishes its 8-event baseline BEFORE the cut and
    crosses h only AFTER the restart — right only if (mu, S) came back
    from the checkpoint."""
    import datetime

    from jorvik_spark.streaming.ops import running_cusum_changepoints

    base = datetime.datetime(2024, 5, 1, 9, 0, 0)
    rows = []
    eid = 0
    # user 1: 8 baseline events at 10.0 (mu = 10.0), then a GRADUAL
    # drift to 30.0 — each event adds +20 excess, h = 50e6 micro-units
    # (50.0), so the crossing needs THREE drift events (S = 20, 40, 60)
    # and lands at monitored position 3 = event id 11, entirely in the
    # post-restart half.
    for i in range(8):
        eid += 1
        rows.append(
            (eid, base + datetime.timedelta(minutes=i), 1, "purchase",
             10.0, None)
        )
    for i in range(4):
        eid += 1
        rows.append(
            (eid, base + datetime.timedelta(minutes=40 + i), 1,
             "purchase", 30.0, None)
        )
    # user 2: too few events to finish the baseline — never monitored.
    for i in range(3):
        eid += 1
        rows.append(
            (eid, base + datetime.timedelta(minutes=i), 2, "purchase",
             999.0, None)
        )
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(rows, schema)
    src, dst, cp = (str(tmp_path / d) for d in ("src", "dst", "cp"))
    cut = base + datetime.timedelta(minutes=20)  # baseline done, no cross
    df.filter(F.col("ts") < cut).coalesce(1).write.parquet(f"{src}/p=a")

    def drain_once() -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/p=*")
        )
        q = (
            running_cusum_changepoints(stream)
            .writeStream.foreachBatch(
                lambda b, i: b.withColumn("bid", F.lit(i))
                .write.mode("append")
                .parquet(dst)
            )
            .option("checkpointLocation", cp)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()

    drain_once()
    df.filter(F.col("ts") >= cut).coalesce(1).write.parquet(f"{src}/p=b")
    drain_once()

    out = spark.read.parquet(dst)
    last = out.groupBy("user_id").agg(F.max("bid").alias("bid"))
    live = sorted(
        tuple(r)
        for r in out.join(last, ["user_id", "bid"]).drop("bid").collect()
    )
    batch = sorted(
        tuple(r)
        for r in running_cusum_changepoints(df).collect()
    )
    assert live == batch
    by_user = {r[0]: r[1:] for r in live}
    assert 1 in by_user and 2 not in by_user
    # crossing at monitored position 3 (third 30.0) = event id 11;
    # S peaks at 4 x 20e6 excess = 80e6
    assert by_user[1] == (3, 11, 80_000_000)


def test_running_cusum_batch_semantics_vs_registered_query(spark):
    """Documented semantic delta: the live/batch-branch frozen baseline
    (first 8 events) vs the registered query's whole-history mean. Both
    must flag A drift; positions may differ. Sanity: every frozen-
    baseline user with >= 9 events is a subset of the event population
    the registered query scans."""
    from jorvik_spark.queries import QUERIES
    from jorvik_spark.streaming.ops import running_cusum_changepoints
    from jorvik_spark.tables import load_table

    frozen = running_cusum_changepoints(
        load_table(spark, SF_DIR, "events")
    )
    reg = QUERIES["window_cusum_changepoints"](spark, SF_DIR)
    assert frozen.count() > 0 and reg.count() > 0


def _write_vec_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("append").parquet(path)


def test_incremental_ivf_sink_screens_and_converges(spark, tmp_path):
    """The IVF sink must (a) train-once/freeze the quantizer, (b) drop
    near-dups vs the persisted index AND smaller-id within-batch twins,
    (c) keep novel vectors, and (d) converge on replay: re-sent vectors
    self-collide at cosine 1.0 and append zero index rows."""
    from jorvik_spark.streaming.sinks import incremental_ivf_sink

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    cents = str(tmp_path / "cents")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    def drain() -> None:
        stream = (
            spark.readStream.schema(
                "vec_id long, embedding array<float>, label int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = incremental_ivf_sink(stream, idx, cents, out, cp)
        try:
            q.awaitTermination(300)
        finally:
            q.stop()

    # batch 1: 10 well-separated history vectors (axes and negatives)
    hist = [
        (i, [0.0] * i + [1.0] + [0.0] * (9 - i), 0) for i in range(10)
    ]
    _write_vec_batch(spark, src, hist)
    drain()
    n_index_after_1 = spark.read.parquet(idx).count()
    assert n_index_after_1 == 10
    k = spark.read.parquet(cents).count()
    assert k == 8  # ivf_k(10) floors at 8

    # batch 2: 100 = near-dup of vec 0 (dropped vs index), 101 = novel
    # direction, 102/103 = identical within-batch twins (102 kept,
    # 103 dropped via the smaller-id pass).
    batch2 = [
        (100, [1.0, 0.001] + [0.0] * 8, 0),
        (101, [0.0] * 8 + [0.7, -0.7], 0),
        (102, [0.5, -0.5, 0.5, -0.5] + [0.0] * 6, 0),
        (103, [0.5, -0.5, 0.5, -0.5] + [0.0] * 6, 0),
    ]
    _write_vec_batch(spark, src, batch2)
    drain()
    kept = {
        r["vec_id"]
        for r in spark.read.parquet(out).collect()
        if r["vec_id"] >= 100
    }
    assert kept == {101, 102}
    # index grew by ALL of batch 2 (dropped vectors stay screened)
    assert spark.read.parquet(idx).count() == 14
    # quantizer frozen: still the 8 batch-1 centroids
    assert spark.read.parquet(cents).count() == 8

    # replay convergence: the SAME vectors re-sent as a new file are
    # all self-collisions — nothing new lands in out or the index.
    _write_vec_batch(spark, src, batch2)
    drain()
    assert spark.read.parquet(idx).count() == 14
    kept2 = [
        r["vec_id"]
        for r in spark.read.parquet(out).collect()
        if r["vec_id"] >= 100
    ]
    assert sorted(kept2) == [101, 102]


def test_incremental_ivf_sink_agrees_with_batch_query(spark, tmp_path):
    """Feed the batch query's OWN history/incoming split through the
    sink (history as batch 1, incoming as batch 2): every vector the
    query calls a duplicate must be dropped by the sink too, and every
    sink-kept vector must be query-novel — the sink's extra drops are
    exactly its documented within-batch greedy pass."""
    from jorvik_spark.queries import QUERIES
    from jorvik_spark.queries.registry import hash_bucket
    from jorvik_spark.queries.similarity import _IIVF_HIST_LT, _IIVF_SALT
    from jorvik_spark.streaming.sinks import incremental_ivf_sink

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "bkt", hash_bucket(F.col("vec_id"), _IIVF_SALT)
    )
    src = str(tmp_path / "src")
    emb.filter(F.col("bkt") < _IIVF_HIST_LT).drop("bkt").coalesce(
        1
    ).write.parquet(f"{src}/p=a")

    idx, cents, out, cp = (
        str(tmp_path / d) for d in ("idx", "cents", "out", "cp")
    )

    def drain() -> None:
        stream = (
            spark.readStream.schema(
                "vec_id long, embedding array<float>, label int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/p=*")
        )
        q = incremental_ivf_sink(stream, idx, cents, out, cp)
        try:
            q.awaitTermination(300)
        finally:
            q.stop()

    drain()
    incoming = emb.filter(F.col("bkt") >= _IIVF_HIST_LT).drop("bkt")
    incoming.coalesce(1).write.parquet(f"{src}/p=b")
    drain()

    verdicts = {
        r["vec_id"]: r["is_novel"]
        for r in QUERIES["simsearch_incremental_ivf"](
            spark, SF_DIR
        ).collect()
    }
    kept = {
        r["vec_id"]
        for r in spark.read.parquet(out).collect()
        if r["vec_id"] in verdicts
    }
    # query-duplicate => sink-dropped (the sink screens a superset)
    assert all(vid not in kept for vid, novel in verdicts.items() if not novel)
    # sink-kept => query-novel
    assert all(verdicts[vid] for vid in kept)
    assert kept  # the screen didn't degenerate to drop-everything


def test_running_flatline_matches_batch_across_restart(spark, tmp_path):
    """The live flatline detector must converge to its batch branch,
    with an OPEN run straddling the restart cut: user 1's stuck value
    starts pre-cut (2 events — not yet qualifying) and completes
    post-restart, so the report is right only if (cur_vu, cur_len)
    came back from the checkpoint."""
    import datetime

    from jorvik_spark.streaming.ops import running_flatline_runs

    base = datetime.datetime(2024, 5, 1, 9, 0, 0)
    rows = []
    eid = 0
    # user 1: healthy values, then a stuck 7.5 spanning the cut
    for i, v in enumerate([10.0, 11.0, 7.5, 7.5]):
        eid += 1
        rows.append(
            (eid, base + datetime.timedelta(minutes=i), 1, "purchase",
             v, None)
        )
    for i, v in enumerate([7.5, 7.5, 12.0, 9.0, 9.0]):
        eid += 1
        rows.append(
            (eid, base + datetime.timedelta(minutes=30 + i), 1,
             "purchase", v, None)
        )
    # user 2: alternating values — never flatlines, never emitted
    for i, v in enumerate([1.0, 2.0, 1.0, 2.0, 1.0]):
        eid += 1
        rows.append(
            (eid, base + datetime.timedelta(minutes=i), 2, "purchase",
             v, None)
        )
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(rows, schema)
    src, dst, cp = (str(tmp_path / d) for d in ("src", "dst", "cp"))
    cut = base + datetime.timedelta(minutes=10)
    df.filter(F.col("ts") < cut).coalesce(1).write.parquet(f"{src}/p=a")

    def drain_once() -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/p=*")
        )
        q = (
            running_flatline_runs(stream)
            .writeStream.foreachBatch(
                lambda b, i: b.withColumn("bid", F.lit(i))
                .write.mode("append")
                .parquet(dst)
            )
            .option("checkpointLocation", cp)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()

    drain_once()
    df.filter(F.col("ts") >= cut).coalesce(1).write.parquet(f"{src}/p=b")
    drain_once()

    out = spark.read.parquet(dst)
    last = out.groupBy("user_id").agg(F.max("bid").alias("bid"))
    live = sorted(
        tuple(r)
        for r in out.join(last, ["user_id", "bid"]).drop("bid").collect()
    )
    batch = sorted(
        tuple(r) for r in running_flatline_runs(df).collect()
    )
    assert live == batch
    by_user = {r[0]: r[1:] for r in live}
    # the 4-long stuck 7.5 run spans the cut; user 2 never appears
    assert by_user[1] == (1, 4, 4) and 2 not in by_user


def test_running_flatline_batch_matches_registered_query(spark, tmp_path):
    """Batch delegation equals the registered window_flatline_runs rows
    exactly. sf0.001's random values have no natural length-3 repeats,
    so the corpus is the real events UNION a seeded stuck user."""
    import datetime

    from jorvik_spark.queries import QUERIES
    from jorvik_spark.streaming.ops import running_flatline_runs
    from jorvik_spark.tables import load_table

    base = datetime.datetime(2024, 6, 1)
    stuck = spark.createDataFrame(
        [
            (10_000_000 + i, base + datetime.timedelta(minutes=i),
             99_999, "purchase", 3.25 if i < 5 else 4.0, None)
            for i in range(8)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "seeded")
    load_table(spark, SF_DIR, "events").unionByName(stuck).coalesce(
        2
    ).write.parquet(f"{d}/events.parquet")

    got = sorted(
        tuple(r)
        for r in running_flatline_runs(
            spark.read.parquet(f"{d}/events.parquet")
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in QUERIES["window_flatline_runs"](spark, d).collect()
    )
    assert got == want and len(got) > 0
    # the seeded user has TWO qualifying runs: 5 x 3.25 and 3 x 4.0
    assert dict((r[0], r[1:]) for r in got)[99_999] == (2, 5, 8)


def test_value_run_census_reconciles_with_corpus(spark):
    """The run-length census is non-vacuous at EVERY SF (run_len=1 mass
    always exists — the property the flatline offender screen honestly
    lacks on this synthesizer's continuous values) and its totals must
    reconcile exactly with the event corpus it censuses."""
    from jorvik_spark.queries import QUERIES
    from jorvik_spark.tables import load_table

    rows = {
        r["run_len"]: r
        for r in QUERIES["window_value_run_census"](spark, SF_DIR).collect()
    }
    assert 1 in rows and rows[1]["n_runs"] > 0
    # every censused event is in exactly one run
    n_events_total = sum(r["n_events"] for r in rows.values())
    corpus = (
        load_table(spark, SF_DIR, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .count()
    )
    assert n_events_total == corpus
    # per length-L run accounting: n_events == L * n_runs, and a run
    # belongs to one stream so n_streams <= n_runs
    for L, r in rows.items():
        assert r["n_events"] == L * r["n_runs"]
        assert 0 < r["n_streams"] <= r["n_runs"]
    # healthy corpus: the mass sits at run_len=1
    assert rows[1]["n_runs"] == max(r["n_runs"] for r in rows.values())


def test_value_run_census_counts_seeded_runs(spark, tmp_path):
    """Seeding one stuck stream moves the census by EXACTLY the seeded
    run-length histogram (5x3.25 then 3x4.0 in one purchase stream)."""
    import datetime

    from jorvik_spark.queries import QUERIES
    from jorvik_spark.tables import load_table

    base = datetime.datetime(2024, 6, 1)
    stuck = spark.createDataFrame(
        [
            (10_000_000 + i, base + datetime.timedelta(minutes=i),
             99_999, "purchase", 3.25 if i < 5 else 4.0, None)
            for i in range(8)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "seeded")
    load_table(spark, SF_DIR, "events").unionByName(stuck).coalesce(
        2
    ).write.parquet(f"{d}/events.parquet")

    before = {
        r["run_len"]: (r["n_runs"], r["n_events"])
        for r in QUERIES["window_value_run_census"](spark, SF_DIR).collect()
    }
    after = {
        r["run_len"]: (r["n_runs"], r["n_events"])
        for r in QUERIES["window_value_run_census"](spark, d).collect()
    }
    assert after[5] == (before.get(5, (0, 0))[0] + 1,
                        before.get(5, (0, 0))[1] + 5)
    assert after[3] == (before.get(3, (0, 0))[0] + 1,
                        before.get(3, (0, 0))[1] + 3)
    for L, (n_runs, n_events) in before.items():
        if L not in (3, 5):
            assert after[L] == (n_runs, n_events)


def test_primary_key_census_reconciles_and_prunes(spark):
    """The lake-wide PK census: row totals must equal the real table
    counts, dup arithmetic must reconcile, and — the 100 TB property —
    every branch's parquet scan must read ONLY its key columns."""
    import contextlib
    import io

    from jorvik_spark.queries import QUERIES
    from jorvik_spark.queries.audits import _TABLE_KEYS
    from jorvik_spark.tables import load_table

    df = QUERIES["audit_primary_keys"](spark, SF_DIR)
    rows = {r["table_name"]: r for r in df.collect()}
    assert set(rows) == {t for t, _ in _TABLE_KEYS}
    for t in ("customer", "events"):
        assert rows[t]["n_rows"] == load_table(spark, SF_DIR, t).count()
    for r in rows.values():
        assert r["n_dup_rows"] == r["n_keys"] - r["n_distinct"]
        assert 0 <= r["n_keys"] <= r["n_rows"]
    # the synthesizer's lineitem (l_orderkey, l_linenumber) is NOT
    # unique — the census must catch it (non-vacuous duplicate count)
    assert rows["lineitem"]["n_dup_rows"] > 0
    assert rows["orders"]["n_dup_rows"] == 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ReadSchema: struct<c_custkey:bigint>" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>" in plan
    assert "Join" not in plan


def test_primary_key_census_counts_seeded_duplicates(spark, tmp_path):
    """Duplicating 7 orders rows (and null-keying one) must move the
    census by exactly those deltas, in the orders row only."""
    from jorvik_spark.queries import QUERIES
    from jorvik_spark.tables import load_table

    src = load_table(spark, SF_DIR, "orders")
    dupes = src.limit(7)
    nulled = src.limit(1).withColumn(
        "o_orderkey", F.lit(None).cast("long")
    )
    d = str(tmp_path / "lake")
    for t in ("customer", "documents", "embeddings", "events", "lineitem",
              "nation", "part", "region", "supplier"):
        load_table(spark, SF_DIR, t).write.parquet(f"{d}/{t}.parquet")
    src.unionByName(dupes).unionByName(nulled).coalesce(2).write.parquet(
        f"{d}/orders.parquet"
    )

    before = {
        r["table_name"]: r
        for r in QUERIES["audit_primary_keys"](spark, SF_DIR).collect()
    }
    after = {
        r["table_name"]: r
        for r in QUERIES["audit_primary_keys"](spark, d).collect()
    }
    b, a = before["orders"], after["orders"]
    assert a["n_rows"] == b["n_rows"] + 8
    assert a["n_keys"] == b["n_keys"] + 7      # the null-key row drops out
    assert a["n_distinct"] == b["n_distinct"]  # dupes add no new keys
    assert a["n_dup_rows"] == b["n_dup_rows"] + 7
    for t in before:
        if t != "orders":
            assert tuple(after[t]) == tuple(before[t]), t


def test_primary_key_census_partial_null_composite_key_parity(
    spark, tmp_path
):
    """A lineitem row with a NULL l_linenumber (half of the composite
    key) is the exact case where Spark's countDistinct (skips any-null
    tuples) and DuckDB's row-value COUNT(DISTINCT (a,b)) (counts them)
    would diverge without the declared FILTER — pin the two engines
    agree on the declared semantics: the row leaves n_keys/n_distinct
    and lands only in n_rows."""
    import duckdb

    from jorvik_spark.queries import ORACLES, QUERIES
    from jorvik_spark.tables import load_table

    d = str(tmp_path / "lake")
    for t in ("customer", "documents", "embeddings", "events", "nation",
              "orders", "part", "region", "supplier"):
        load_table(spark, SF_DIR, t).write.parquet(f"{d}/{t}.parquet")
    li = load_table(spark, SF_DIR, "lineitem")
    halfnull = li.limit(1).withColumn(
        "l_linenumber", F.lit(None).cast("int")
    )
    li.unionByName(halfnull).coalesce(2).write.parquet(
        f"{d}/lineitem.parquet"
    )

    got = sorted(
        tuple(r) for r in QUERIES["audit_primary_keys"](spark, d).collect()
    )
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            # Spark writes each table as a DIRECTORY of part files
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    want = sorted(tuple(r) for r in con.execute(
        ORACLES["audit_primary_keys"]
    ).fetchall())
    assert got == want
    li_row = dict((r[0], r[1:]) for r in got)["lineitem"]
    base = dict(
        (r["table_name"], r)
        for r in QUERIES["audit_primary_keys"](spark, SF_DIR).collect()
    )["lineitem"]
    assert li_row == (
        base["n_rows"] + 1,      # the half-null row is a row...
        base["n_keys"],          # ...but not a key
        base["n_distinct"],
        base["n_dup_rows"],
    )


def test_flatline_and_census_agree_on_null_user_corpus(spark, tmp_path):
    """The review scenario that motivated the shared core: a ≥3-run of
    identical purchase values under user_id NULL. Declared semantics —
    null stream identity out of scope — must hold on BOTH engines for
    BOTH operators (no offender row, no censused run), and the live
    twin's batch branch must agree with the registered query."""
    import datetime

    import duckdb

    from jorvik_spark.queries import ORACLES, QUERIES
    from jorvik_spark.streaming.ops import running_flatline_runs
    from jorvik_spark.tables import load_table

    base = datetime.datetime(2024, 6, 1)
    anon = spark.createDataFrame(
        [
            (20_000_000 + i, base + datetime.timedelta(minutes=i),
             None, "purchase", 7.75, None)
            for i in range(5)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "anon")
    load_table(spark, SF_DIR, "events").unionByName(anon).coalesce(
        2
    ).write.parquet(f"{d}/events.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    for name in ("window_flatline_runs", "window_value_run_census"):
        got = sorted(tuple(r) for r in QUERIES[name](spark, d).collect())
        want = sorted(tuple(r) for r in con.execute(ORACLES[name]).fetchall())
        assert got == want, name
        # the null-user run is out of scope: no None keys, no 5-run
        assert not any(r[0] is None for r in got), name
    census = {
        r["run_len"]
        for r in QUERIES["window_value_run_census"](spark, d).collect()
    }
    assert 5 not in census
    # live twin (batch branch) agrees with the registered query
    twin = sorted(
        tuple(r)
        for r in running_flatline_runs(
            spark.read.parquet(f"{d}/events.parquet")
        ).collect()
    )
    batch = sorted(
        tuple(r)
        for r in QUERIES["window_flatline_runs"](spark, d).collect()
    )
    assert twin == batch


def test_gap_census_reconciles_with_streams(spark):
    """Every event after its stream's first contributes exactly one gap:
    total gaps == (events with non-null ts and user) - (active users).
    Octave accounting must hold (max_gap_s inside each octave's range)
    and the census is non-vacuous at every SF."""
    from jorvik_spark.queries import QUERIES
    from jorvik_spark.tables import load_table

    rows = QUERIES["window_gap_census"](spark, SF_DIR).collect()
    assert rows, "census must be non-vacuous"
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_gaps"] for r in rows) == n_events - n_users
    for r in rows:
        b = r["gap_bits"]
        lo, hi = (0, 0) if b == 0 else (2 ** (b - 1), 2**b - 1)
        assert lo <= r["max_gap_s"] <= hi, r
        assert 0 < r["n_users"] <= r["n_gaps"]
