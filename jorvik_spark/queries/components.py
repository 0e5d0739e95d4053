"""Shared connected-components kernel: alternating star contraction.

One implementation serves both component consumers (the banded-MinHash
near-dup cluster resolver in ``dedup.py`` and the co-supply graph census
in ``graphs.py``). Round-12 verdict item #3: the previous smallest-label
propagation ran one hop per round, so a chain of D duplicate links cost
D join rounds — fine on natural near-dup clusters (diameter ~2-3),
pathological on chained-duplicate corpora. Star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
algorithm, re-derived here on DataFrames) halves every tree's height
per alternation, so the round count is O(log n) REGARDLESS of graph
diameter, and the 64-round safety bound is provably generous (2^64
nodes) instead of hopeful.

Semantics (exact, not approximate): both phases only ever re-link a
node to a SMALLER reachable id, and the minimum id of each component is
a fixed point, so the contraction converges to a star forest whose
roots are exactly the per-component minimum ids — the same labels the
one-hop propagation and the DuckDB recursive-CTE oracles compute.

Scale shape per round: each phase is ONE groupBy-min over the current
edge relation plus ONE edge-keyed join — always on the |E|-bounded pair
relation, never a fact table. Each round's edge set is
``localCheckpoint``ed and the superseded round released eagerly (the
measured plan-doubling rationale documented on
``dedup_minhash_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ComponentsNotConverged(RuntimeError):
    """Star contraction exhausted its round bound without reaching the
    fixpoint — loud failure instead of silently wrong labels (round-12
    ADVICE item on graphs.py; same discipline as CellImbalanceError)."""


_MAX_ROUNDS = 64  # star contraction halves tree heights per round: 2^64 nodes

# Rounds the most recent star_contract_components call took to converge
# (inclusive of the final no-change round). Observability for tests and
# the PROFILE.md round-count measurements — not part of any result.
last_round_count = 0


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m(u)) for every symmetric edge (u, v) with v > u, where
    m(u) = min(neighborhood(u) ∪ {u}). Keeps the a > b orientation."""
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    m = (
        sym.groupBy("a")
        .agg(F.min("b").alias("__mn"))
        .select("a", F.least("__mn", "a").alias("m"))
    )
    return (
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge (big, small); for each big node emit
    (small, m(big)) and (big, m(big)) where m(big) = min(smalls).
    Since every neighbor is smaller than big, m is already the
    neighborhood-and-self minimum."""
    oriented = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    )
    m = oriented.groupBy("a").agg(F.min("b").alias("m"))
    relinked = (
        oriented.join(m, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    self_links = m.select("a", F.col("m").alias("b"))
    return (
        relinked.unionByName(self_links)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def star_contract_components(
    pairs: DataFrame, node_col: str, comp_col: str
) -> DataFrame:
    """Resolve connected components of an undirected pair graph.

    ``pairs``: two-column DataFrame of distinct edges (either or both
    orientations; self-loops ignored). Returns one row per node that
    appears in ``pairs``: (node_col, comp_col) where comp_col is the
    smallest node id in the node's component — identical labels to a
    one-hop smallest-label propagation run to convergence, in O(log n)
    rounds instead of O(diameter).

    Raises ComponentsNotConverged if the fixpoint is not reached within
    the round bound (cannot happen below 2^64 nodes; the guard exists so
    a future editing mistake fails loudly, never silently-wrong labels).
    """
    a_col, b_col = pairs.columns
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    # All nodes, captured BEFORE contraction: star rounds drop nodes as
    # they resolve (a fully-contracted child stops appearing), so the
    # final star forest alone under-reports membership.
    nodes = (
        edges.select(F.col("a").alias(node_col))
        .unionByName(edges.select(F.col("b").alias(node_col)))
        .distinct()
        .localCheckpoint()
    )
    global last_round_count
    converged = False
    rounds = 0
    try:
        for rounds in range(1, _MAX_ROUNDS + 1):
            new_edges = _small_star(_large_star(edges)).localCheckpoint()
            # Both sets are distinct and (a > b)-oriented, so set
            # equality is count-equality plus empty difference.
            changed = (
                new_edges.count() != edges.count()
                or new_edges.exceptAll(edges).limit(1).count() > 0
            )
            _release_local_checkpoint(edges)
            edges = new_edges
            if not changed:
                converged = True
                break
        last_round_count = rounds
        if not converged:
            remaining = edges.count()
            raise ComponentsNotConverged(
                f"star contraction did not converge within {_MAX_ROUNDS} "
                f"rounds ({remaining} edges still live) — refusing to "
                "return unconverged component labels"
            )
        # Star forest: every child points at its root; roots label
        # themselves; nodes whose component fully contracted away take
        # their own id (they were component minima).
        child_root = edges.select(
            F.col("a").alias(node_col), F.col("b").alias("__root")
        )
        labels = (
            nodes.join(child_root, node_col, "left")
            .select(
                node_col,
                F.coalesce(F.col("__root"), F.col(node_col)).alias(comp_col),
            )
            .localCheckpoint()
        )
    finally:
        _release_local_checkpoint(edges)
        _release_local_checkpoint(nodes)
    return labels


def _release_local_checkpoint(df: DataFrame) -> None:
    # late import: dedup.py owns the release helper (and its measured
    # rationale); this module must stay import-light to avoid cycles.
    from jorvik_spark.queries.dedup import _release_local_checkpoint as rel

    rel(df)
