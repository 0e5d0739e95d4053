"""Guards for the driver-check registration order.

The verification driver records CORRECTNESS rows for exactly the first 50
entries of ``queries()``. Rounds 3-5 lost coverage because the intended
rotation of ``_CHECK_PRIORITY`` never landed; these tests make the prefix
an asserted invariant instead of a comment.
"""

from jorvik_spark.queries import ORACLES, QUERIES, _CHECK_PRIORITY

DRIVER_PREFIX = 50

# Rows-only by design: the ONE remaining query whose output an ANSI-SQL
# oracle cannot reproduce value-for-value (iterative BPE merge table,
# learned on Spark's own ordering; brute-force-Python-verified in
# tests/test_llm_ops.py, rows-only driver row on file from round 8).
# Round 9 upgraded the other four former members — agg_approx_distinct,
# udf_map_in_pandas, dedup_minhash_lsh, simsearch_lsh (plus
# agg_hll_rollup) — to hash-mode deterministic projections (exact counts
# + within-bound booleans), so they now hold checked-prefix slots.
ROWS_ONLY = {
    "text_bpe_train",
}


def test_driver_prefix_matches_check_priority():
    assert list(QUERIES)[:DRIVER_PREFIX] == _CHECK_PRIORITY[:DRIVER_PREFIX]


def test_check_priority_has_exactly_driver_prefix_entries():
    assert len(_CHECK_PRIORITY) == DRIVER_PREFIX
    assert len(set(_CHECK_PRIORITY)) == DRIVER_PREFIX


def test_check_priority_entries_all_registered():
    missing = [n for n in _CHECK_PRIORITY if n not in QUERIES]
    assert not missing


def test_checked_prefix_is_fully_hash_checkable():
    # Every slot in the checked prefix should be a query the driver can
    # value-hash against its oracle — rows-only queries waste the slot.
    no_oracle = [n for n in _CHECK_PRIORITY if n not in ORACLES]
    assert not no_oracle
    assert not (set(_CHECK_PRIORITY) & ROWS_ONLY)


def test_rows_only_queries_still_registered():
    # Demoted from the prefix, but they must remain in queries() so the
    # rows-only driver check (and local tests) still exercise them.
    missing = [n for n in ROWS_ONLY if n not in QUERIES]
    assert not missing
