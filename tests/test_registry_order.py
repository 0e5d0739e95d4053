"""Guards for the driver-check registration order.

The verification driver records CORRECTNESS rows for exactly the first 50
entries of ``queries()``. Rounds 3-5 lost coverage because the intended
rotation of ``_CHECK_PRIORITY`` never landed; these tests make the prefix
an asserted invariant instead of a comment.
"""

from jorvik_spark.queries import ORACLES, QUERIES, _CHECK_PRIORITY

DRIVER_PREFIX = 50

# Rows-only by design: engine-specific hash families / HLL sketches /
# partitioning-dependent state that an ANSI-SQL oracle cannot reproduce
# value-for-value. They already carry their rows-only driver records and
# must not occupy checked-prefix slots. (dedup_simhash left this set in
# round 6 when its hash family moved to cross-engine md5.)
ROWS_ONLY = {
    "agg_approx_distinct",
    "udf_map_in_pandas",
    "simsearch_lsh",
    "dedup_minhash_lsh",
}

# Round-8 exception: these two are also rows-only by design (HLL sketch
# internals / iterative BPE merge table have no ANSI-SQL twin — both are
# verified by error-bound / brute-force-Python tests instead) but shipped
# in round 7 and have NEVER had a driver record of any kind. They hold
# prefix slots this one round to collect their first rows-only driver
# row, then rotate back out.
ROWS_ONLY_FIRST_EVIDENCE = {
    "agg_hll_rollup",
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
    # Sole exception: ROWS_ONLY_FIRST_EVIDENCE entries collecting their
    # first-ever (rows-only) driver record this round.
    no_oracle = [
        n
        for n in _CHECK_PRIORITY
        if n not in ORACLES and n not in ROWS_ONLY_FIRST_EVIDENCE
    ]
    assert not no_oracle
    assert not (set(_CHECK_PRIORITY) & ROWS_ONLY)


def test_first_evidence_rows_only_in_prefix_this_round():
    # They exist precisely to pick up a driver row — being outside the
    # prefix would silently defeat the rotation's purpose.
    assert ROWS_ONLY_FIRST_EVIDENCE <= set(_CHECK_PRIORITY)
    assert not (ROWS_ONLY_FIRST_EVIDENCE & set(ORACLES))


def test_rows_only_queries_still_registered():
    # Demoted from the prefix, but they must remain in queries() so the
    # rows-only driver check (and local tests) still exercise them.
    missing = [n for n in ROWS_ONLY if n not in QUERIES]
    assert not missing
