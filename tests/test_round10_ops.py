"""Round-10 operator tests: the sampled Spearman calibration mode and
the banded-shingle fuzzy-name blocking upgrade. Oracle parity for the
exact forms runs through tests/test_oracle_parity.py; these pin the
sampled/blocked paths the hash compare can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jorvik_spark.queries.registry import hash_bucket
from jorvik_spark.queries.text_analysis import (
    corpus_quality_rank_correlation,
    text_bigram_lm_score,
)
from jorvik_spark.tables import default_sf_dir, load_table

SF_DIR = default_sf_dir()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_spearman_sampled_rejects_bad_permille(spark):
    for bad in (0, 1000, -5):
        with pytest.raises(ValueError):
            corpus_quality_rank_correlation(
                spark, SF_DIR, sample_permille=bad
            )


def test_spearman_sampled_deterministic_and_proportional(spark):
    a = _rows(
        corpus_quality_rank_correlation(spark, SF_DIR, sample_permille=500)
    )
    b = _rows(
        corpus_quality_rank_correlation(spark, SF_DIR, sample_permille=500)
    )
    assert a == b  # hash-mod subset: no RNG state, replay-identical

    exact_n = sum(
        r["n_docs"]
        for r in corpus_quality_rank_correlation(spark, SF_DIR).collect()
    )
    samp_n = sum(r[1] for r in a)
    # permille=500 over independent md5 buckets: binomially concentrated
    # around half the corpus (sources with n<2 drop from BOTH forms).
    assert 0.35 * exact_n <= samp_n <= 0.65 * exact_n


def test_spearman_sample_is_length_unbiased(spark):
    """The hash-mod subset must not correlate with the variable being
    ranked: mean n_chars of the sampled docs stays near the corpus mean
    (a length-biased sampler would invalidate the calibration the query
    exists to measure)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    full = docs.agg(F.avg("n_chars")).first()[0]
    samp = (
        docs.filter(hash_bucket(F.col("doc_id"), "spearman:") < 500)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert samp == pytest.approx(full, rel=0.25)


def test_passjoin_blocking_is_complete(spark):
    """The pigeonhole guarantee, asserted: the PassJoin-blocked result
    equals the brute-force all-pairs edit-distance truth exactly — the
    blocker may only PRUNE candidates that cannot match, never drop a
    true pair (this is what the rejected MinHash-band blocker failed:
    19% recall measured on this vocabulary)."""
    from jorvik_spark.queries.joins import join_fuzzy_name_passjoin

    got = {
        (r["name_a"], r["name_b"]): (r["distance"], r["n_pairs"])
        for r in join_fuzzy_name_passjoin(spark, SF_DIR).collect()
    }

    names = (
        load_table(spark, SF_DIR, "part")
        .filter(F.col("p_name").isNotNull() & (F.length("p_name") >= 4))
        .groupBy("p_name")
        .count()
        .collect()
    )
    counts = {r["p_name"]: r["count"] for r in names}

    def _ed(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    truth = {}
    keys = sorted(counts)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            d = _ed(a, b)
            if 1 <= d <= 3:
                truth[(a, b)] = (d, counts[a] * counts[b])
    assert got == truth


def test_spearman_sampled_is_exact_statistic_over_subset(spark):
    """Sampling must change WHICH docs are ranked, never HOW: the
    sampled query's output equals a brute-force Python Spearman over
    the same deterministic doc subset, value for value."""
    permille = 500
    fam = {
        r["doc_id"]: r["familiarity_ppm"]
        for r in text_bigram_lm_score(spark, SF_DIR).collect()
    }
    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(hash_bucket(F.col("doc_id"), "spearman:") < permille)
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    by_source: dict[str, list] = {}
    for r in docs:
        if r["doc_id"] in fam:  # scored docs only (>=2 tokens)
            by_source.setdefault(r["source"], []).append(
                (r["doc_id"], fam[r["doc_id"]], r["n_chars"])
            )
    expected = {}
    for source, rows in by_source.items():
        n = len(rows)
        if n < 2:
            continue
        rf = {
            d: i + 1
            for i, (d, _, _) in enumerate(
                sorted(rows, key=lambda t: (t[1], t[0]))
            )
        }
        rl = {
            d: i + 1
            for i, (d, _, _) in enumerate(
                sorted(rows, key=lambda t: (t[2], t[0]))
            )
        }
        sd2 = sum((rf[d] - rl[d]) ** 2 for d, _, _ in rows)
        expected[source] = (n, 1_000_000 - (6_000_000 * sd2) // (n**3 - n))

    got = {
        r["source"]: (r["n_docs"], r["spearman_ppm"])
        for r in corpus_quality_rank_correlation(
            spark, SF_DIR, sample_permille=permille
        ).collect()
    }
    assert got == expected
