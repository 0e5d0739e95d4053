"""Cross-engine parity on a DIRTY corpus.

The driver testdata is clean; a real 100 TB crawl is not. These tests pin
the null-text contract (null document == empty document — tokenizers
normalize NULL to an empty array on BOTH engines) plus empty, whitespace-
only, unicode, single-token, and exact-duplicate rows, for every
documents-table operator with an oracle.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from jorvik_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import compare

ROWS = [
    (0, None, "en", "src0", 0),
    (1, "", "en", "src0", 0),
    (2, "   \t  \n ", "de", "src1", 8),
    (3, "héllo wörld céçi ünïcode tøkens", "fr", "src1", 31),
    (4, "one", "en", "src2", 3),
    (5, "dup dup dup dup dup", "en", "src2", 19),
    (6, "dup dup dup dup dup", "zh", "src0", 19),
    (7, "mail me a@b.co or see https://x.io/y now", "en", "src1", 40),
    # 8/9 share an 11-token verbatim passage at DIFFERENT offsets inside
    # different surrounding text — the passage-span dedup must report the
    # merged span per doc, not just flag the pair.
    (
        8,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
        " tail one",
        "en",
        "src0",
        75,
    ),
    (
        9,
        "head two alpha beta gamma delta epsilon zeta eta theta iota kappa"
        " lambda",
        "de",
        "src2",
        75,
    ),
]

DOC_QUERIES = [
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "text_scrub_pii",
    "text_repetition_ratio",
    "text_length_histogram",
    "text_token_bpe",
    "text_ngram_counts",
    "text_explode_positional",
    "text_rare_token_ratio",
    "dedup_exact",
    "dedup_cross_source",
    "dedup_ngram_jaccard",
    "dedup_minhash_banded",
    "dedup_minhash_components",
    "dedup_simhash",
    "decontaminate_overlap",
    "pack_sequences",
    "sample_stratified_split",
    "sample_domain_reweight",
    # The skewed dirty sources (3/3/2 docs) give sub-1.0 temperature
    # keep rates, so the thinning branch actually executes here (the
    # clean testdata's uniform sources all rate 1.0).
    "sample_temperature",
    "text_gopher_filter",
    "text_bigram_lm_score",
    "export_shard_assign",
    "corpus_domain_mix",
    "dedup_passage_spans",
    "dedup_remove_passages",
    "dedup_incremental_minhash",
    "decontaminate_bloom",
    "sample_quality_percentile",
    "export_length_bucketed",
    "corpus_curation_funnel",
    # Round-8 additions. boilerplate/ngram_fraction may resolve to the
    # empty set on this 10-doc corpus (df floor / split buckets) — both
    # engines must agree on that too; mixture_epochs exercises the
    # zero-token-source guard via src0's null/empty docs.
    "dedup_cluster_sizes",
    "dedup_quality_representative",
    "decontaminate_ngram_fraction",
    "text_boilerplate_ngrams",
    "corpus_mixture_epochs",
    # Batch-B round-8 additions. dedup_downweight partitions by md5(text)
    # where text is NULL on doc 0 — both engines must group the NULL key
    # into one cluster; ngram_novelty/simpson drop sub-shingle/empty docs
    # identically; source_gini exercises zero-length rows inside a
    # nonzero-total source.
    "sample_dedup_downweight",
    "text_ngram_novelty",
    "text_simpson_diversity",
    "corpus_source_gini",
    # Batch-C: reservoir N exceeds every dirty source size (full ranking
    # must still agree); lm histogram drops sub-bigram docs identically.
    "sample_reservoir_per_source",
    "text_lm_score_histogram",
    # Batch-D: the null-text doc dedups against itself only (md5(NULL) is
    # NULL — never equi-joins another doc on either engine) and its
    # zero-token source path exercises the removed_ppm division guard.
    "corpus_dedup_impact",
    # Banding eval on a corpus where truth is tiny but nonempty (the
    # identical-text pair and the shared-passage pair): the ppm ratios
    # and the zero-guard arithmetic must agree exactly.
    "dedup_banding_recall_eval",
    # Round-9 text additions: tfidf must drop the null/empty-text docs
    # (no tokens → no tf rows) and rank ties by term identically;
    # chunking must emit ZERO chunks for them while short docs still
    # produce their single clipped chunk.
    "text_tfidf_topterms",
    "text_chunk_overlap",
    # composite over the chunk table: the identical 5-token dup docs
    # produce fingerprint-equal chunks across sources, and null/empty
    # docs contribute zero chunks to their source's denominator.
    "corpus_chunk_dedup_rate",
    # Round-10 additions: the confusion matrix must bucket null/empty
    # docs under the zero-hit tiebreak language identically, and the
    # class balancer's n_min floor comes from the SMALLEST dirty class
    # (1 doc) — every class keeps exactly one row, md5 pick agreeing.
    "text_langid_confusion",
    "sample_balanced_classes",
    # Round-11 additions: containment pairs on the identical 5-token
    # dup docs (containment exactly 1.0 both directions) while null/
    # empty docs shingle to nothing; the vocab OOV rate where the whole
    # 10-doc vocabulary fits under K (OOV must be exactly zero — both
    # engines agreeing on the degenerate case); the KS drift where
    # single-doc sources hit the n1 = 1 denominator path and src0's
    # zero-length null/empty docs stack one CDF step.
    "dedup_containment_ngram",
    "text_vocab_oov_rate",
    "corpus_drift_ks",
    # round 12: the rank-octave census on a 10-doc vocabulary (every
    # token in octaves 1-4; null/empty docs contribute zero tokens)
    "text_zipf_rank_census",
    # wave 2: overlap on sources holding null/empty docs (zero vocab
    # contribution) and the cross-source exact-dup pair; the token
    # budget where every dirty source fits inside one budget.
    "corpus_source_overlap",
    "sample_token_budget",
    # fold integrity on single-doc sources: every dirty source must
    # land whole in one fold, md5 bucket agreeing across engines.
    "sample_group_kfold",
    # round 14: ARI and the gibberish screen must drop null/empty-text
    # docs identically (chars >= 1 / length >= 1 scope) and agree on
    # the clamp floors for degenerate one-word docs; the BPE pair table
    # must ignore docs that tokenize to nothing and midstream
    # single-char words (no pairs); LM importance sampling scores only
    # docs with >= 2 tokens — the same scope as the LM score itself —
    # with the min/max rate band exact on a tiny familiarity range.
    "text_readability_ari",
    "text_gibberish_score",
    "text_bpe_pair_counts",
    "sample_lm_importance",
    # round 15: the hapax census must count null/empty docs as zero
    # contribution (a source whose only doc is null still reports no
    # row, not a 0/0 division) and agree on single-token sources
    # (hapax_ppm = 1e6); the epoch shuffle plans EVERY doc — including
    # null-text ones (the plan keys on doc_id alone), positions
    # re-derivable from the salts on both engines.
    "text_hapax_legomena",
    "sample_epoch_shuffle",
    # wave 2: minhash decontamination must ignore docs that shingle to
    # nothing (null/empty/short texts have no bands, hence no row if
    # they land in the test split) and flag the cross-split exact-dup
    # pair on all 4 bands when the split buckets happen to straddle.
    "decontaminate_minhash",
    # round 16: the co-occurrence lift must tokenize null/empty docs to
    # nothing (no pairs), keep the unicode doc's distinct-token set
    # order identical under the lexicographic cap, and count the exact
    # duplicate pair as TWO supporting docs; the interleave plan keys
    # on (doc_id, source) alone, so null-text docs still get a slot and
    # every (slot, shard, round) re-derives from the salts on both
    # engines.
    "text_cooccurrence_lift_topk",
    "sample_interleave_sources",
]


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty")
    pd.DataFrame(
        ROWS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirty_con(dirty_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dirty_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_dirty_corpus_parity(spark, dirty_dir, dirty_con, name):
    compare(QUERIES[name](spark, dirty_dir), dirty_con, ORACLES[name], name)


def test_null_text_tokenizes_to_empty(spark, dirty_dir):
    """The contract itself: null and empty text produce zero tokens, not
    null stats."""
    stats = {
        r["doc_id"]: r
        for r in QUERIES["text_token_stats"](spark, dirty_dir).collect()
    }
    for doc_id in (0, 1, 2):  # null, empty, whitespace-only
        assert stats[doc_id]["n_tokens"] == 0
        assert stats[doc_id]["n_token_chars"] == 0


def test_passage_spans_merge_at_offsets(spark, dirty_dir):
    """Docs 8/9 share an 11-token passage at offsets 0 and 2: the four
    overlapping 8-gram hits per doc must merge into ONE maximal span
    covering exactly the shared passage, at each doc's own offset."""
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_span_tokens"])
        for r in QUERIES["dedup_passage_spans"](spark, dirty_dir).collect()
    }
    assert spans[8] == (0, 10, 11)
    assert spans[9] == (2, 12, 11)
    assert set(spans) == {8, 9}  # 5-token dup docs are below the window


EMB_QUERIES = [
    "simsearch_topk",
    "simsearch_ivf",
    "simsearch_lsh_det",
    "dedup_embedding_cosine",
    "embed_centroids",
    "embed_quantize_int8",
    "embed_pq_codes",  # keeps the zero vector (no norm), codes it too
    "simsearch_ivfpq",  # zero vector is never a candidate (IVF excludes)
    "simsearch_range",  # zero vector excluded (cosine undefined)
    "embed_dim_stats",  # keeps the zero vector (pure moments)
    "embed_whiten",  # zero vector whitened like any other (no cosine)
    "simsearch_recall_eval",  # zero vector in neither truth nor ANN set
    "embed_cluster_balance",  # zero vector excluded from the index
    "simsearch_rerank_twophase",  # zero vector in neither phase
    "embed_outlier_scores",  # zero vector has no k-NN list on either engine
    # round 12: history split/frozen quantizer on a corpus with a zero
    # vector (excluded from both history and incoming) and an exact dup
    # (cosine 1.0 must match deterministically); the census and sweep
    # must agree on the tiny-K floor path (12 pos-norm vectors, K = 8).
    "simsearch_incremental_ivf",
    "audit_ivf_cells",
    "simsearch_nprobe_sweep",
    # round-13 wave 2/3: the angular pair census and the split-half
    # centroid drift must both exclude the zero vector (cosine
    # undefined) and band/round identically on the exact-dup pair.
    "embed_angular_pair_census",
    "embed_centroid_split_drift",
    # round 14: the squared-norm census KEEPS the zero vector — it is
    # exactly the octave-0 dead-vector row the screen exists to expose.
    "embed_sqnorm_octave_census",
    # Hamming top-k also keeps the zero vector (packs to word 0 —
    # Hamming needs no norm); positional packing must produce
    # identical words for short/odd-dimension dirty vectors.
    "simsearch_hamming_topk",
    # round 15: the JL sketch KEEPS the zero vector (projects to the
    # all-zero sketch — no norm needed) and must quantize-then-project
    # identically on the exact-dup pair; the distortion census must
    # EXCLUDE zero-distance consecutive pairs (the exact dup) rather
    # than divide by zero, on both engines.
    "embed_rp16_sketch",
    "embed_jl_distortion_census",
    # round 16: the power iteration KEEPS the zero vector (it
    # contributes nothing to any column sum — never a division error)
    # and must quantize/rescale identically on the exact-dup pair; the
    # int8 recall eval EXCLUDES the zero vector from both the exact
    # truth and the quantized path (cosine undefined) and must agree on
    # the all-zero-code guard.
    "embed_power_iteration_pc1",
    "embed_int8_recall_eval",
]


@pytest.fixture(scope="module")
def dirty_emb_dir(tmp_path_factory):
    import numpy as np

    d = tmp_path_factory.mktemp("dirty_emb")
    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(64).astype("float32"), f"lab{i % 3}") for i in range(12)]
    rows.append((12, np.zeros(64, dtype="float32"), "lab0"))  # zero vector
    rows.append((13, rows[5][1].copy(), "lab1"))  # exact duplicate vector
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def dirty_emb_con(dirty_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{dirty_emb_dir}/embeddings.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_dirty_embeddings_parity(spark, dirty_emb_dir, dirty_emb_con, name):
    """A zero-norm embedding must not crash (ANSI DIVIDE_BY_ZERO) or
    diverge: cosine-based ops exclude degenerate vectors on both engines;
    quantization/centroids keep them."""
    compare(QUERIES[name](spark, dirty_emb_dir), dirty_emb_con, ORACLES[name], name)


EVENT_QUERIES = [
    "window_rank_per_user",
    "window_sessionize",
    "agg_funnel_steps",
    "agg_retention_cohort",
    "window_lag_lead",
    "window_running_sum",
    "window_moving_avg",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    # Interval join: null-ts and null-user rows are excluded on both
    # engines (no join window / no equi key).
    "stream_stream_join",
    # Stateful streaming dedup: null-ts rows PASS THROUGH (the watermark
    # gates state eviction, not row admission — a null event time dedups
    # by key like any other row and survives to the sink; the oracle is
    # the full distinct source). Pinned here so Spark-version or
    # watermark-semantics drift fails loudly instead of silently.
    "stream_dedup_watermark",
    # LEFT OUTER interval join: unmatched purchases null-pad; null-ts /
    # null-user rows excluded like the inner form.
    "stream_attribution_coverage",
    # mapInPandas z-score: a NULL value row must pass through with
    # z_bounded TRUE (no z is defined for it) and must NOT bias the
    # running moments for later rows (n counts non-null only) — the
    # oracle emits every event unconditionally.
    "udf_map_in_pandas",
    # stateful fixed-point totals: NULL values are skipped by the sum
    # (total stays NULL until a non-null arrives) but counted in
    # n_events — SQL SUM/COUNT(*) semantics on both engines.
    "stream_stateful_running_totals",
    # per-window HLL uniques: null-ts / null-user rows excluded; the
    # within-bound boolean must hold on tiny dirty windows too.
    "stream_window_unique_users",
    # time-weighted average: null-ts/null-value rows are screened BEFORE
    # the lead, so a NULL can neither anchor nor terminate a holding
    # interval; single-event users (no next event) drop out entirely.
    "window_time_weighted_avg",
    # sweep-line concurrency: null-ts events contribute no boundaries;
    # the drain-into-quiet-hour plateau case (base > base + max_r) and
    # the (t, delta, event_id) tie order must agree exactly.
    "window_peak_concurrency",
    # Round-10 additions. Markov: a transition FROM a null-TYPE event is
    # dropped on both engines (lag() yields NULL — indistinguishable from
    # a first event by design), while a transition TO it groups under the
    # NULL to_type key; null-ts rows can't be sequenced at all. Z-score:
    # the null-value purchase is screened before the frame, so it
    # neither flags nor biases later moments. Session census: user 7's
    # same-instant burst is a duration-0 session in bucket 0.
    "agg_markov_transitions",
    "window_anomaly_zscore",
    "window_session_duration_histogram",
]


@pytest.fixture(scope="module")
def dirty_events_dir(tmp_path_factory):
    import datetime

    d = tmp_path_factory.mktemp("dirty_events")
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    # "purchase" (not an arbitrary third type): the funnel, retention,
    # and stream-stream-join operators key on the view/click/purchase
    # vocabulary, and a type they never match would leave their
    # conversion/attribution branches vacuously checked on dirty data.
    rows = [
        (i, base + datetime.timedelta(minutes=7 * i), i % 3,
         ["click", "view", "purchase"][i % 3], float(i) * 1.5, None)
        for i in range(20)
    ]
    rows.append((20, None, 0, "click", 1.0, None))  # null ts
    rows.append((21, base, None, "view", 2.0, None))  # null user
    rows.append((22, base, 1, None, None, None))  # null type + value
    # user 7: every event at ONE instant — all holding intervals are
    # zero-length, so window_time_weighted_avg must emit NO row for the
    # user (the 0/0 case that aborts under ANSI if not screened), and
    # the concurrency sweep gets same-instant +1/-1 tie traffic.
    rows.append((23, base, 7, "view", 3.0, None))
    rows.append((24, base, 7, "click", 4.0, None))
    rows.append((25, base, 7, "purchase", 5.0, None))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirty_events_con(dirty_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{dirty_events_dir}/events.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_dirty_events_parity(spark, dirty_events_dir, dirty_events_con, name):
    """Null-ts events are excluded from every time-ordered operator on
    both engines (an event without a time cannot be placed in a window;
    leaving it in diverges — Spark windows drop it and sort nulls first,
    DuckDB buckets it as NULL and sorts nulls last)."""
    compare(
        QUERIES[name](spark, dirty_events_dir),
        dirty_events_con,
        ORACLES[name],
        name,
    )


REL_QUERIES = [
    "join_inner_equi",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "agg_group_stats",
    "agg_distinct",
    "agg_collect_set",
    # Streaming MERGE over orders with null payloads (o_totalprice,
    # o_orderstatus): the micro-batch upsert must agree with the
    # relational post-merge reconstruction on dirty rows too.
    "stream_foreachbatch_merge",
    # CDC apply with tombstones over the same dirty orders.
    "merge_cdc_delete",
    # Round-8 TPC-H shapes over the same dirty tables: q13's outer join
    # must bucket the never-ordered (and null-custkey) customers at
    # c_count=0 with the priority exclusion pushed pre-join; q22's anti
    # join must treat null o_custkey as matching nothing and null
    # c_acctbal as failing the threshold on both engines.
    "join_q13_custdist",
    "join_q22_idle_customers",
    # Correlated-subquery TPC-H shapes over the dirty tables: q4's
    # EXISTS date residual must treat null ship/order dates as
    # non-matching and group a null-priority order; q9 must skip
    # null-amount rows in the sum while still counting them; q12's
    # null-priority rows must land in NEITHER CASE bucket; q17's null
    # quantities must fail the integer threshold on both engines; q21
    # must exclude null supplier keys from the pair relation (the pinned
    # contract that keeps the windowed rewrite ≡ the EXISTS SQL).
    "join_q4_priority_exists",
    "join_q9_profit_proxy",
    "join_q12_late_lines",
    "join_q17_small_quantity",
    "join_q21_waiting_supplier",
    # The round-9 completions of the TPC-H family. q11: a null
    # extendedprice makes a NULL per-part sum that must fail the
    # threshold on both engines while COUNT(*) still counts the part;
    # q16: a NULL s_acctbal supplier is NOT flagged (NULL < 0 is not
    # TRUE) and a null p_size falls out of the IN list on both engines;
    # q20: a NULL p_name never matches LIKE 'red%', and an all-NULL
    # quantity pair yields a NULL total that fails the surge compare.
    "join_q11_important_stock",
    "join_q16_supplier_cnt",
    "join_q20_surplus_suppliers",
    # Count-min probe over orders with null custkeys: the null filter is
    # part of the operator contract (md5(NULL) would group separately
    # per-engine otherwise) — pinned here against the dirty orders.
    "agg_countmin_sketch",
    # Fuzzy blocked matching: null names/sizes leave the block before
    # pairing (levenshtein(NULL, x) is NULL → never in the band); the
    # size-4 block's "red drum"/"red dram" pair (distance 1) is the one
    # non-vacuous match, so an empty-result regression fails loudly.
    "join_fuzzy_name_blocked",
]


@pytest.fixture(scope="module")
def dirty_rel_dir(tmp_path_factory):
    import datetime

    d = tmp_path_factory.mktemp("dirty_rel")
    ts = datetime.datetime(1995, 3, 1)
    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5, 6, 7, 8],
            "o_custkey": pd.array(
                [10, 11, None, 12, 10, None, 13, None], dtype="Int64"
            ),
            "o_orderstatus": ["F", "O", None, "F", "O", "F", "F", "O"],
            "o_totalprice": [100.0, None, 50.0, 75.0, 20.0, 30.0, 60.0, None],
            "o_orderdate": pd.to_datetime(
                [ts] * 5
                + [None]
                + [
                    datetime.datetime(1996, 2, 1),
                    datetime.datetime(1996, 3, 15),
                ]
            ).as_unit("us"),
            "o_orderpriority": [
                "1-URGENT", "3-MEDIUM", None, "2-HIGH", "5-LOW", "1-URGENT",
                "1-URGENT", None,
            ],
        }
    ).to_parquet(str(d / "orders.parquet"))
    # Lineitem exercises every null the new TPC-H shapes must agree on:
    # null shipdate (lateness residual → non-match), null suppkey
    # (excluded from q21's pair relation by pinned contract), null
    # partkey (join-dropped), null quantity/price/discount (skipped by
    # sums, dropped by the q17 threshold), null linestatus (its own q12
    # group), null orderkey (joins nothing anywhere).
    dt = datetime.datetime
    pd.DataFrame(
        {
            # Rows 15-20 activate the q11/q16/q20 completions: supplier
            # 54 (bloc nation NATION_2) ships parts 105/101/102 with one
            # null price (q11's NULL-sum pin), supplier 50 surges on red
            # part 107 in 1999 (q20), flagged supplier 53 ships an
            # eligible part (q16's NOT IN), and a null quantity lands on
            # a 1999 row (q20's NULL-total pin).
            # Row 21 is q16's NULL-probe pin: an ELIGIBLE part (106)
            # shipped also by a null-suppkey row. NOT IN and anti join
            # disagree on that row, so the operator declares null pairs
            # out of scope on both engines — the group must count only
            # supplier-53's (flagged, excluded) and never a 0-count row.
            "l_orderkey": pd.array(
                [1, 1, 2, 3, 4, 6, 1, 5, 4, 2, 3, 6, 7, 8, None,
                 9, 9, 9, 9, 9, 9, 9],
                dtype="Int64",
            ),
            "l_partkey": pd.array(
                [100, 101, 100, None, 100, 102, 100, 103, 100, 101, 102,
                 100, 100, 103, 100, 105, 107, 105, 101, 102, 106, 106],
                dtype="Int64",
            ),
            "l_suppkey": pd.array(
                [50, 51, 50, None, 52, 50, 50, None, 52, 51, 52, 50, 50,
                 52, 50, 54, 50, 52, 54, 54, 53, None],
                dtype="Int64",
            ),
            "l_quantity": [10.0, 20.0, 5.0, None, 40.0, 1.0, 2.0, 3.0,
                           7.0, 9.0, 4.0, 6.0, 3.0, 2.0, 1.0,
                           8.0, 5.0, None, 1.0, 1.0, 3.0, 2.0],
            "l_extendedprice": [100.0, 200.0, None, 50.0, 80.0, 10.0,
                                60.0, 30.0, 70.0, 90.0, 40.0, 55.0, 33.0,
                                22.0, 5.0, 40.0, 12.0, 10.0, 10.0, None,
                                9.0, 4.0],
            "l_discount": [0.1, 0.0, None, 0.1, 0.2, 0.0, 0.0, 0.0, 0.0,
                           0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                           0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            "l_linestatus": ["F", "O", None, "F", "F", "F", "F", "O", "F",
                             "O", None, "F", "F", "O", "F",
                             "F", "O", "F", "F", "O", "O", "F"],
            "l_shipdate": pd.to_datetime(
                [
                    dt(1995, 7, 1), dt(1995, 3, 15), None, dt(1995, 8, 1),
                    dt(1995, 9, 1), dt(1995, 4, 1), dt(1995, 3, 2),
                    dt(1995, 3, 5), dt(1997, 6, 1), dt(1997, 8, 1),
                    dt(1997, 5, 1), dt(1997, 3, 1), dt(1996, 6, 1),
                    dt(1996, 8, 1), dt(1995, 5, 1),
                    dt(1999, 6, 1), dt(1999, 7, 1), dt(1999, 5, 1),
                    dt(1997, 2, 1), dt(1997, 4, 1), dt(1996, 5, 1),
                    dt(1996, 7, 1),
                ]
            ).as_unit("us"),
        }
    ).to_parquet(str(d / "lineitem.parquet"))
    # Parts 104-107: a Brand#1 red part (q16 brand exclusion), two
    # q16-eligible sizes (4, 15, 22), and a null-name part that q20's
    # LIKE must drop even though 106 IS shipped.
    pd.DataFrame(
        {
            "p_partkey": [100, 101, 102, 103, 104, 105, 106, 107],
            "p_name": ["red widget", "blue bolt", None, "red gear",
                       "red drum", "red dram", None, "red pump"],
            "p_brand": ["Brand#4", "Brand#4", None, "Brand#2",
                        "Brand#1", "Brand#3", "Brand#5", "Brand#6"],
            "p_type": ["STANDARD", "PROMO", "ECONOMY", "MEDIUM",
                       "STANDARD", "STANDARD", "LARGE", "SMALL"],
            "p_size": pd.array(
                [12, 20, 5, None, 4, 4, 15, 22], dtype="Int64"
            ),
            "p_retailprice": [10.0, None, 20.0, 5.0, 3.0, 6.0, 7.0, 8.0],
        }
    ).to_parquet(str(d / "part.parquet"))
    # 53: negative balance → q16-flagged; 54: q11 bloc-nation supplier.
    pd.DataFrame(
        {
            "s_suppkey": [50, 51, 52, 53, 54],
            "s_name": ["S50", "S51", "S52", "S53", "S54"],
            "s_nationkey": pd.array([6, None, 9, 9, 12], dtype="Int64"),
            "s_acctbal": [100.0, 50.0, None, -5.0, 10.0],
        }
    ).to_parquet(str(d / "supplier.parquet"))
    pd.DataFrame(
        {
            "n_nationkey": [6, 9, 11, 12],
            "n_name": ["NATION_6", "NATION_9", "NATION_11", "NATION_2"],
            "n_regionkey": [1, 4, 1, 4],
        }
    ).to_parquet(str(d / "nation.parquet"))
    pd.DataFrame(
        {
            "r_regionkey": [1, 4],
            "r_name": ["ASIA", "EUROPE"],
        }
    ).to_parquet(str(d / "region.parquet"))
    pd.DataFrame(
        {
            "c_custkey": [10, 11, 13],
            "c_name": ["a", None, "c"],
            "c_nationkey": pd.array([1, None, 2], dtype="Int64"),
            "c_mktsegment": ["BUILDING", "AUTOMOBILE", None],
            "c_acctbal": [1.0, 2.0, None],
        }
    ).to_parquet(str(d / "customer.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirty_rel_con(dirty_rel_dir):
    con = duckdb.connect()
    for t in (
        "orders", "customer", "lineitem", "part", "supplier", "nation",
        "region",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dirty_rel_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", REL_QUERIES)
def test_dirty_relational_parity(spark, dirty_rel_dir, dirty_rel_con, name):
    """Null join keys, null group keys, null measures, and an all-null
    collect_set group must agree across engines (nulls never equi-match;
    null groups group together; aggregates skip null measures; an
    all-null set collapses to the empty string, not NULL)."""
    compare(
        QUERIES[name](spark, dirty_rel_dir), dirty_rel_con, ORACLES[name], name
    )


def test_zorder_null_keys_share_null_bucket(spark, tmp_path_factory):
    """Null join keys must not crash the Morton interleave or diverge:
    both engines agree a null-keyed row lands in one shared null bucket
    (a real pipeline routes those rows; the layout must stay total)."""
    import tempfile

    d = tempfile.mkdtemp(prefix="dirty_zorder_")
    pd.DataFrame(
        {
            "l_orderkey": pd.array([1, 2, None], dtype="Int64"),
            "l_partkey": pd.array([10, None, 5], dtype="Int64"),
            "l_linenumber": [1, 1, 1],
            "l_quantity": [1.0, 1.0, 1.0],
            "l_returnflag": ["N", "N", "N"],
        }
    ).to_parquet(f"{d}/lineitem.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet')"
    )
    try:
        compare(
            QUERIES["sink_zorder_layout"](spark, d),
            con,
            ORACLES["sink_zorder_layout"],
            "sink_zorder_layout",
        )
    finally:
        con.close()


def test_remove_passages_cuts_exactly_the_shared_span(spark, dirty_dir):
    """Docs 8/9 (13 tokens each, sharing an 11-token passage) must keep
    exactly their 2 non-shared tokens; untouched docs keep everything."""
    got = {
        r["doc_id"]: r["n_kept_tokens"]
        for r in QUERIES["dedup_remove_passages"](spark, dirty_dir).collect()
    }
    assert got[8] == 2 and got[9] == 2
    assert got[3] == 5  # unicode doc, no dup spans: full token count
    assert got[0] == 0 and got[1] == 0  # null/empty docs present, 0 kept


def test_curation_funnel_attrition_on_dirty_rows(spark, dirty_dir):
    """The funnel must attribute each dirty row to the right gate:
    null/empty/whitespace docs to non_empty, the 1-token doc to the
    length window, the all-dup-bigram docs to the repetition gate."""
    rows = {
        r["stage_name"]: (r["n_surviving"], r["n_dropped_here"])
        for r in QUERIES["corpus_curation_funnel"](spark, dirty_dir).collect()
    }
    assert rows["raw"] == (10, 0)
    assert rows["non_empty"] == (7, 3)  # docs 0, 1, 2
    assert rows["length_window"] == (6, 1)  # doc 4 ("one")
    assert rows["repetition_gate"] == (4, 2)  # docs 5, 6 (dup dup ...)
    assert rows["exact_dedup"] == (4, 0)  # the dup pair already fell


def test_drift_ks_single_source_corpus_agrees_on_null(
    spark, tmp_path_factory
):
    """Degenerate one-source corpus: the leave-one-out KS denominator
    n1·(n−n1) is zero. Both engines must agree on a declared NULL
    ks_ppm (nullif guard) instead of diverging NULL-row vs
    division-by-zero error (round-11 ADVICE item)."""
    d = tmp_path_factory.mktemp("single_source")
    pd.DataFrame(
        [(i, f"doc {i}", "en", "only", 10 + i) for i in range(6)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        compare(
            QUERIES["corpus_drift_ks"](spark, str(d)),
            con,
            ORACLES["corpus_drift_ks"],
            "corpus_drift_ks_single_source",
        )
        row = QUERIES["corpus_drift_ks"](spark, str(d)).collect()
        assert len(row) == 1 and row[0]["ks_ppm"] is None
    finally:
        con.close()
