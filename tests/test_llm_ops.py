"""Semantic tests for the rows-only §2C operators (the ones whose hash
families are engine-specific and therefore carry no DuckDB oracle): the
LSH dedup must find the seeded near-duplicate pairs that the exact
Jaccard query (oracle-verified) finds; SimHash must be deterministic;
the multimodal pipeline must produce the declared schema and stable fake
features.
"""

import os

import pytest

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from jorvik_spark.tables import default_sf_dir

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", default_sf_dir())
_QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def exact_pairs(spark):
    rows = _QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    return {(r.doc_a, r.doc_b) for r in rows}


def test_minhash_lsh_clusters_seeded_dups(spark, exact_pairs):
    """The LSH eval row must report full label coverage and the recall
    bound met on a non-vacuous ground truth (exact Jaccard ≥ 0.6 pairs
    exist at this SF — seeded near-dups guarantee it). Measured component
    recall is 1.00 at sf0.001/0.01/0.1; the query pins ≥ 0.85."""
    [row] = _QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    assert row.n_docs > 0
    assert row.labels_cover_all
    assert row.recall_ok
    if exact_pairs:  # ≥0.8 pairs are a subset of the ≥0.6 ground truth
        assert row.n_true_pairs >= len(exact_pairs)


def test_simhash_deterministic(spark):
    a = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in _QUERIES["dedup_simhash"](spark, SF_DIR).collect()
    }
    b = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in _QUERIES["dedup_simhash"](spark, SF_DIR).collect()
    }
    assert a == b


def test_simsearch_topk_shape(spark):
    rows = _QUERIES["simsearch_topk"](spark, SF_DIR).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == {0, 1, 2, 3, 4}
    for q, rs in by_query.items():
        assert len(rs) == 5
        ranks = sorted(r.rank for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        ordered = sorted(rs, key=lambda r: r.rank)
        cosines = [r.cosine for r in ordered]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.candidate_id != q for r in rs)


def test_simsearch_lsh_subset_of_truth(spark):
    """The LSH eval row: every LSH probe pair must be a true pair
    (precision exact by construction — the join re-checks raw distance),
    recall must clear the pinned floor (measured 0.951/0.980/0.978 at
    sf0.001/0.01/0.1), and the ground truth must be non-vacuous."""
    [row] = _QUERIES["simsearch_lsh"](spark, SF_DIR).collect()
    assert row.n_true_pairs > 0
    assert row.recall_ok
    assert row.precision_ok


def test_multimodal_binary_scan(spark):
    rows = _QUERIES["multimodal_binary_scan"](spark, SF_DIR).collect()
    names = {r.path.rsplit("/", 1)[-1] for r in rows}
    assert "documents.parquet" in names
    assert all(r.length > 0 for r in rows)


def test_multimodal_feature_extract_deterministic(spark):
    df = _QUERIES["multimodal_feature_extract"](spark, SF_DIR)
    assert df.columns == [
        "path", "n_bytes", "content_sha256", "fake_width", "fake_height",
        "decode_skipped",
    ]
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in df.collect()}
    assert a == b
    for r in a:
        if not r[5]:
            assert 1 <= r[3] <= 64 and 1 <= r[4] <= 64


def test_multimodal_feature_extract_blob_size_guard(spark):
    """Blobs over _MAX_DECODE_BYTES must surface as flagged metadata-only
    rows with null features — never decoded — and every file must appear
    exactly once either way. sf0.01's lineitem.parquet (~1 MB) exceeds
    the 512 KiB cap, so the skip path carries real rows at the
    driver-checked scale."""
    from jorvik_spark.queries.multimodal import _MAX_DECODE_BYTES

    rows = _QUERIES["multimodal_feature_extract"](
        spark, default_sf_dir("sf0.01")
    ).collect()
    skipped = {r.path.rsplit("/", 1)[-1] for r in rows if r.decode_skipped}
    decoded = {r.path.rsplit("/", 1)[-1] for r in rows if not r.decode_skipped}
    assert "lineitem.parquet" in skipped
    assert "documents.parquet" in decoded
    assert not (skipped & decoded)
    for r in rows:
        if r.decode_skipped:
            assert r.n_bytes > _MAX_DECODE_BYTES
            assert r.content_sha256 is None
            assert r.fake_width is None and r.fake_height is None
        else:
            assert r.n_bytes <= _MAX_DECODE_BYTES
            assert r.content_sha256 is not None


def test_simsearch_ivf_recall_on_clustered_fixture(spark, tmp_path):
    """IVF (nprobe=2) must recover ALL exact top-5 neighbors on a corpus
    with genuine cluster structure — the mechanism guard a broken cell
    assignment (recall → ~nprobe/K) cannot pass.

    History: this test used to assert recall ≥ 0.6 on the sf0.001
    corpus, where it measured 0.96 — but that number was EVALUATION
    LEAKAGE: under the old first-K-by-id centroid seed, the evaluation
    queries (vec_id < 5) were literally centroids 0..4, so each query's
    home cell was centered on itself. The round-13 hash-spread seed
    (similarity._SQL_SEED_RANK) removed the leakage and exposed the
    honest corpus recall: ~0.28 at sf0.001 — barely above the 2/8
    coverage baseline, because the synthetic embeddings carry no
    cluster structure for IVF to exploit. Corpus recall on
    structureless data is noise, not a contract; THIS fixture is the
    contract: 8 tight, well-separated clusters (ids shuffled so id
    order is uncorrelated with cluster — the exact failure mode the
    hash-spread seed exists for). Every cluster member lands in one
    home cell whichever 8 seeds md5 picks, so exact top-5 ⊆ probed
    cells and recall is deterministically 1.0."""
    import numpy as np

    rng = np.random.default_rng(13)
    dim, n_clusters, per = 16, 8, 8
    ids = rng.permutation(n_clusters * per)
    rows = []
    for j, vid in enumerate(ids):
        c = j % n_clusters
        base = np.zeros(dim)
        base[2 * c] = 10.0
        base[2 * c + 1] = 3.0
        vec = base + rng.normal(0, 0.05, dim)
        rows.append((int(vid), [float(x) for x in vec], c))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))

    exact = {
        (r.query_id, r.candidate_id)
        for r in _QUERIES["simsearch_topk"](spark, str(tmp_path)).collect()
    }
    ivf = {
        (r.query_id, r.candidate_id)
        for r in _QUERIES["simsearch_ivf"](spark, str(tmp_path)).collect()
    }
    assert len(exact) == 25  # 5 queries x top-5
    assert len(exact & ivf) / len(exact) == 1.0


def test_sample_frames_deterministic_and_strided():
    """Frame sampler contract: frame count = ceil((1 + n%7)/stride),
    indices are the even ones, digests deterministic in (content, idx)."""
    from jorvik_spark.queries.multimodal import sample_frames

    content = b"\x01\x02video-ish-bytes\xff" * 3
    frames = sample_frames(content)
    n_frames = 1 + len(content) % 7
    assert [f["frame_idx"] for f in frames] == list(range(0, n_frames, 2))
    assert frames == sample_frames(content)  # deterministic
    assert all(len(f["frame_sha256"]) == 64 for f in frames)
    # different content -> different digests
    other = sample_frames(content + b"x")
    assert frames[0]["frame_sha256"] != other[0]["frame_sha256"]


def test_chunk_audio_no_zero_sample_trailing_chunk():
    """Chunk count is ceil(n_samples / SR) floored at 1: a blob whose
    sample count is an exact multiple of the rate must NOT emit a
    trailing zero-sample chunk (the old 1 + n // SR formula did), and
    every emitted chunk except a lone empty-blob marker carries
    samples."""
    from jorvik_spark.queries.multimodal import (
        _AUDIO_BYTES_PER_SAMPLE,
        _AUDIO_MAX_CHUNKS,
        _AUDIO_SR,
        chunk_audio,
    )

    exact_second = b"\x00" * (_AUDIO_SR * _AUDIO_BYTES_PER_SAMPLE)
    chunks = chunk_audio(exact_second)
    assert len(chunks) == 1
    assert chunks[0]["n_chunk_samples"] == _AUDIO_SR

    one_more = chunk_audio(exact_second + b"\x00" * _AUDIO_BYTES_PER_SAMPLE)
    assert len(one_more) == 2
    assert [c["n_chunk_samples"] for c in one_more] == [_AUDIO_SR, 1]

    empty = chunk_audio(b"")
    assert len(empty) == 1 and empty[0]["n_chunk_samples"] == 0

    huge = chunk_audio(exact_second * (2 * _AUDIO_MAX_CHUNKS))
    assert len(huge) == _AUDIO_MAX_CHUNKS  # cap still binds
    assert all(c["n_chunk_samples"] == _AUDIO_SR for c in huge)


def test_frame_sample_query_schema_and_multiplicity(spark):
    """1:N explode: at least one file yields >1 frame row, schema as
    declared, every path from the binary scan appears."""
    df = _QUERIES["multimodal_frame_sample"](spark, SF_DIR)
    rows = df.collect()
    assert df.columns == ["path", "frame_idx", "frame_sha256"]
    per_path = {}
    for r in rows:
        per_path[r.path] = per_path.get(r.path, 0) + 1
    n_files = len(per_path)
    assert n_files >= 5  # the sf dir has >=10 parquet files
    assert len(rows) >= n_files  # 1:N, never losing a file


def test_shard_assign_is_contiguous_partition(spark):
    """Shard assignment must be a partition of the corpus (every doc in
    exactly one shard) with pos_in_shard a contiguous 1..n run per shard
    — the invariant a training-data reader relies on to detect truncated
    or duplicated export shards."""
    rows = _QUERIES["export_shard_assign"](spark, SF_DIR).collect()
    n_docs = _QUERIES["corpus_domain_mix"](spark, SF_DIR).agg(
        {"n_docs": "sum"}
    ).collect()[0][0]
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


def test_shard_assign_deterministic_across_invocations(spark):
    """The assignment is a pure function of doc_id — the ordering key
    (md5 of a salted doc_id) is a total order per shard, so two
    independent plan executions must agree exactly. (The shuffle layout
    between them differs; ties would surface here as flapping
    pos_in_shard values.)"""
    a = {
        (r.doc_id, r.shard, r.pos_in_shard)
        for r in _QUERIES["export_shard_assign"](spark, SF_DIR).collect()
    }
    b = {
        (r.doc_id, r.shard, r.pos_in_shard)
        for r in _QUERIES["export_shard_assign"](spark, SF_DIR).collect()
    }
    assert a == b


def test_repetition_ratio_bounds_and_gate(spark):
    """Ratios live in [0, 1); the pass gate must equal the recomputed
    threshold comparison on the reported (rounded) ratio up to the
    rounding step."""
    rows = _QUERIES["text_repetition_ratio"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_token_ratio < 1.0
        assert 0.0 <= r.dup_bigram_ratio < 1.0
        # duplicated bigrams imply duplicated tokens (a repeated bigram
        # repeats both constituent tokens), so token repetition should
        # not be lower when bigram repetition is high
        if r.dup_bigram_ratio > 0:
            assert r.dup_token_ratio > 0
        if r.passes_repetition == 0:
            assert r.dup_bigram_ratio > 0.5 - 1e-6


def test_cross_source_dups_found_at_sf01(spark):
    """The sf0.1 corpus seeds 8 exact-duplicate groups (which always
    share a lead fingerprint) plus shared-lead near-dup templates; the
    provenance report must be non-empty at EVERY test SF — the r3-r6
    vacuity finding was an exact-content key whose driver check was an
    empty-set hash match below sf0.1."""
    for sf_dir, min_groups in (
        (default_sf_dir(), 1),
        ("/root/testdata/sf0.1", 8),  # skipped when absent (sandbox-only)
    ):
        if not os.path.isdir(sf_dir):
            continue
        rows = _QUERIES["dedup_cross_source"](spark, sf_dir).collect()
        assert len(rows) >= min_groups, sf_dir
        for r in rows:
            assert r.n_sources > 1
            assert r.n_copies >= r.n_sources


def test_repeated_invocations_do_not_leak_cached_plans(spark):
    """Intermediate caches are memoized per (key, session): calling the
    same query N times must reuse one persisted plan, not pin N copies
    of the corpus in executor memory (the round-5 persist-leak finding)."""
    from jorvik_spark.queries import QUERIES

    sf = default_sf_dir()
    names = (
        "text_token_bpe", "text_rare_token_ratio", "dedup_simhash",
        "dedup_minhash_banded", "dedup_minhash_components",
    )
    for name in names:
        QUERIES[name](spark, sf).count()
    baseline = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    for _ in range(3):
        for name in names:
            QUERIES[name](spark, sf).count()
    # A leak is GROWTH per repeat; <= (not ==) because the ContextCleaner
    # asynchronously reclaims the fixpoint loops' superseded localCheckpoint
    # RDDs once their Python references drop, so the count may legitimately
    # shrink between the baseline snapshot and the final one.
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() <= baseline


def test_hot_shingle_cap_bounds_boilerplate_self_join(spark, tmp_path):
    """2,000 docs sharing a 22-token boilerplate header: every header
    shingle has document frequency 2,000 — 20x the _MAX_SHINGLE_DF cap.
    Without the cap the inverted-index self-join explodes to ~20 x 2000^2
    candidate rows AND reports every pair as a near-dup (uncapped Jaccard
    ~0.83); with it, boilerplate shingles are excluded from numerator and
    denominator alike, so docs with unique tails share nothing and the
    result is EMPTY — computed over 2,000 x 2,000 potential pairs in
    bounded time. This is the at-scale regression guard for the skew
    story: one viral shingle must never produce a quadratic bucket."""
    import pandas as pd

    boiler = " ".join(f"tok{i}" for i in range(22))
    rows = [
        (i, f"{boiler} uniq{i}", "en", f"src{i % 4}", 0) for i in range(2000)
    ]
    d = tmp_path / "hot"
    d.mkdir()
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(d / "documents.parquet"))
    got = _QUERIES["dedup_ngram_jaccard"](spark, str(d)).collect()
    assert got == []


def test_gopher_filter_gate_splits_corpus(spark):
    """The composite gate must actually discriminate on real data (a gate
    that passes or fails everything is vacuous) and its flag must equal
    the conjunction of its reported measurements."""
    rows = _QUERIES["text_gopher_filter"](spark, default_sf_dir()).collect()
    passed = [r for r in rows if r.passes_gopher == 1]
    failed = [r for r in rows if r.passes_gopher == 0]
    assert passed and failed
    for r in rows:
        recomputed = int(
            50 <= r.n_tokens <= 100_000
            and 3.0 <= r.mean_token_len <= 10.0
            and r.alpha_ratio >= 0.8
            and r.n_stopwords >= 2
        )
        # rounded columns can only disagree with the unrounded gate at a
        # 1e-6 boundary; assert agreement away from boundaries
        if abs(r.mean_token_len - 3.0) > 1e-5 and abs(r.alpha_ratio - 0.8) > 1e-5:
            assert recomputed == r.passes_gopher, r


def test_temperature_sampling_keeps_rarest_source_whole(spark, tmp_path):
    """On a skewed corpus the rarest source keeps rate 1.0 (kept whole)
    and over-represented sources thin by sqrt(n_min/n) — the α=0.5
    temperature contract."""
    import pandas as pd

    rows = [(i, f"doc {i}", "en", "big", 5) for i in range(800)]
    rows += [(1000 + i, f"doc {i}", "en", "small", 5) for i in range(50)]
    d = tmp_path / "skewed"
    d.mkdir()
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(d / "documents.parquet"))
    kept = _QUERIES["sample_temperature"](spark, str(d)).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src["small"]) == 50  # rate 1.0: nothing dropped
    assert all(r.keep_rate == 1.0 for r in by_src["small"])
    expected_rate = (50 / 800) ** 0.5  # = 0.25
    assert by_src["big"][0].keep_rate == pytest.approx(expected_rate)
    # hash-mod thinning lands near rate * n (binomial-ish, wide margin)
    assert 0.15 * 800 < len(by_src["big"]) < 0.35 * 800


def test_memo_evicts_other_sf_dirs_within_session():
    """Same-session entries for a different sf_dir are unpersisted on the
    next miss: a run queries one directory at a time, so without eviction
    every directory ever touched would pin a persisted corpus copy."""
    from jorvik_spark.queries import registry as R

    class FakeDF:
        def __init__(self):
            self.persisted = True

        def persist(self):
            self.persisted = True
            return self

        def unpersist(self):
            self.persisted = False
            return self

    session = object()
    saved = dict(R._MEMO)
    R._MEMO.clear()
    try:
        a = R.memo_df("toks:/data/sfA", session, FakeDF)
        a2 = R.memo_df("toks:/data/sfA", session, FakeDF)
        assert a is a2 and a.persisted
        b = R.memo_df("toks:/data/sfB", session, FakeDF)
        assert not a.persisted, "sfA entry must be evicted on the sfB miss"
        assert b.persisted
        assert list(R._MEMO) == ["toks:/data/sfB"]
    finally:
        R._MEMO.clear()
        R._MEMO.update(saved)


def test_pq_codes_invariants(spark):
    """Every in-dim vector gets exactly M codes in [0, K); codebook
    vectors code to THEMSELVES in every subspace (their distance is 0 —
    any other winner would mean the argmin or the tie-break is wrong)."""
    from jorvik_spark.queries import QUERIES
    from jorvik_spark.queries.similarity import _PQ_K, _PQ_M

    sf = default_sf_dir()
    q = QUERIES["embed_pq_codes"](spark, sf)
    n_vec = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .filter(F.size("embedding") == 64)
        .count()
    )
    assert q.count() == n_vec * _PQ_M
    assert q.filter((F.col("code") < 0) | (F.col("code") >= _PQ_K)).count() == 0
    self_codes = q.filter(
        (F.col("vec_id") < _PQ_K) & (F.col("code") == F.col("vec_id"))
    ).count()
    assert self_codes == _PQ_K * _PQ_M


def test_ivfpq_invariants(spark):
    """Each query returns at most TOPK candidates, ranks are dense from
    1, ADC is non-decreasing in rank, and no query is its own candidate."""
    from jorvik_spark.queries import QUERIES
    from jorvik_spark.queries.similarity import _N_QUERIES, _TOPK

    rows = QUERIES["simsearch_ivfpq"](spark, default_sf_dir()).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.query_id < _N_QUERIES and r.candidate_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _TOPK
        assert all(a.adc <= b.adc for a, b in zip(rs, rs[1:]))


def test_quantize_int8_invariants(spark):
    """Codes bounded to [-127, 127]; dequantization error within half a
    quantization step of the true value."""
    from jorvik_spark.queries import QUERIES

    sf = default_sf_dir()
    q = QUERIES["embed_quantize_int8"](spark, sf)
    assert q.filter((F.col("code") > 127) | (F.col("code") < -127)).count() == 0
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    )
    joined = q.join(emb, ["vec_id", "pos"]).select(
        (F.abs(F.col("code") / 127.0 * F.col("scale") - F.col("v"))
         - (F.col("scale") / 254.0)).alias("excess")
    )
    # allow float slack on the half-step bound
    assert joined.filter(F.col("excess") > 1e-6).count() == 0


def test_minhash_banded_finds_exact_duplicates(spark):
    """Identical texts have identical shingle sets, hence identical
    signatures: every exact-dup pair (>=3 tokens) must surface as a
    candidate sharing ALL bands."""
    from jorvik_spark.queries import QUERIES
    from jorvik_spark.queries.dedup import _MH_BANDS

    sf = default_sf_dir()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")
    d = docs.select("doc_id", F.md5("text").alias("k"), toks.alias("t")).filter(
        F.size("t") >= 3
    )
    dup_pairs = (
        d.alias("a")
        .join(d.alias("b"), (F.col("a.k") == F.col("b.k"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    cands = QUERIES["dedup_minhash_banded"](spark, sf)
    missing = dup_pairs.join(
        cands.filter(F.col("n_shared_bands") == _MH_BANDS), ["doc_a", "doc_b"],
        "left_anti",
    )
    assert missing.count() == 0


def test_minhash_components_consistent_with_edges(spark):
    """Fixpoint check: both endpoints of every candidate edge carry the
    same component, and a component label is the min doc_id it covers."""
    from jorvik_spark.queries import QUERIES

    sf = default_sf_dir()
    comp = QUERIES["dedup_minhash_components"](spark, sf)
    pairs = QUERIES["dedup_minhash_banded"](spark, sf).select("doc_a", "doc_b")
    ca = comp.select(F.col("doc_id").alias("doc_a"), F.col("component").alias("comp_a"))
    cb = comp.select(F.col("doc_id").alias("doc_b"), F.col("component").alias("comp_b"))
    split_edges = (
        pairs.join(ca, "doc_a").join(cb, "doc_b")
        .filter(F.col("comp_a") != F.col("comp_b"))
    )
    assert split_edges.count() == 0
    bad_label = comp.groupBy("component").agg(F.min("doc_id").alias("m")).filter(
        F.col("component") != F.col("m")
    )
    assert bad_label.count() == 0


def test_scrub_pii_key_equals_raw_hash_when_clean(spark):
    """Docs with no detected emails/URLs must keep md5(text) as their
    scrubbed key (the scrub is a no-op on clean text)."""
    from jorvik_spark.queries import QUERIES

    sf = default_sf_dir()
    s = QUERIES["text_scrub_pii"](spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.md5("text").alias("raw_key")
    )
    clean = s.filter((F.col("n_emails") == 0) & (F.col("n_urls") == 0))
    mismatched = clean.join(docs, "doc_id").filter(
        F.col("scrubbed_key") != F.col("raw_key")
    )
    assert mismatched.count() == 0


def test_hll_rollup_within_error_and_mergeable(spark):
    """The sketch rollup's twin check: per-month estimates and the
    union-of-sketches total must each sit within HLL tolerance (lgK=12
    → ~1.6% 1σ; assert 5%) of the exact distinct counts, and the total
    row must come from the merged sketches, not a rescan (pinned by the
    estimate matching the GLOBAL distinct, which no single month
    equals)."""
    from jorvik_spark.tables import default_sf_dir, load_table
    import pyspark.sql.functions as F

    sf = default_sf_dir("sf0.01")
    rows = _QUERIES["agg_hll_rollup"](spark, sf).collect()
    got = {r["month"]: r for r in rows}
    orders = load_table(spark, sf, "orders").select(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias(
            "month"
        ),
        "o_custkey",
    )
    exact = {
        r["month"]: r["n"]
        for r in orders.groupBy("month")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact[None] = orders.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for month, row in got.items():
        assert row["exact_customers"] == exact[month], (month, row)
        assert row["est_within_bound"], (month, row)
    # the total row's bound is against the GLOBAL distinct, which no
    # single month equals — i.e. the union of sketches actually merged
    assert exact[None] > max(v for k, v in exact.items() if k is not None)


def test_bpe_train_matches_reference_model(spark):
    """The learned merge table must equal a brute-force Python BPE
    trainer (greedy left-to-right pair merging, count-then-lexicographic
    tie-break) on the same corpus — including composite merges whose
    halves are earlier merge products."""
    from collections import Counter

    import duckdb

    sf = default_sf_dir()
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in _QUERIES["text_bpe_train"](spark, sf).collect()
    ]

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall()
    ]
    con.close()
    words = Counter()
    for t in texts:
        if t:
            for w in t.lower().split():
                if w:
                    words[w] += 1
    vocab = {tuple(w): n for w, n in words.items()}
    ref = []
    for rnd in range(10):
        pc = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (l, r), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        ref.append((rnd, l, r, cnt))
        newv = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            newv[key] = newv.get(key, 0) + n
        vocab = newv
    assert got == ref


def test_cluster_sizes_account_for_every_labeled_doc(spark):
    """The histogram must partition the component label table exactly:
    sum(size * n_clusters) = |labels|, minimum size 2 (labels exist only
    for docs with at least one band collision)."""
    labels = _QUERIES["dedup_minhash_components"](spark, SF_DIR)
    hist = _QUERIES["dedup_cluster_sizes"](spark, SF_DIR).collect()
    assert hist
    assert min(r.cluster_size for r in hist) >= 2
    assert (
        sum(r.cluster_size * r.n_clusters for r in hist) == labels.count()
    )


def test_quality_representative_is_a_cluster_member(spark):
    """One representative per component; it must be a member of its own
    cluster, and n_members must agree with the label table."""
    labels = {
        (r.doc_id, r.component)
        for r in _QUERIES["dedup_minhash_components"](spark, SF_DIR).collect()
    }
    by_comp = {}
    for doc, comp in labels:
        by_comp.setdefault(comp, set()).add(doc)
    reps = _QUERIES["dedup_quality_representative"](spark, SF_DIR).collect()
    assert len(reps) == len(by_comp)
    for r in reps:
        assert r.rep_doc_id in by_comp[r.component]
        assert r.n_members == len(by_comp[r.component])


def test_ngram_fraction_consistent_with_boolean_overlap(spark):
    """The graded score must agree with the boolean decontamination
    verdict: contamination_ppm > 0 exactly for the docs
    decontaminate_overlap flags, and every ppm sits in [0, 1e6]."""
    graded = _QUERIES["decontaminate_ngram_fraction"](spark, SF_DIR).collect()
    flagged = {
        r.contaminated_doc_id
        for r in _QUERIES["decontaminate_overlap"](spark, SF_DIR).collect()
    }
    assert graded
    positive = {r.doc_id for r in graded if r.contamination_ppm > 0}
    assert positive == flagged
    for r in graded:
        assert 0 <= r.contamination_ppm <= 1_000_000
        assert 0 <= r.n_contaminated <= r.n_shingles


def test_boilerplate_ngrams_topk_per_source(spark):
    """Per source: at most K candidates, ranked contiguously from 1 in
    non-increasing doc_freq order, every one clearing the df floor and
    never exceeding the source's doc count."""
    from jorvik_spark.queries.text_analysis import (
        _BOILER_MIN_DF,
        _BOILER_TOP_K,
    )

    src_counts = {
        r.source: r.n
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = _QUERIES["text_boilerplate_ngrams"](spark, SF_DIR).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert r.doc_freq >= _BOILER_MIN_DF
        assert r.doc_freq <= src_counts[r.source]
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert len(rs) <= _BOILER_TOP_K
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        freqs = [r.doc_freq for r in rs]
        assert freqs == sorted(freqs, reverse=True)


def test_mixture_epochs_reconciles_with_budget(spark):
    """The plan must reconcile: weights sum to <= 1e6 (floor rounding
    only loses ppm), allocations sum to <= the 1.5x budget and within
    |sources| ppm-floors of it, and each row's epochs_ppm is exactly
    floor(alloc * 1e6 / avail)."""
    rows = _QUERIES["corpus_mixture_epochs"](spark, SF_DIR).collect()
    assert rows
    total_avail = sum(r.avail_tokens for r in rows)
    budget = total_avail * 3 // 2
    w = sum(r.weight_ppm for r in rows)
    assert 1_000_000 - len(rows) <= w <= 1_000_000
    alloc = sum(r.alloc_tokens for r in rows)
    assert alloc <= budget
    assert budget - alloc <= len(rows) * (budget // 1_000_000 + 1)
    for r in rows:
        assert r.epochs_ppm == r.alloc_tokens * 1_000_000 // r.avail_tokens
