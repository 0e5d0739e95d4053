"""Mechanical guard for the under-split-scan spread discipline.

Round 15's thrice-repeated defect class: CPU-bound per-row work (regex
passes, per-component vector folds) written directly against the
documents/embeddings scan fuses INTO the scan stage, so an under-split
input (one parquet file at test SFs; a skewed lake in production)
serializes the whole query on one core — invisible at sf0.1, a 40 s
single task at the 100x stress run (ARI, gibberish, and the JL pair all
shipped this way; PROFILE.md round 15). The sanctioned accessors are
``text_analysis._repartitioned_docs`` and ``similarity._spread_embeddings``
— a conditional round-robin spread that is a no-op on a well-split lake.

This lint makes the discipline fail AT BIRTH: every function under
jorvik_spark/queries/ that loads the documents or embeddings table
directly must either be one of the spread helpers or carry an explicit
entry below stating why the direct scan is safe. A new operator that
skips the helper fails here, not at the next 100x stress run.
"""

from __future__ import annotations

import ast
import glob
import os

QUERIES_DIR = os.path.join(
    os.path.dirname(__file__), "..", "jorvik_spark", "queries"
)

# The two sanctioned accessors: the spread lives HERE and nowhere else.
SPREAD_HELPERS = {
    ("text_analysis.py", "_repartitioned_docs"),
    ("similarity.py", "_spread_embeddings"),
}

# Direct-scan consumers, each with the reason the spread is not needed.
# Legitimate reasons (reviewed round 16):
#   narrow-projection  — selects a few scalar columns; no per-row CPU
#                        beyond comparisons/casts, work happens after a
#                        shuffle or is IO-bound.
#   bounded-filter     — a selective pushed predicate (doc_id < K) caps
#                        the rows regardless of corpus size.
#   single-digest      — one cheap digest/hash pass per row, IO-dominated
#                        (measured well under the regex-pass class).
#   pinned-shape       — bench-gated query whose plan + timing are pinned
#                        (PINS.json / tests/test_plans.py); re-routing is
#                        a deliberate re-pin decision, not a drive-by.
#   helper-of-pinned   — shared builder feeding memoized relations that
#                        bench-pinned shapes consume.
SANCTIONED: dict[tuple[str, str], str] = {
    # --- dedup.py ---
    ("dedup.py", "dedup_exact"): "single-digest: md5-of-text, IO-dominated",
    ("dedup.py", "dedup_cross_source"): "single-digest: md5-of-text",
    ("dedup.py", "dedup_incremental_minhash"):
        "narrow-projection: batch side is delta-sized; index side persisted",
    # --- multimodal.py ---
    ("multimodal.py", "multimodal_pair_manifest"):
        "bounded-filter: doc_id < 500 pushed to the scan",
    # --- sampling.py (md5 hash-mod & column-select shapes) ---
    ("sampling.py", "sample_stratified_split"): "narrow-projection",
    ("sampling.py", "export_shard_assign"): "single-digest: md5 of doc_id",
    ("sampling.py", "corpus_domain_mix"): "narrow-projection",
    ("sampling.py", "sample_temperature"): "narrow-projection",
    ("sampling.py", "sample_domain_reweight"): "narrow-projection",
    ("sampling.py", "sample_quality_percentile"): "narrow-projection",
    ("sampling.py", "corpus_curation_funnel"):
        "single-digest: md5 keys; heavy stages consume memoized relations",
    ("sampling.py", "sample_dedup_downweight"): "single-digest: md5 keys",
    ("sampling.py", "corpus_source_gini"): "narrow-projection",
    ("sampling.py", "sample_reservoir_per_source"):
        "single-digest: md5 priority keys; explode is K-bounded",
    ("sampling.py", "corpus_dedup_impact"):
        "pinned-shape: r8_dedup_impact (PINS.json)",
    ("sampling.py", "corpus_chunk_dedup_rate"): "single-digest: md5 keys",
    ("sampling.py", "sample_balanced_classes"): "single-digest: md5 keys",
    ("sampling.py", "sample_group_kfold"): "single-digest: md5 of group key",
    ("sampling.py", "sample_epoch_shuffle"):
        "single-digest: md5 order keys, shard-local row_number",
    ("sampling.py", "sample_interleave_sources"):
        "single-digest: md5 slot/shard/order keys, shard-local row_number",
    # --- similarity.py ---
    ("similarity.py", "simsearch_lsh"):
        "pinned-shape: plan pinned (test_plans); hyperplane fold feeds a "
        "band shuffle that dominates the scan stage",
    ("similarity.py", "_ivf_assign"):
        "helper-of-pinned: c_ivfpq/r10_knn/r12_iivf quantizer memo",
    ("similarity.py", "embed_semdedup_prune"):
        "pinned-shape: r10_semdedup (PINS.json)",
    ("similarity.py", "embed_centroids"):
        "narrow-projection: posexplode feeds a map-side-combined agg; "
        "10x/100x stress row clean (PROFILE.md)",
    ("similarity.py", "simsearch_lsh_det"): "single-digest: md5 band keys",
    ("similarity.py", "embed_quantize_int8"):
        "narrow-projection: per-component minmax agg, stress row clean",
    ("similarity.py", "_pq_subs"): "helper-of-pinned: c_ivfpq PQ codebooks",
    ("similarity.py", "simsearch_range"): "narrow-projection",
    ("similarity.py", "embed_dim_stats"):
        "narrow-projection: posexplode + map-side-combined moments",
    ("similarity.py", "embed_whiten"):
        "narrow-projection: per-dim moments join back on pos",
    ("similarity.py", "simsearch_rerank_twophase"):
        "pinned-shape: r9_rerank (PINS.json)",
    ("similarity.py", "simsearch_incremental_ivf"):
        "pinned-shape: r12_iivf (PINS.json)",
    ("similarity.py", "simsearch_nprobe_sweep"):
        "pinned-shape: r12_sweep (PINS.json)",
    ("similarity.py", "embed_cluster_label_purity"):
        "pinned-shape: r13_purity (PINS.json)",
    ("similarity.py", "embed_angular_pair_census"):
        "single-digest: md5 pair sample; fold runs on the sampled pairs",
    ("similarity.py", "embed_centroid_split_drift"):
        "narrow-projection: consumes the memoized IVF assignment",
    ("similarity.py", "embed_sqnorm_octave_census"):
        "narrow-projection: one aggregate fold into a <=64-group census; "
        "r14-wave 100x stress row clean (PROFILE.md)",
    ("similarity.py", "simsearch_hamming_topk"):
        "narrow-projection: consumes persisted sign-sketch relation",
    ("similarity.py", "_rp16_signs"):
        "helper-of-pinned: rp16 sketch build is itself routed through "
        "_spread_embeddings at the consumer (similarity.py:70)",
    ("similarity.py", "build"):
        "helper-of-pinned: memo_df build lambda inside a routed consumer",
    # --- storage_ops.py ---
    ("storage_ops.py", "sink_compact_small_files"):
        "pinned-shape: r9_compact (PINS.json); IO rewrite, no per-row CPU",
    ("storage_ops.py", "scan_text_roundtrip"): "narrow-projection: IO demo",
    # --- text_analysis.py ---
    ("text_analysis.py", "text_explode_positional"):
        "bounded-filter: doc_id < 100 pushed to the scan",
    ("text_analysis.py", "text_lm_score_histogram"):
        "narrow-projection: consumes the memoized LM-scored relation",
    ("text_analysis.py", "corpus_quality_rank_correlation"):
        "pinned-shape: r9_spearman (PINS.json)",
    ("text_analysis.py", "text_tfidf_topterms"):
        "pinned-shape: r9_tfidf (PINS.json)",
    ("text_analysis.py", "corpus_drift_ks"):
        "pinned-shape: r11_ks (PINS.json; round-16 adjudication)",
    # --- udfs.py ---
    ("udfs.py", "udtf_sentence_split"):
        "bounded-filter: doc_id < 200 pushed to the scan",
}


def _direct_loaders() -> set[tuple[str, str]]:
    found = set()
    for path in sorted(glob.glob(os.path.join(QUERIES_DIR, "*.py"))):
        mod = os.path.basename(path)
        text = open(path).read()
        tree = ast.parse(text)
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for c in ast.walk(node):
                if (
                    isinstance(c, ast.Call)
                    and getattr(c.func, "id", getattr(c.func, "attr", ""))
                    == "load_table"
                    and len(c.args) >= 3
                    and isinstance(c.args[2], ast.Constant)
                    and c.args[2].value in ("documents", "embeddings")
                ):
                    found.add((mod, node.name))
    return found


def test_direct_heavy_table_loaders_are_sanctioned():
    found = _direct_loaders()
    unsanctioned = found - set(SANCTIONED) - SPREAD_HELPERS
    assert not unsanctioned, (
        "Direct documents/embeddings scan without the spread discipline: "
        f"{sorted(unsanctioned)}. Route CPU-bound per-row work through "
        "_repartitioned_docs/_spread_embeddings (the ARI/gibberish/JL "
        "lesson, PROFILE.md round 15), or add a SANCTIONED entry here "
        "with the reason the direct scan is safe."
    )


def test_sanctioned_list_has_no_stale_entries():
    found = _direct_loaders()
    stale = set(SANCTIONED) - found
    assert not stale, (
        f"SANCTIONED entries no longer load directly: {sorted(stale)} — "
        "remove them so the whitelist stays the exact direct-loader set."
    )


def test_spread_helpers_still_exist_and_load_directly():
    found = _direct_loaders()
    assert SPREAD_HELPERS <= found
