"""Stress the iterative/banded §2C paths ABOVE driver scale.

Synthesizes a 10x corpus (sf0.1 replicated into near-duplicate groups:
50k documents, 50k embeddings) in a scratch directory, runs the paths
whose 100 TB arguments are plan-shape-proven but normally executed only
on <= 5k docs, and reports per-stage task skew + peak memory from
Spark's status REST API:

  * dedup_ngram_jaccard      — inverted-index self-join + hot-shingle cap
  * dedup_minhash_banded     — MIN-agg signatures + OR-of-ANDs band join
  * dedup_minhash_components — iterative label propagation to fixpoint
  * simsearch_ivf            — coarse-quantizer cell-probe join

Skew is max/median task run time per stage (reported for stages with
>= 8 tasks; a 32-core local run with 32 shuffle partitions keeps one
wave, so max/median ~ straggler factor). Peak memory is the max task
peakExecutionMemory across the query's stages.

Usage: python scripts/stress_scale.py [replicas] [--all] [--only=a,b,c]
(default 10 replicas; --only stresses the named queries instead of the
target lists — the incremental loop for newly added operators)
Not part of the driver contract — a scale-feedback loop; results are
committed to PROFILE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from jorvik_spark.session import ENGINE_CONFS  # noqa: E402
from jorvik_spark.queries import QUERIES  # noqa: E402

BASE = "/root/testdata/sf0.1"
# The iterative/banded paths whose scale arguments most need execution
# evidence (round-7 profile focus; the PROFILE.md headline table) ...
TARGETS = [
    "dedup_ngram_jaccard",
    "dedup_minhash_banded",
    "dedup_minhash_components",
    "dedup_embedding_cosine",
    "simsearch_ivf",
]
# ... and the remaining shuffling/exploding §2C shapes (--all sweep).
EXTRA_TARGETS = [
    "dedup_exact",
    "dedup_simhash",
    "simsearch_topk",
    "simsearch_lsh_det",
    "pack_sequences",
    "decontaminate_overlap",
    "text_rare_token_ratio",
    "text_token_bpe",
    "text_gopher_filter",
    "sample_temperature",
    "export_shard_assign",
    "udaf_grouped_apply",
    # Arrow mapInPandas over whole-file blobs: at 10x the blobs are
    # ~10x larger, measuring the per-row decode memory amplification
    # (hex-encoding doubles, sha256 over it) of the stub pipeline.
    "multimodal_feature_extract",
    "simsearch_ivfpq",
    # Round-7 additions: the passage-span pipeline (positional shingle
    # explode is the corpus's widest intermediate — ~n_tokens rows/doc),
    # the Bloom-screened decontamination join, and the two aggregate-
    # backed samplers.
    "dedup_passage_spans",
    "decontaminate_bloom",
    "sample_quality_percentile",
    "export_length_bucketed",
    # Batch-vs-index screen and the corpus bigram model (hot-transition
    # join skew is the thing to watch on the replicated corpus).
    "dedup_incremental_minhash",
    "text_bigram_lm_score",
    "dedup_remove_passages",
    "text_bpe_train",
    # Round-8 additions: cluster analytics over the replicated corpus's
    # 10-member dup groups (labels exist for ~every doc here — worst
    # case for the histogram/representative passes), the graded
    # contamination probe, and the boilerplate detector (replication
    # makes every shared bigram high-df: maximal group-count pressure).
    "dedup_cluster_sizes",
    "dedup_quality_representative",
    "decontaminate_ngram_fraction",
    "text_boilerplate_ngrams",
    "corpus_mixture_epochs",
    # Round-8 batch B/C: the shapes with a shuffle or window to watch.
    # corpus_source_gini is the headline risk (per-source window sort —
    # bounded by the largest source, the docstring's honest cost);
    # sample_dedup_downweight windows over 10-member md5 clusters;
    # text_ngram_novelty joins the replicated corpus's hottest shingles
    # against a 1-row-per-key firsts side (AQE skew-split best case);
    # the TPC-H shapes run against 10x facts over fixed dims.
    "text_ngram_novelty",
    "text_simpson_diversity",
    "sample_dedup_downweight",
    "corpus_source_gini",
    "text_lm_score_histogram",
    "sample_reservoir_per_source",
    "agg_q6_selective",
    "join_q10_returned_revenue",
    "join_q13_custdist",
    "join_q14_promo_share",
    "join_q15_top_supplier",
    "join_q18_large_orders",
    "join_q22_idle_customers",
    "simsearch_recall_eval",
    "embed_cluster_balance",
    "join_market_basket",
    "dedup_banding_recall_eval",
    "agg_histogram_quantile_rollup",
    # Correlated-subquery TPC-H family: the shapes to watch are Q21's
    # single-exchange pair-relation window (per-order fan-in must stay
    # bounded under 10x facts), Q17's per-part window (fan-in grows with
    # replicas here since part is fixed — the honest worst case), and
    # Q2's pair-set distinct over 10x lineitem.
    "join_q2_best_supplier",
    "join_q4_priority_exists",
    "join_q7_nation_volume",
    "join_q8_market_share",
    "join_q9_profit_proxy",
    "join_q12_late_lines",
    "join_q17_small_quantity",
    "join_q21_waiting_supplier",
    # Round-9/10 additions (VERDICT r9 item 4): the iterative/window
    # shapes whose scale arguments need execution proof. The events-side
    # trio (time-weighted avg, peak concurrency, resample) runs against
    # the deliberate user-0 hot key (~3/replicas of all events); TF-IDF
    # faces a 10x-df vocabulary (every term appears in 10x the docs);
    # the rerank shortlist and hard-negative mining probe 10x-occupancy
    # IVF cells; the PassJoin blocker and Spearman ranks run on fixed
    # vocab/sources with 10x instance counts behind them.
    "window_time_weighted_avg",
    "window_peak_concurrency",
    "window_resample_ffill",
    "text_tfidf_topterms",
    "simsearch_rerank_twophase",
    "simsearch_hard_negatives",
    "corpus_quality_rank_correlation",
    "agg_countmin_sketch",
    "agg_heavy_hitters",
    "corpus_chunk_dedup_rate",
    "sample_domain_topk_cap",
    "graph_pagerank_unrolled",
    # Round-10 additions: the degree-ordered wedge join (out-degree
    # O(sqrt E) is the claim to verify under 10x facts), the within-cell
    # pair memo behind the k-NN graph + SemDeDup, the PassJoin segment
    # blocker, the carry-forward as-of with tolerance, the Markov window
    # (runs against the user-0 hot key), and the prefix-sum shard plan.
    "graph_triangle_count",
    "simsearch_knn_graph",
    "embed_semdedup_prune",
    "join_fuzzy_name_passjoin",
    "join_asof_tolerance",
    "agg_markov_transitions",
    "window_anomaly_zscore",
    "window_session_duration_histogram",
    "multimodal_shard_manifest",
    "sample_balanced_classes",
    "text_langid_confusion",
    "sink_dynamic_partition_overwrite",
    # Round-11 additions: the MAD window (same user-hot-key exposure as
    # the z-score twin), the variable-interval union (cum-max windows on
    # the user key), the Expand-based key-skew audit, the two-level PPS
    # prefix sum, the partial-moments merge, the inverted-index
    # containment join (pair fanout = capped Σ df²), the vocab broadcast
    # OOV join, the KS value-grid window, and the hex-domain chunker.
    "window_anomaly_mad",
    "window_intervals_merge",
    "audit_join_key_skew",
    "sample_weighted_systematic",
    "agg_incremental_moments_merge",
    "dedup_containment_ngram",
    "text_vocab_oov_rate",
    "corpus_drift_ks",
    "multimodal_chunk_dedup",
    # Round-11 batch 2: the bucketed span×span overlap join (user-0 hot
    # key exposure), the truncated-dim recall eval (two |q|×|corpus|
    # passes), and the OHLC downsample window.
    "join_interval_overlap",
    "embed_matryoshka_recall",
    "window_ohlc_bars",
    # Round-11 batch 3: the CUSUM prefix-transform windows and the
    # k-NN-graph common-neighbor self-join (fanout Σ deg², deg ≤ 2k).
    "window_cusum_changepoints",
    "graph_knn_linkpred_ra",
    "sink_layout_skipping_eval",
    "window_peak_event_rate",
    "sample_group_kfold",
    "embed_outlier_scores",
]


def build_session() -> SparkSession:
    # UI enabled (unlike the engine default) — the status REST API is the
    # per-task metrics source.
    b = (
        SparkSession.builder.appName("jorvik_spark_stress")
        .master("local[32]")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.retainedStages", "2000")
    )
    for k, v in ENGINE_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _write_single_file(df, dest: str) -> None:
    """Write a DataFrame as ONE regular parquet file at ``dest``."""
    import glob

    tmp = dest + ".d"
    df.coalesce(1).write.parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    os.rename(part, dest)
    shutil.rmtree(tmp, ignore_errors=True)


def synthesize(spark: SparkSession, replicas: int) -> str:
    """Replicate sf0.1 into near-duplicate groups of size ``replicas``.

    Each replica r > 0 appends two replica-specific tokens to the text —
    a ~500-token doc keeps 3-gram Jaccard >> 0.8 against its siblings, so
    the dedup paths face ``replicas``-sized near-dup groups (the worst
    realistic shape: candidate pairs grow replicas^2 per group).
    Embeddings are replicated EXACTLY (identical vectors), which maximizes
    IVF cell occupancy — the skew-relevant stress for cell-probe search.
    """
    out = tempfile.mkdtemp(prefix="jorvik_stress_")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for r in range(replicas):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10_000_000))
        if r > 0:
            p = p.withColumn(
                "text", F.concat_ws(" ", "text", F.lit(f"rep{r} tag{r}"))
            )
        parts.append(p)
    union = parts[0]
    for p in parts[1:]:
        union = union.unionAll(p)
    # Single FILE, not a Spark directory-with-parts: the multimodal
    # binaryFile queries glob {sf_dir}/*.parquet for regular files and
    # silently match nothing against part-file directories. Written
    # executor-side (coalesce(1) + rename) — a driver toPandas collect
    # would make driver memory the harness's scale ceiling, defeating
    # the point of raising the replica count.
    _write_single_file(union, f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    eparts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * 10_000_000))
        for r in range(replicas)
    ]
    eunion = eparts[0]
    for p in eparts[1:]:
        eunion = eunion.unionAll(p)
    _write_single_file(eunion, f"{out}/embeddings.parquet")

    # events for the window/sessionize shapes: replicas keep the original
    # user ids (every user gets replicas x the events in the same time
    # range — density stress), EXCEPT replicas 1-3 which all collapse
    # onto user 0 — a deliberate hot key holding ~3/replicas of the
    # corpus, the "one bot user" shape that breaks per-key windows.
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    evparts = []
    for r in range(replicas):
        p = ev.withColumn("event_id", F.col("event_id") + F.lit(r * 100_000_000))
        if 1 <= r <= 3:
            p = p.withColumn("user_id", F.lit(0).cast("long"))
        evparts.append(p)
    evunion = evparts[0]
    for p in evparts[1:]:
        evunion = evunion.unionAll(p)
    evunion.write.parquet(f"{out}/events.parquet")

    # lineitem for the Arrow-UDF shapes (--all sweep): key-shifted exact
    # replicas — same group-size distribution, replicas x the groups.
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    lparts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * 100_000_000))
        for r in range(replicas)
    ]
    lunion = lparts[0]
    for p in lparts[1:]:
        lunion = lunion.unionAll(p)
    lunion.write.parquet(f"{out}/lineitem.parquet")

    # orders replicated with the SAME key shift as lineitem (the join
    # keys stay consistent) while o_custkey keeps the original ids:
    # every customer owns replicas x the orders — fact tables grow,
    # dimensions don't, which is exactly the 100 TB proportion the
    # TPC-H-shaped joins must survive.
    o = spark.read.parquet(f"{BASE}/orders.parquet")
    oparts = [
        o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(r * 100_000_000))
        for r in range(replicas)
    ]
    ounion = oparts[0]
    for p in oparts[1:]:
        ounion = ounion.unionAll(p)
    ounion.write.parquet(f"{out}/orders.parquet")

    # Dimensions copy verbatim (fixed size at any corpus scale).
    for t in ("customer", "supplier", "part", "region", "nation"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write.parquet(
            f"{out}/{t}.parquet"
        )
    return out


def rest(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def stage_metrics(spark: SparkSession, after_stage: int) -> list[dict]:
    """Per-stage task summaries for stages created after ``after_stage``."""
    out = []
    for st in rest(
        spark,
        "/stages?status=complete&withSummaries=true"
        "&quantiles=0.0,0.5,1.0",
    ):
        if st["stageId"] <= after_stage:
            continue
        dist = st.get("taskMetricsDistributions") or {}
        run = dist.get("executorRunTime") or [0, 0, 0]
        peak = dist.get("peakExecutionMemory") or [0, 0, 0]
        shuf = (dist.get("shuffleReadMetrics") or {}).get(
            "readBytes"
        ) or [0, 0, 0]
        out.append(
            {
                "stage": st["stageId"],
                "tasks": st.get("numCompleteTasks", 0),
                "run_ms": run,  # [min, median, max]
                "peak_mem": peak,
                "shuffle_read": shuf,
            }
        )
    return out


def max_stage_id(spark: SparkSession) -> int:
    ids = [s["stageId"] for s in rest(spark, "/stages")]
    return max(ids) if ids else -1


def main() -> None:
    only = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        elif a != "--all":
            args.append(a)
    replicas = int(args[0]) if args else 10
    targets = list(
        dict.fromkeys(TARGETS + (EXTRA_TARGETS if "--all" in sys.argv else []))
    )
    if only is not None:
        unknown = [n for n in only if n not in QUERIES]
        if unknown:
            raise SystemExit(f"--only names unknown queries: {unknown}")
        targets = only
    spark = build_session()
    print(f"synthesizing {replicas}x sf0.1 corpus ...", flush=True)
    sf_dir = synthesize(spark, replicas)
    try:
        results = []
        for name in targets:
            before = max_stage_id(spark)
            t0 = time.perf_counter()
            rows = QUERIES[name](spark, sf_dir).count()
            wall = time.perf_counter() - t0
            stages = stage_metrics(spark, before)
            worst_skew, worst_stage = 0.0, None
            peak_mem = 0
            shuffle_max = 0
            for s in stages:
                peak_mem = max(peak_mem, int(s["peak_mem"][-1]))
                shuffle_max = max(shuffle_max, int(s["shuffle_read"][-1]))
                # Absolute floor: a stage whose slowest task is < 500 ms
                # cannot be a scale risk however lopsided its max/median
                # looks (a 16-row metadata join spread over 32 tasks
                # reports "63x skew" on 1 ms medians — noise, not signal).
                if (
                    s["tasks"] >= 8
                    and s["run_ms"][1] > 0
                    and s["run_ms"][-1] >= 500
                ):
                    skew = s["run_ms"][-1] / s["run_ms"][1]
                    if skew > worst_skew:
                        worst_skew, worst_stage = skew, s["stage"]
            results.append(
                {
                    "query": name,
                    "rows": rows,
                    "wall_s": round(wall, 2),
                    "stages": len(stages),
                    "task_skew_max_over_median": round(worst_skew, 2),
                    "worst_stage": worst_stage,
                    "peak_task_mem_mb": round(peak_mem / 2**20, 1),
                    "max_task_shuffle_read_mb": round(
                        shuffle_max / 2**20, 1
                    ),
                }
            )
            print(json.dumps(results[-1]), flush=True)
        print("\n=== summary ===")
        for r in results:
            print(json.dumps(r))
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
