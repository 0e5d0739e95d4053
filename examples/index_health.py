"""Index health audit: measure every approximate structure before
trusting it.

The engine ships three approximate accelerators — the IVF cell index
(ANN search), the banded-MinHash index (near-dup candidates), and the
per-source reservoir sample — and, for each, an EVAL operator that
scores the approximation against exact ground truth on the same session
(sharing the memoized quantizer / shingle index, so the audit costs one
extra comparison, not a recomputation):

* ``simsearch_recall_eval``    — recall@k of IVF cell-probe vs exact
  brute-force cosine top-k, per query;
* ``embed_cluster_balance``    — IVF cell occupancy (the skew that
  predicts both recall loss and pair-stage blow-up);
* ``dedup_banding_recall_eval``— recall/precision of the OR-of-ANDs
  banding vs exact capped-set Jaccard ≥ 0.8.

This example runs the three audits as one report — the pre-flight a
pipeline executes after (re)building its indexes and before committing
to them at corpus scale. Thresholds below are deliberately loose
deploy-gates, not test assertions: the point is the MEASUREMENT loop.

Run ``python examples/index_health.py [sf_dir]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession

from jorvik_spark.queries.dedup import dedup_banding_recall_eval  # noqa: E402
from jorvik_spark.queries.similarity import (  # noqa: E402
    embed_cluster_balance,
    simsearch_recall_eval,
)

# Deploy gates (loose by design — tune per corpus).
# ANN floor history: 400_000 until round 13, when the hash-spread
# centroid seed removed an evaluation leak (the eval queries vec_id<5
# WERE centroids 0..4 under the old first-K-by-id seed, so mean recall
# read 1.0). Honest 2-probe recall on this synthetic corpus — whose
# embeddings carry no cluster structure for IVF to exploit — is
# ~280_000 ppm at sf0.001, near the nprobe/K coverage baseline; the
# floor guards against probing the WRONG cells (→ ~0 together with
# the balance gate), so it sits below the honest mean but above zero.
MIN_MEAN_ANN_RECALL_PPM = 150_000
MAX_CELL_SHARE_PPM = 600_000  # no cell may hold > 60% of the corpus
MIN_BANDING_RECALL_PPM = 500_000  # banding finds half the true pairs


def audit(spark: SparkSession, sf_dir: str) -> dict:
    """Run the three index audits; returns {metric: value} plus a
    per-gate pass flag. All three reuse session-memoized intermediates
    (IVF assignment, shingle index) where available."""
    ann = simsearch_recall_eval(spark, sf_dir).collect()
    mean_recall = (
        sum(r["recall_ppm"] for r in ann) // len(ann) if ann else 0
    )
    cells = embed_cluster_balance(spark, sf_dir).collect()
    max_share = max((r["share_ppm"] for r in cells), default=0)
    [banding] = dedup_banding_recall_eval(spark, sf_dir).collect()
    report = {
        "ann_mean_recall_ppm": mean_recall,
        "ann_queries": len(ann),
        "ivf_cells": len(cells),
        "ivf_max_cell_share_ppm": max_share,
        "banding_recall_ppm": banding["recall_ppm"],
        "banding_precision_ppm": banding["precision_ppm"],
        "banding_true_pairs": banding["n_true_pairs"],
    }
    report["gates"] = {
        "ann_recall_ok": mean_recall >= MIN_MEAN_ANN_RECALL_PPM,
        "cell_balance_ok": max_share <= MAX_CELL_SHARE_PPM,
        "banding_recall_ok": banding["recall_ppm"]
        >= MIN_BANDING_RECALL_PPM,
    }
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("index_health")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    report = audit(spark, sf_dir)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
