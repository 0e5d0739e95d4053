"""The index-health audit example end-to-end: all three eval operators
run on one session, the report carries every metric, and the metric
values reconcile with the underlying queries."""

from __future__ import annotations

from examples.index_health import audit
from jorvik_spark.tables import default_sf_dir


def test_audit_report_complete_and_consistent(spark):
    report = audit(spark, default_sf_dir())
    for key in (
        "ann_mean_recall_ppm",
        "ivf_max_cell_share_ppm",
        "banding_recall_ppm",
        "banding_precision_ppm",
    ):
        assert 0 <= report[key] <= 1_000_000, key
    assert report["ann_queries"] == 5
    assert report["ivf_cells"] >= 1
    assert report["banding_true_pairs"] >= 0
    assert set(report["gates"]) == {
        "ann_recall_ok", "cell_balance_ok", "banding_recall_ok",
    }
    # the gates are pure functions of the reported metrics
    from examples import index_health as ih

    assert report["gates"]["cell_balance_ok"] == (
        report["ivf_max_cell_share_ppm"] <= ih.MAX_CELL_SHARE_PPM
    )
