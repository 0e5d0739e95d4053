"""The ops-monitoring example end-to-end: all six screens run on one
session and the reconciliation arithmetic is internally consistent.
(Flatline runs are calibration-dependent — absent at tiny SF — so the
flatline counts are reconciled but not asserted non-vacuous.)"""

from __future__ import annotations

from examples.ops_monitoring import monitor
from jorvik_spark.tables import default_sf_dir


def test_monitor_report_complete_and_consistent(spark):
    report = monitor(spark, default_sf_dir())
    # set arithmetic must reconcile
    assert report["point_screen_overlap"] <= min(
        report["zscore_users"], report["mad_users"]
    )
    assert (
        report["mad_only_users"]
        == report["mad_users"] - report["point_screen_overlap"]
    )
    assert report["drift_only_users"] <= report["cusum_users"]
    assert (
        report["flatline_invisible_to_deviation_screens"]
        <= report["flatline_users"]
    )
    # every detector finds SOMETHING on the synthetic corpus (the
    # screens are calibrated non-vacuous at every SF)
    for k in (
        "zscore_users",
        "mad_users",
        "cusum_users",
        "users_with_coverage",
        "purchases_in_error_windows",
    ):
        assert report[k] > 0, k
    assert report["max_covered_s"] > 0


def test_monitor_seasonal_layer(spark):
    report = monitor(spark, default_sf_dir())
    etype, hod = report["quietest_cell"]
    assert isinstance(etype, str) and 0 <= hod <= 23
    # deseasonalized anomaly mass exists and is a small fraction of the
    # corpus (bands are |z| >= 3-ish tails)
    assert report["seasonal_outlier_events"] >= 0


def test_monitor_shift_and_forecast_layer(spark):
    report = monitor(spark, default_sf_dir())
    # Pettitt runs on every >= 3-event purchase stream and elects a
    # strongest shift with a positive statistic on the synthetic corpus
    assert report["pettitt_users"] > 0
    assert report["strongest_shift_k"] > 0
    assert report["strongest_shift_user"] >= 0
    assert report["forecast_misses_gt50pct"] >= 0


def test_monitor_churn_and_rfm_layer(spark):
    """Round-15 layer: the churn/RFM fields exist, reconcile against the
    registered censuses directly, and partition cleanly (risk + no-history
    never exceeds the user population)."""
    from jorvik_spark.queries.aggregates import agg_rfm_octave_census
    from jorvik_spark.queries.audits import audit_user_churn_census

    sf = default_sf_dir()
    report = monitor(spark, sf)
    churn = audit_user_churn_census(spark, sf).collect()
    want_risk = sum(
        r["n_users"]
        for r in churn
        if r["churn_band"] is not None and r["churn_band"] >= 2
    )
    assert report["churn_risk_users"] == want_risk
    total_users = sum(r["n_users"] for r in churn)
    assert (
        report["churn_risk_users"] + report["churn_no_history_users"]
        <= total_users
    )
    rfm_users = sum(r["n_users"] for r in agg_rfm_octave_census(spark, sf).collect())
    assert 0 <= report["lapsed_heavy_spenders"] <= rfm_users


def test_monitor_breakout_layer(spark):
    """Round-16 layer: the breakout fields reconcile against the
    registered census and nest correctly (hot users are a subset of
    scored users; events at least cover the hot population)."""
    from jorvik_spark.queries.windows import window_breakout_census

    sf = default_sf_dir()
    report = monitor(spark, sf)
    census = window_breakout_census(spark, sf).collect()
    assert report["breakout_users"] == sum(r["n_users"] for r in census)
    want_hot = sum(r["n_users"] for r in census if r["rate_decile"] >= 1)
    assert report["breakout_hot_users"] == want_hot
    assert 0 <= report["breakout_hot_users"] <= report["breakout_users"]
    assert report["breakout_events"] == sum(
        r["n_breakouts"] for r in census
    )
