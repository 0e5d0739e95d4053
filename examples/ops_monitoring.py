"""Operational monitoring over an event stream: four complementary
detectors plus the engagement/outage context, in one session.

A production screen never relies on one statistic. This example
composes the round-11 anomaly family the way an on-call dashboard
consumes it:

* ``window_anomaly_zscore``   — per-event 3σ spikes (fast, but one
  earlier outlier inflates σ and can MASK the next);
* ``window_anomaly_mad``      — the robust median/MAD twin (immune to
  ≤50% baseline contamination; spikes the z-score misses);
* ``window_cusum_changepoints`` — gradual level shifts (every event
  individually unremarkable, the run of them decisive);
* ``window_flatline_runs``   — stuck values (a frozen reading has
  ZERO deviation: it looks maximally healthy to every deviation
  screen above — only an equality-run detector sees it);
* ``window_intervals_merge``  — activity coverage per user (the
  never-idle bot signal: covered_s ≈ calendar span);
* ``join_interval_overlap``   — purchases that happened inside an open
  error-incident window (blast-radius attribution);
* ``window_diurnal_profile``  — the hour-of-day load baseline (pick
  the quietest hour for compaction; alert when a type's night share
  stops being flat);
* ``window_seasonal_residual_census`` — anomaly mass AFTER
  deseasonalizing against that baseline (a value normal at the daily
  peak is an anomaly at 4 a.m. — the raw z screen can't see that).

The report reconciles the detectors: how many users each flags, the
overlap between the instantaneous screens, and whether CUSUM found
drifting users neither point detector flagged, and whether the
flatline screen caught stuck streams every deviation test calls
healthy — the reason all four exist. The live halves (``running_anomaly_zscore``,
``running_intervals_union``, ``running_cusum_changepoints``,
``running_flatline_runs``) emit the same flags/summaries
incrementally; tests pin batch/stream equality and restart safety.

Run ``python examples/ops_monitoring.py [sf_dir]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession

from jorvik_spark.queries.joins import join_interval_overlap  # noqa: E402
from jorvik_spark.streaming import suggest_watermark  # noqa: E402
from jorvik_spark.tables import load_table  # noqa: E402
from jorvik_spark.queries.windows import (  # noqa: E402
    window_anomaly_mad,
    window_anomaly_zscore,
    window_cusum_changepoints,
    window_diurnal_profile,
    window_flatline_runs,
    window_holt_smooth,
    window_intervals_merge,
    window_pettitt_changepoint,
    window_seasonal_residual_census,
)


def monitor(spark: SparkSession, sf_dir: str) -> dict:
    """Run the six screens; returns {metric: value} with the detector
    overlap reconciliation. All six share the events scan semantics
    (null ts/value exclusion, (ts, event_id) ordering — pinned by
    tests/test_dirty_events.py)."""
    z_users = {
        r["user_id"] for r in window_anomaly_zscore(spark, sf_dir).collect()
    }
    mad_users = {
        r["user_id"] for r in window_anomaly_mad(spark, sf_dir).collect()
    }
    cusum_users = {
        r["user_id"]
        for r in window_cusum_changepoints(spark, sf_dir).collect()
    }
    flat_users = {
        r["user_id"] for r in window_flatline_runs(spark, sf_dir).collect()
    }
    coverage = window_intervals_merge(spark, sf_dir).collect()
    overlap_pairs = join_interval_overlap(spark, sf_dir).count()
    # Watermark sizing from MEASURED lateness (the consumer of the
    # audit_event_lateness census): the delay the live halves of these
    # screens should pass to withWatermark / interval_join — covering
    # 99.9% of observed out-of-orderness, octave-rounded up.
    watermark = suggest_watermark(load_table(spark, sf_dir, "events"))
    # Seasonal layer: the diurnal baseline and the census of how much
    # anomaly mass survives deseasonalization (|z| >= 3 after
    # standardizing each event against its own (type, hour) cell).
    diurnal = window_diurnal_profile(spark, sf_dir).collect()
    quietest = min(
        ((r["event_type"], r["hod"], r["n_events"]) for r in diurnal),
        key=lambda t: (t[2], t[1]),
    )
    residual = window_seasonal_residual_census(spark, sf_dir).collect()
    seasonal_outlier_events = sum(
        r["n_events"]
        for r in residual
        if r["band"] is not None and (r["band"] >= 3 or r["band"] <= -4)
    )
    # Round-14 layer: WHERE did a stream shift (Pettitt's nonparametric
    # change point — CUSUM says "a drift exists", Pettitt dates it and
    # shrugs off the outliers the z/MAD screens flag), and the
    # forecast-miss screen (Holt's trend-aware one-step forecast vs the
    # event that actually arrived — the alert threshold that doesn't
    # permanently lag a ramping series the way a plain EWMA does).
    pettitt = window_pettitt_changepoint(spark, sf_dir).collect()
    # the census is empty when no user has >= 3 valid purchases (tiny
    # or dirty lakes) — degrade the strongest-shift fields, don't crash
    strongest = (
        max(pettitt, key=lambda r: (r["k2"], -r["user_id"])) if pettitt else None
    )
    holt = window_holt_smooth(spark, sf_dir).collect()
    # per user: compare each event's value to the PREVIOUS event's
    # forecast (that is what "one-step-ahead" means operationally)
    by_user: dict = {}
    for r in sorted(holt, key=lambda r: (r["user_id"], r["t"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    forecast_misses = 0
    for rows_u in by_user.values():
        for prev, cur in zip(rows_u, rows_u[1:]):
            f = prev["forecast_u"]
            lvl = cur["level_u"]  # smoothed arrival, micro units
            if f > 0 and abs(lvl - f) * 2 > f:  # >50% miss
                forecast_misses += 1
    # Round-15 layer: WHO is going quiet (churn bands — each user's
    # open silence vs their own worst historical gap; band >= 2 means
    # silent past anything they ever did before, the population the
    # deviation screens above can never flag because absence produces
    # no events to deviate), and the RFM engagement grid the business
    # side reads next to it.
    from jorvik_spark.queries.aggregates import agg_rfm_octave_census
    from jorvik_spark.queries.audits import audit_user_churn_census

    churn = audit_user_churn_census(spark, sf_dir).collect()
    churn_risk_users = sum(
        r["n_users"]
        for r in churn
        if r["churn_band"] is not None and r["churn_band"] >= 2
    )
    churn_no_history = sum(
        r["n_users"] for r in churn if r["churn_band"] is None
    )
    rfm = agg_rfm_octave_census(spark, sf_dir).collect()
    # the cell a retention campaign targets: previously heavy spenders
    # (m_band at or above the corpus median band) gone quiet (r_band
    # above the median recency band)
    m_bands = sorted(r["m_band"] for r in rfm for _ in range(r["n_users"]))
    r_bands = sorted(r["r_band"] for r in rfm for _ in range(r["n_users"]))
    m_med = m_bands[len(m_bands) // 2] if m_bands else 0
    r_med = r_bands[len(r_bands) // 2] if r_bands else 0
    lapsed_spenders = sum(
        r["n_users"]
        for r in rfm
        if r["m_band"] >= m_med and r["r_band"] > r_med
    )
    # Round-16 layer: WHO just spiked (the breakout census — readings
    # strictly above anything in the user's own recent window; the
    # mirror image of the churn screen: churn flags absence, breakout
    # flags new highs, both normalized per user instead of one global
    # threshold). The ops view is the census's top decile band — users
    # whose readings break out in >= 1 of every ~10 opportunities.
    from jorvik_spark.queries.windows import window_breakout_census

    breakout = window_breakout_census(spark, sf_dir).collect()
    breakout_users = sum(r["n_users"] for r in breakout)
    breakout_hot_users = sum(
        r["n_users"] for r in breakout if r["rate_decile"] >= 1
    )
    breakout_events = sum(r["n_breakouts"] for r in breakout)

    return {
        "suggested_watermark": watermark,
        "zscore_users": len(z_users),
        "mad_users": len(mad_users),
        "cusum_users": len(cusum_users),
        "point_screen_overlap": len(z_users & mad_users),
        "mad_only_users": len(mad_users - z_users),
        "drift_only_users": len(cusum_users - z_users - mad_users),
        "flatline_users": len(flat_users),
        "flatline_invisible_to_deviation_screens": len(
            flat_users - z_users - mad_users
        ),
        "users_with_coverage": len(coverage),
        "max_covered_s": max((r["covered_s"] for r in coverage), default=0),
        "purchases_in_error_windows": overlap_pairs,
        "quietest_cell": quietest[:2],
        "seasonal_outlier_events": seasonal_outlier_events,
        "pettitt_users": len(pettitt),
        "strongest_shift_user": (
            int(strongest["user_id"]) if strongest is not None else None
        ),
        "strongest_shift_k": int(strongest["k2"]) if strongest is not None else 0,
        "forecast_misses_gt50pct": forecast_misses,
        "churn_risk_users": churn_risk_users,
        "churn_no_history_users": churn_no_history,
        "lapsed_heavy_spenders": lapsed_spenders,
        "breakout_users": breakout_users,
        "breakout_hot_users": breakout_hot_users,
        "breakout_events": breakout_events,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("ops_monitoring_example")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    report = monitor(spark, sf_dir)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
