"""Cross-engine parity on a DIRTY event stream.

The documents/embeddings dirty suites exist (test_dirty_corpus.py);
this is the same discipline for the EVENTS table, which every window/
sessionization/anomaly operator reads: null timestamps, null values,
tied (user, ts) pairs (the event_id tie-break must decide identically),
negative/zero/boundary values, single-event users, an unknown
event_type, malformed/missing-key props JSON, rows exactly on bucket
boundaries, and file order != time order. Any ordering a query leaves
implicit (NULL placement, tie order) diverges between Spark and DuckDB
— these tests force every events operator to DECLARE its semantics.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from jorvik_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import compare

B = dt.datetime(2024, 5, 1, 9, 0, 0)


def _r(eid, sec, user, etype, value, props=None):
    ts = None if sec is None else B + dt.timedelta(seconds=sec)
    return (eid, ts, user, etype, value, props)


ROWS = [
    # user 1: a clean purchase baseline with one TIE (two events at the
    # same timestamp — event_id must break it identically), one null
    # value mid-stream, one negative and one zero value, and a spike.
    _r(1, 0, 1, "purchase", 10.0, '{"k": 1}'),
    _r(2, 60, 1, "purchase", 10.5, '{"k": 2}'),
    _r(3, 120, 1, "purchase", 9.5, "not json"),
    _r(4, 120, 1, "purchase", 11.0, None),  # tie with event 3
    _r(5, 180, 1, "purchase", None, '{"other": 9}'),
    _r(6, 240, 1, "purchase", -5.0, '{"k": -3}'),
    _r(7, 300, 1, "purchase", 0.0, "{}"),
    _r(8, 360, 1, "purchase", 10.2, '{"k": 4}'),
    _r(9, 420, 1, "purchase", 9.9, '{"k": 5}'),
    _r(10, 480, 1, "purchase", 5000.0, '{"k": 6}'),  # spike
    # user 1 also has error/view/click traffic, incl. an error whose
    # 10-minute window spans several purchases (interval overlap) and a
    # view exactly ON the hour-bucket boundary.
    _r(11, 30, 1, "error", 1.0, None),
    _r(12, 3600, 1, "view", 2.0, '{"k": 7}'),
    _r(13, 3601, 1, "click", 3.0, None),
    # user 2: single event, null value (1 s interval clamp floor).
    _r(14, 90, 2, "view", None, None),
    # user 3: null-ts rows — excluded by ts-filtering operators; any
    # operator that keeps them must ORDER them identically (the suite
    # exists to catch exactly that).
    _r(15, None, 3, "purchase", 7.0, '{"k": 8}'),
    _r(16, None, 3, "view", 1.0, None),
    _r(17, 600, 3, "purchase", 8.0, '{"k": 9}'),
    # user 4: signup funnel out of file order (rows below are earlier
    # than rows above — parquet order must not matter), with a
    # same-second signup/view pair and an unknown event type.
    _r(18, 1000, 4, "purchase", 42.0, '{"k": 10}'),
    _r(19, 900, 4, "click", 1.0, None),
    _r(20, 800, 4, "view", 1.0, None),
    _r(21, 800, 4, "signup", 1.0, None),
    _r(22, 700, 4, "weird", 123.456, '{"k": "str"}'),
    # user 5: two events 31 minutes apart (session-gap edge: exactly
    # past the 30-minute sessionizer gap → two sessions).
    _r(23, 0, 5, "view", 1.5, None),
    _r(24, 1860, 5, "view", 2.5, None),
]

EVENT_QUERIES = [
    "window_rank_per_user",
    "window_lag_lead",
    "window_running_sum",
    "window_moving_avg",
    "window_sessionize",
    "window_session_duration_histogram",
    "window_anomaly_zscore",
    "window_anomaly_mad",
    "window_intervals_merge",
    "window_ohlc_bars",
    "window_cusum_changepoints",
    "window_time_weighted_avg",
    "window_peak_concurrency",
    "window_resample_ffill",
    "window_peak_event_rate",
    "agg_markov_transitions",
    "agg_funnel_steps",
    "agg_retention_cohort",
    # round 12: the nearest-event join must break the (|gap|, ts, id)
    # tie identically on the same-second purchase/error pairs; the
    # interpolating resampler spans the null-value rows (excluded) and
    # single-hour users (grid = 1 row, observed); the A/B readout
    # hash-splits users with null-ts rows still counted (no ts filter).
    "join_nearest_event",
    "window_resample_interpolate",
    "agg_ab_test_readout",
    # wave 2: lateness must treat the null-ts rows as out of scope and
    # the file-order!=time-order user 4 as LATE arrivals; the flatline
    # detector must see the identical-value run only where values tie.
    "audit_event_lateness",
    "window_flatline_runs",
    # wave 3: the run census must exclude null-ts/null-value rows and
    # count every surviving event into exactly one run per
    # (user, event_type) stream — all length 1 on this fixture; the gap
    # census must break the same-timestamp ties by event_id on both
    # engines (a tie is a 0-second gap in octave 0).
    "window_value_run_census",
    "window_gap_census",
    # round 13: EWMA/median/drawdown fold or frame over the purchase
    # stream with the null-value row excluded and the event-3/4 tie
    # broken by event_id on both engines; the band-quantized flatline
    # must see negative values floor toward -inf identically
    # (floor(-5/10) = -1 on both); the t-test keeps null-ts rows (no
    # ts filter) and sums the negative/zero purchases exactly.
    "window_ewma_smooth",
    "window_rolling_median",
    "window_max_drawdown",
    "window_flatline_quantized",
    "agg_bootstrap_ci",
    "agg_ab_value_ttest",
    # round-13 wave 2: the autocorr census must declare user 1's
    # null-value purchase out of the pair stream, break the event-3/4
    # tie identically, and send every short/constant series to the
    # NULL band on both engines; the diurnal profile buckets the
    # on-the-hour view (event 12) by pure epoch integer division, so
    # no session timezone can shift it between engines.
    "window_autocorr_census",
    "window_diurnal_profile",
    # wave 3: the seasonal residual census must declare every
    # degenerate (type, hour) cell (n < 2 or zero variance) into the
    # NULL band identically, with null-value/null-ts rows out of scope.
    "window_seasonal_residual_census",
    # the burstiness census keeps ALL event types (gap series per
    # user), must order the event-3/4 timestamp tie by event_id and
    # declare the 0-gap-only/short streams into the NULL band
    "window_burstiness_census",
    # final wave: first-touch mins ignore null-ts rows; the attribution
    # window must break the event-3/4 same-ts tie by event_id (strict
    # precede) and credit null-value purchases with zero revenue
    "agg_conversion_lag_census",
    "join_attribution_last_touch",
    "join_interval_overlap",
    "expr_json_extract",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    # round 14: the Pettitt census must exclude null-ts/null-value rows,
    # midrank the tied values (7.5 appears twice for user 2's clean
    # stream -> integral doubled midranks either way), and break the
    # event-3/4 same-ts tie by event_id in the time index; the windowed
    # funnel anchors at the first view with null-ts rows out of scope.
    "window_pettitt_changepoint",
    "agg_funnel_windowed",
    # the hazard table's cohort/anchor/censor scopes must all ignore
    # null-ts rows, and the at-risk arithmetic must agree exactly on
    # the tiny dirty cohort.
    "agg_conversion_hazard",
    # linear attribution: the event-3/4 same-ts tie is strict-precede
    # (a touch AT the purchase instant never credits), null-value
    # purchases credit zero mass, and the exact vu*nc div k split must
    # agree on the dirty window's tiny k values.
    "join_attribution_linear",
    # Holt: the 2-component fold re-inits on the dirty stream's short
    # frames (single-purchase users = level only, trend 0) and must
    # break the event-3/4 same-ts tie identically inside the frame
    # list; null-value purchases stay out of scope like the EWMA.
    "window_holt_smooth",
    # round 15: Kendall tau must pair the event-3/4 same-ts tie via the
    # (ts, event_id) strict composite, declare null-ts/null-value
    # purchases out of scope, count exact value ties (user 1 has none
    # here but user-2-style constants elsewhere) as neither concordant
    # nor discordant, and truncate the possibly-negative (C-D)·1e6 div
    # identically; cohort LTV anchors each user's cohort at the MIN ts
    # over non-null-ts events of ANY type and must credit the
    # null-value purchase zero mass by exclusion on both engines.
    "window_kendall_tau_trend",
    "agg_cohort_ltv",
    # wave 2: RFM must scope to non-null-ts/value purchases and band
    # the zero/negative-spend users identically (m_band 0 via the <= 0
    # clamp); churn must send single-event and all-tied-gap users to
    # the NULL band on both engines, with the event-3/4 same-ts tie
    # contributing a 0 gap (history exists, gap 0 -> still NULL only
    # if it is the MAX) and null-ts rows out of scope.
    "agg_rfm_octave_census",
    "audit_user_churn_census",
    # round 16: the breakout census must scope to non-null-ts/value
    # rows, break the event-3/4 same-ts tie via (ts, event_id) inside
    # the lookback frame, and band the single-event user out of scope
    # (no opportunity) identically on both engines.
    "window_breakout_census",
    # round 16 wave 2: the lift table anchors its split at (min+max)/2
    # over non-null-ts rows and must scope pre-period-empty users out
    # identically; the precision census measures the µ-quantized grid,
    # so NULL values drop and vu = 0 lands in the 0-decimals band on
    # both engines.
    "agg_conversion_lift_bands",
    "audit_value_precision_census",
]


@pytest.fixture(scope="module")
def dirty_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty_events")
    pd.DataFrame(
        ROWS,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).astype({"ts": "datetime64[us]"}).to_parquet(
        str(d / "events.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def dirty_events_con(dirty_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,"
        " user_id, event_type, value, props FROM "
        f"read_parquet('{dirty_events_dir}/events.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_dirty_events_parity(spark, dirty_events_dir, dirty_events_con, name):
    compare(
        QUERIES[name](spark, dirty_events_dir),
        dirty_events_con,
        ORACLES[name],
        name,
    )


# --- the as-of family needs a dirty ORDERS side too -----------------

ORDER_ROWS = [
    # user 1: two orders at the SAME date (the keep-max-orderkey dedup
    # must pick identically), one order exactly AT an event ts
    # (inclusive <= tie), one far-future order no event can see.
    (101, 1, "O", 100.0, B + dt.timedelta(seconds=30)),
    (102, 1, "O", 200.0, B + dt.timedelta(seconds=30)),
    (103, 1, "F", 300.0, B + dt.timedelta(seconds=120)),  # == events 3/4 ts
    (104, 1, "F", 400.0, B + dt.timedelta(days=30)),
    # user 2: a NULL orderdate (must never match any event) and a valid
    # later order.
    (105, 2, "O", 50.0, None),
    (106, 2, "O", 60.0, B + dt.timedelta(seconds=60)),
    # user 99: orders for a customer with NO events (left join: absent).
    (107, 99, "P", 1.0, B),
    # user 4: order BEFORE every user-4 event.
    (108, 4, "O", 70.0, B),
]

# round 15: the keyspace stride census rides the same dirty orders —
# duplicate keys collapse through DISTINCT, the sparse key list spans
# several strides, and the two-level bucket decomposition must equal
# the oracle's single global lag on this adversarial little keyspace.
# round 16: the Pareto census rides it too — multi-order customers
# accumulate through the widened sum, and the top-down cumulative ppm
# must truncate identically on this adversarial revenue spread.
# round 16 wave 3: the mix-drift screen rides the same dirty orders —
# the null-orderdate row (order 105) must drop from scope identically,
# and the single-category months pin the degenerate-mix TV on both
# engines.
ASOF_QUERIES = [
    "join_asof",
    "join_asof_tolerance",
    "audit_orderkey_gap_census",
    "agg_pareto_share_census",
    "audit_category_mix_drift",
]


@pytest.fixture(scope="module")
def dirty_asof_dir(dirty_events_dir):
    pd.DataFrame(
        ORDER_ROWS,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate",
        ],
    ).assign(o_orderpriority="1-URGENT").astype(
        {"o_orderdate": "datetime64[us]"}
    ).to_parquet(f"{dirty_events_dir}/orders.parquet")
    return dirty_events_dir


@pytest.fixture(scope="module")
def dirty_asof_con(dirty_asof_dir, dirty_events_con):
    dirty_events_con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{dirty_asof_dir}/orders.parquet')"
    )
    return dirty_events_con


@pytest.mark.parametrize("name", ASOF_QUERIES)
def test_dirty_asof_parity(spark, dirty_asof_dir, dirty_asof_con, name):
    compare(
        QUERIES[name](spark, dirty_asof_dir),
        dirty_asof_con,
        ORACLES[name],
        name,
    )
