"""Event-time streaming transformations.

All functions are stream/batch agnostic (Structured Streaming's unified
DataFrame model): applied to a streaming DataFrame they run incrementally
with state in the checkpoint; applied to a batch DataFrame they compute
the same answer in one pass — which is exactly how the DuckDB oracles in
``jorvik_spark.queries.windows`` verify their semantics
(``stream_tumbling_agg`` / ``stream_session_window`` use these window
expressions verbatim).

Scale notes (100 TB/day stream):
  * Watermarks bound state: without one, windowed state grows forever.
    Every op here takes a ``watermark`` delay and applies it when the
    input is streaming.
  * State lives in the state store keyed by (group, window) — the shuffle
    key. Skewed group keys skew state; pick keys accordingly (or salt and
    re-aggregate downstream).
  * ``applyInPandasWithState`` state must stay small per key (a few
    scalars here); unbounded per-key state is the streaming analogue of a
    driver collect.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


def _with_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    # Batch plans reject withWatermark; same code path must serve both.
    if df.isStreaming and delay:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    keys: Tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window: count + sum per (window, keys).

    Identical expression to the batch-twin ``stream_tumbling_agg`` query,
    whose DuckDB ``time_bucket`` oracle pins the semantics.
    """
    df = _with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    keys: Tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) window — each event lands in window/slide buckets."""
    df = _with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: Tuple[str, ...] = ("user_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (inactivity gap): merge-on-overlap per-event windows.

    Batch twin: ``stream_session_window`` (gap-and-running-sum oracle).
    """
    df = _with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(*keys, F.session_window(ts_col, gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_last"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(*keys, "session_start", "session_last", "n_events")
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: Tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon.

    State holds one entry per key seen in the last ``delay`` — bounded,
    unlike streaming ``dropDuplicates`` whose state never expires. This is
    the at-least-once → effectively-once repair for replayed sources.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))


def _lookback_micros(df: DataFrame, lookback: str) -> int | None:
    """Fixed width of ``INTERVAL {lookback}`` in microseconds, or None
    when no fixed width exists. Evaluated by Spark itself (one literal
    row on the driver) so every interval string Spark accepts — weeks,
    milliseconds, compound forms — keeps working; hand-parsing a unit
    table silently regressed "1 week" callers. Calendar units (month/
    year) have no fixed microsecond width, so they return None and the
    caller falls back to the plain range join.
    """
    try:
        [(us,)] = (
            df.sparkSession.range(1)
            .select(
                F.expr(
                    "unix_micros(timestamp'1970-01-01 00:00:00 UTC'"
                    f" + INTERVAL {lookback})"
                )
            )
            .collect()
        )
        return int(us) if us and us > 0 else None
    except Exception:  # noqa: BLE001 — calendar/unparseable interval
        return None


def _bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    lookback: str,
    how: str,
    right_within_left: bool = False,
) -> DataFrame:
    """Batch-side interval join with TIME-BUCKETED pair generation.

    A plain equi-key join evaluates every (l, r) pair within each key
    group — quadratic in the group, which a single hot key turns into
    the whole job (measured on the deliberately-skewed 10× stress
    corpus: user 0 holds ~30% of events, ~1e10 candidate pairs for that
    one key, 260 s on one core). Bucketing time into lookback-width
    cells and joining on (key, bucket) — the right side probing its own
    cell and the previous one — bounds pair evaluation to pairs at most
    2×lookback apart, which is within a constant factor of the TRUE
    match set: the hot key's quadratic group becomes many small
    (key, hour) groups spread across the cluster. This is the rewrite
    range-join hints perform in engines that have them.

    A (l, r) pair inside the window satisfies
    ``l.bucket ∈ {r.bucket - 1, r.bucket}`` (bucket width == lookback),
    and each pair can match through exactly ONE probe row (the probes
    sit at distinct buckets) — so the join is duplicate-free and the
    left-outer variant's unmatched set is exact.

    Streaming inputs never take this path: Spark's stream-stream state
    machinery needs the raw time-range condition for watermark-based
    state cleanup, and incremental arrival already amortizes each key's
    pair work across micro-batches.
    """
    us = _lookback_micros(left, lookback)
    if us is None:
        # no fixed bucket width (calendar interval) — plain range join,
        # the pre-bucketing batch behavior
        l = left.alias("l")
        r = right.alias("r")
        if right_within_left:
            cond = (
                f"l.{key} = r.{key} AND "
                f"r.{ts_col} >= l.{ts_col} - INTERVAL {lookback} AND "
                f"r.{ts_col} <= l.{ts_col}"
            )
        else:
            cond = (
                f"l.{key} = r.{key} AND "
                f"l.{ts_col} >= r.{ts_col} - INTERVAL {lookback} AND "
                f"l.{ts_col} <= r.{ts_col}"
            )
        return l.join(r, F.expr(cond), how)
    # Integer div, never float: unix_micros/width as a double rounds at
    # the 53-bit mantissa and a boundary timestamp could land one bucket
    # off; `div` stays exact (timestamps here are post-epoch).
    bucket = F.expr(f"unix_micros({ts_col}) div {us}")
    if right_within_left:
        # pair satisfies r.ts ∈ [l.ts - lookback, l.ts]
        # ⟺ l.bucket ∈ {r.bucket, r.bucket + 1} → right probes (b, b+1)
        probes = F.array(F.col("__b0"), F.col("__b0") + 1)
        cond = (
            f"r.{ts_col} >= l.{ts_col} - INTERVAL {lookback} AND "
            f"r.{ts_col} <= l.{ts_col}"
        )
    else:
        # pair satisfies l.ts ∈ [r.ts - lookback, r.ts]
        # ⟺ l.bucket ∈ {r.bucket - 1, r.bucket} → right probes (b, b-1)
        probes = F.array(F.col("__b0"), F.col("__b0") - 1)
        cond = (
            f"l.{ts_col} >= r.{ts_col} - INTERVAL {lookback} AND "
            f"l.{ts_col} <= r.{ts_col}"
        )
    l = left.withColumn("__bl", bucket).alias("l")
    r = (
        right.withColumn("__b0", bucket)
        .withColumn("__bl", F.explode(probes))
        .drop("__b0")
        .alias("r")
    )
    joined = l.join(
        r,
        F.expr(f"l.{key} = r.{key} AND l.__bl = r.__bl AND {cond}"),
        how,
    )
    return joined.drop("__bl")


def window_unique_users(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    key_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window approximate distinct keys — the streamable "hourly
    uniques". EXACT distinct is not streamable (Spark rejects distinct
    aggregates on streams: the state would hold every key per open
    window); the HLL sketch is the standard substitute — fixed-size
    per-window state merged in the state store, bounded by the
    watermark. Batch inputs run the identical expression, and HLL merge
    is order-independent, so stream and batch estimates are EQUAL, not
    merely close — the live test pins equality. The batch-twin query
    ``stream_window_unique_users`` additionally hash-checks the exact
    counts and the estimate's error bound against DuckDB.
    """
    df = _with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window))
        .agg(
            F.approx_count_distinct(key_col).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "approx_users",
            "n_events",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner interval join: each RIGHT event matches LEFT
    events with the same ``key`` whose time falls in
    ``[right.ts - lookback, right.ts]`` — the attribution shape (clicks
    joined to the purchase they preceded).

    Both inputs need a watermark when streaming: Spark buffers each side
    in state until the other side's watermark passes the join window, so
    state is bounded by ``watermark + lookback`` of data per side — the
    property that lets this run forever. Batch inputs run the identical
    join expression in one pass (the unified model), which is how the
    ``stream_stream_join`` batch twin's DuckDB oracle pins the
    semantics.

    Scale shape: equi-key join (shuffle on ``key``) with the time bound
    as a post-join range predicate per key group — never a cross join.
    At 100 TB/day the state-store shuffle partitions the same way, and a
    skewed key (one bot user) skews state: pre-filter or salt such keys.
    """
    if not (left.isStreaming or right.isStreaming):
        return _bucketed_interval_join(
            left, right, key, ts_col, lookback, "inner"
        )
    l = _with_watermark(left, ts_col, watermark).alias("l")
    r = _with_watermark(right, ts_col, watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND "
            f"l.{ts_col} >= r.{ts_col} - INTERVAL {lookback} AND "
            f"l.{ts_col} <= r.{ts_col}"
        ),
    )


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every LEFT event is kept;
    RIGHT events match when they share ``key`` and fall in
    ``[left.ts - lookback, left.ts]``. The attribution-COVERAGE shape:
    :func:`interval_join` answers "which click drove this purchase";
    this answers "which purchases have NO attributable click" — the rows
    the inner join silently drops and a funnel report needs most.

    Outer stream-stream joins are where watermarks stop being an
    optimization and become semantics: an unmatched LEFT row can only be
    EMITTED (null-padded) once the right side's watermark has passed its
    join window — before that, a matching right event might still
    arrive. Batch inputs run the identical left join in one pass, which
    is how the batch twin's DuckDB oracle pins the semantics.

    Scale shape: same equi-key shuffle + per-key range predicate as the
    inner form; state bounded by ``watermark + lookback`` per side.
    """
    if not (left.isStreaming or right.isStreaming):
        # same bucket geometry with the window anchored on the KEPT
        # left side (right matches within [l.ts - lookback, l.ts]);
        # aliases keep the caller orientation l = kept, r = matched.
        return _bucketed_interval_join(
            left, right, key, ts_col, lookback, "leftOuter",
            right_within_left=True,
        )
    l = _with_watermark(left, ts_col, watermark).alias("l")
    r = _with_watermark(right, ts_col, watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND "
            f"r.{ts_col} >= l.{ts_col} - INTERVAL {lookback} AND "
            f"r.{ts_col} <= l.{ts_col}"
        ),
        "leftOuter",
    )


def running_user_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator: per-key running (count, sum) emitted each
    micro-batch, via ``applyInPandasWithState``.

    The canonical shape for operators Spark's built-ins can't express
    (per-key counters, custom sessionization, CDC conflation): state is a
    few scalars per key, input arrives as an iterator of Arrow batches.
    Batch inputs get the equivalent one-shot groupBy aggregate.
    """
    if not df.isStreaming:
        return df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # n_nonnull mirrors SQL SUM semantics: nulls are skipped, and the
        # total is NULL (not 0.0) until a non-null value has been seen —
        # without it, pandas' NaN-skipping .sum() returns 0.0 for an
        # all-null key and the stream diverges from the batch twin.
        n, total, n_nonnull = (
            state.get if state.exists else (0, 0.0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf[value_col].dropna()
            n_nonnull += len(vals)
            total += float(vals.sum()) if len(vals) else 0.0
        state.update((n, total, n_nonnull))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "total_value": [total if n_nonnull else None],
            }
        )

    # The grouping key keeps ITS OWN type in the output schema — a
    # hardcoded `long` would crash the Arrow conversion for string keys
    # (e.g. key_col="event_type") while the batch path sailed through.
    key_type = df.schema[key_col].dataType.simpleString()
    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, n_events long, total_value double"
        ),
        stateStructType="n long, total double, n_nonnull long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_fixedpoint(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """:func:`running_user_totals` with the value sum carried in EXACT
    integer micro-units (the registry ``dsum`` quantization:
    ``floor(v * 1e6 + 0.5)`` per value, integers summed) instead of a
    float accumulator. Float sums are arrival-order-dependent in the
    last ulps, so a replayed/repartitioned stream could emit a
    hash-different total; the fixed-point total is order-independent and
    therefore value-hash-comparable against a batch SQL twin — which is
    what lets the driver check a custom stateful operator at all.

    Output: (key, n_events long, total_u long) — ``total_u`` is NULL
    until a non-null value arrives (SQL SUM semantics), else the exact
    micro-unit sum. Python ints are arbitrary-precision, so the running
    per-key total cannot overflow; the emitted long holds any total
    below 9.2e12 in value units — the same int64 unit ceiling every
    dsum consumer documents.
    """
    import numpy as np

    def _q(vals: pd.Series) -> int:
        return int(np.floor(vals.to_numpy() * 1e6 + 0.5).astype("int64").sum())

    if not df.isStreaming:
        return df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("total_u"),
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total_u, n_nonnull = (
            state.get if state.exists else (0, 0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf[value_col].dropna()
            n_nonnull += len(vals)
            if len(vals):
                total_u += _q(vals)
        state.update((n, total_u, n_nonnull))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "total_u": pd.array(
                    [total_u if n_nonnull else None], dtype="Int64"
                ),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, n_events long, total_u long"
        ),
        stateStructType="n long, total_u long, n_nonnull long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def anomaly_zscore_flags(filtered: DataFrame, key_col: str) -> DataFrame:
    """THE batch 3σ predicate — single implementation shared by the
    registered query ``window_anomaly_zscore`` and the batch branch of
    :func:`running_anomaly_zscore`, so the formula cannot drift between
    them (it did once: an extra ·n factor made the batch threshold
    3·√n·σ — caught in round-10 review).

    Input: (key_col, event_id, ts, vu) with nulls pre-screened. Per key,
    an event flags when it deviates from its trailing ≤ 8-value baseline
    by more than 3σ: with S = Σv, Q = Σv² over the frame,
    σ² = (n·Q − S²)/n², so |x − S/n| > 3σ ⟺ (n·x − S)² > 9·(n·Q − S²)
    — exact integer arithmetic end to end (a float rolling std drifts
    with summation order). Windows shorter than 4 prior events abstain.

    One window pass: the three frame aggregates share the key-ordered
    sort/exchange; the filter evaluates in whole-stage codegen. v² at
    1e6 quantization stays within DECIMAL(38,0) (~2^96 headroom).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy("ts", "event_id")
        .rowsBetween(-8, -1)
    )
    framed = filtered.select(
        key_col,
        "event_id",
        "ts",
        "vu",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.col("vu").cast("decimal(38,0)")).over(w).alias("s"),
        F.sum(
            (F.col("vu").cast("decimal(38,0)") * F.col("vu")).cast(
                "decimal(38,0)"
            )
        )
        .over(w)
        .alias("q"),
    )
    return framed.filter(
        (F.col("n") >= 4)
        & (
            F.expr(
                "(n * CAST(vu AS DECIMAL(38,0)) - s) * "
                "(n * CAST(vu AS DECIMAL(38,0)) - s)"
            )
            > F.expr("9 * (n * q - s * s)")
        )
    ).select(
        key_col,
        "event_id",
        "ts",
        F.col("vu").alias("value_units"),
        F.col("n").cast("long").alias("n_prior"),
    )


def running_anomaly_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Online 3σ anomaly flags — the LIVE twin of the batch predicate
    :func:`anomaly_zscore_flags` (registered as ``window_anomaly_zscore``
    over purchase events): per key, each event is tested against the
    trailing ≤ 8 previously-seen quantized values via the exact integer
    identity ``(n·x − S)² > 9·(n·Q − S²)``, and flagged rows are emitted
    as they are detected. State per key is the ring of ≤ 8 micro-unit
    longs — bounded, tiny, replayable.

    Scope contract: this function screens only null ts/values — the
    CALLER pre-filters to the event population it wants monitored (the
    registered batch query restricts to ``event_type = 'purchase'``
    before calling the shared predicate; feed this function the same
    filter for live-vs-batch equality, else other event types enter the
    ring and bias the baseline).

    Equivalence contract: with per-key IN-ORDER event-time delivery
    (rows sorted by (ts, event_id) within each micro-batch — this
    function sorts them — and batches arriving in time order, the usual
    landing-zone discipline), the emitted flags equal the batch form's
    rows exactly; tests pin that across a multi-file replay. Out-of-
    order arrivals would need a watermark-buffered sort upstream — the
    documented trade of an ONLINE detector.
    """
    filtered = df.filter(
        F.col("ts").isNotNull() & F.col(value_col).isNotNull()
    ).select(
        key_col,
        "event_id",
        "ts",
        F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("vu"),
    )
    if not df.isStreaming:
        return anomaly_zscore_flags(filtered, key_col).drop("ts")

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ring: list[int] = list(state.get[0]) if state.exists else []
        out_ids: list[int] = []
        out_vals: list[int] = []
        out_n: list[int] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for _, row in rows.iterrows():
            x = int(row["vu"])
            n = len(ring)
            if n >= 4:
                s = sum(ring)
                qq = sum(v * v for v in ring)
                if (n * x - s) ** 2 > 9 * (n * qq - s * s):
                    out_ids.append(int(row["event_id"]))
                    out_vals.append(x)
                    out_n.append(n)
            ring.append(x)
            if len(ring) > 8:
                ring.pop(0)
        state.update((ring,))
        yield pd.DataFrame(
            {
                key_col: pd.array([key[0]] * len(out_ids), dtype="Int64"),
                "event_id": pd.array(out_ids, dtype="Int64"),
                "value_units": pd.array(out_vals, dtype="Int64"),
                "n_prior": pd.array(out_n, dtype="Int64"),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, event_id long, value_units long, "
            "n_prior long"
        ),
        stateStructType="vals array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _ActivityProcessor(StatefulProcessor):
    """Per-key activity state for :func:`user_activity_summary`.

    ValueState holds (n, total, n_nonnull, last_us); every micro-batch
    folds its rows in and emits the updated summary row for each key
    seen. SQL SUM semantics are preserved the same way as
    ``running_user_totals``: nulls are skipped and the total stays NULL
    until a non-null value arrives. The key column keeps the CALLER'S
    name (the output schema carries its type — see the key-type note in
    ``running_user_totals``).
    """

    def __init__(self, key_col: str) -> None:
        self._key_col = key_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "activity", "n long, total double, n_nonnull long, last_us long"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total, n_nonnull, last_us = (
            self._state.get() if self._state.exists() else (0, 0.0, 0, None)
        )
        for pdf in rows:
            n += len(pdf)
            vals = pdf["value"].dropna()
            n_nonnull += len(vals)
            total += float(vals.sum()) if len(vals) else 0.0
            ts_us = pd.to_datetime(pdf["ts"].dropna()).astype("int64") // 1000
            if len(ts_us):
                mx = int(ts_us.max())
                last_us = mx if last_us is None else max(last_us, mx)
        self._state.update((n, total, n_nonnull, last_us))
        yield pd.DataFrame(
            {
                self._key_col: [key[0]],
                "n_events": [n],
                "total_value": [total if n_nonnull else None],
                "last_ts": [
                    pd.Timestamp(last_us, unit="us")
                    if last_us is not None
                    else pd.NaT
                ],
            }
        )

    def close(self) -> None:
        pass


def user_activity_summary(
    df: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Per-user running activity summary via ``transformWithStateInPandas``
    — Spark 4's arbitrary-state API (the successor of
    ``applyInPandasWithState``, cf. :func:`running_user_totals`): typed
    state handles (ValueState here; List/MapState and timers available),
    explicit time modes, and state-schema evolution support.

    Emits (user_id, n_events, total_value, last_ts) per key per
    micro-batch in update mode. State is one small tuple per key — at
    100 TB/day the state store shards on the group key like any shuffle;
    give hot keys the same salting treatment as batch aggregations.
    Batch inputs get the equivalent one-shot aggregate (unified model),
    which is also what the live test compares the stream against.

    Environment gate: the transformWithState driver worker requires the
    ``protobuf`` package (state-schema RPC); without it Spark crashes
    the streaming query with an opaque worker error, so the STREAMING
    branch fails fast here with the actionable message instead. The
    batch branch has no such dependency. ``applyInPandasWithState``
    (:func:`running_user_totals`) remains the protobuf-free stateful
    path.
    """
    if df.isStreaming:
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "transformWithStateInPandas requires the 'protobuf' "
                "package in the Python workers (pip install protobuf); "
                "use running_user_totals (applyInPandasWithState) where "
                "protobuf is unavailable."
            ) from e
    if not df.isStreaming:
        return df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
    # The grouping key keeps ITS OWN type in the output schema, exactly
    # as running_user_totals does — a hardcoded type would crash the
    # Arrow conversion for non-long keys in the streaming branch only.
    key_type = df.schema[key_col].dataType.simpleString()
    return df.groupBy(key_col).transformWithStateInPandas(
        _ActivityProcessor(key_col),
        outputStructType=(
            f"{key_col} {key_type}, n_events long, total_value double, "
            "last_ts timestamp"
        ),
        outputMode="Update",
        timeMode="None",
    )


def running_intervals_union(
    df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Online interval-union census — the LIVE stateful twin of the
    batch ``window_intervals_merge`` query: per key, variable-length
    event intervals [ts, ts + clamp(value s)] merge into islands as they
    arrive, and every micro-batch emits the key's updated summary
    (n_intervals, n_islands, covered_s, max_island_events) — the
    occupancy/billing counter a live dashboard reads instead of
    re-scanning history.

    State per key is FIVE longs plus the open island's (start, max_end,
    n_events) — constant, replayable, checkpoint-safe (the restart test
    pattern of ``running_anomaly_zscore`` applies). Equivalence
    contract: with per-key in-order event-time delivery, the LAST
    emitted row per key equals the batch query's row exactly — the
    interval clamp below and the batch query's must stay byte-identical
    (both derive from windows._IU_MIN_US/_IU_MAX_US).
    """
    from jorvik_spark.queries.windows import _IU_MAX_US, _IU_MIN_US

    dur = (
        f"least(greatest(CAST(floor(coalesce(value, 0) * 1000000) AS"
        f" BIGINT), {_IU_MIN_US}L), {_IU_MAX_US}L)"
    )
    filtered = df.filter(F.col("ts").isNotNull()).select(
        key_col,
        "event_id",
        "ts",
        F.unix_micros("ts").alias("ts_us"),
        (F.unix_micros("ts") + F.expr(dur)).alias("end_us"),
    )
    if not df.isStreaming:
        # Batch twin: delegate to the registered window formulation via
        # the same gaps-and-islands pass (used by the equality tests).
        from pyspark.sql import Window

        order = [F.col("ts_us"), F.col("event_id")]
        w_prev = (
            Window.partitionBy(key_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_cum = (
            Window.partitionBy(key_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        labeled = filtered.withColumn(
            "new_island",
            F.when(
                F.max("end_us").over(w_prev) >= F.col("ts_us"), F.lit(0)
            ).otherwise(F.lit(1)),
        ).withColumn("island", F.sum("new_island").over(w_cum))
        islands = labeled.groupBy(key_col, "island").agg(
            (F.max("end_us") - F.min("ts_us")).alias("covered_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        return islands.groupBy(key_col).agg(
            F.sum("n_events").cast("long").alias("n_intervals"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.expr("CAST(SUM(covered_us) div 1000000 AS BIGINT)").alias(
                "covered_s"
            ),
            F.max("n_events").cast("long").alias("max_island_events"),
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (n_iv, n_closed, cov_closed, max_ev,
             cur_s, cur_e, cur_n) = state.get
        else:
            n_iv = n_closed = cov_closed = max_ev = 0
            cur_s = cur_e = cur_n = -1
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        for _, row in rows.iterrows():
            s, e = int(row["ts_us"]), int(row["end_us"])
            n_iv += 1
            if cur_n < 0:
                cur_s, cur_e, cur_n = s, e, 1
            elif s <= cur_e:
                cur_e = max(cur_e, e)
                cur_n += 1
            else:
                n_closed += 1
                cov_closed += cur_e - cur_s
                max_ev = max(max_ev, cur_n)
                cur_s, cur_e, cur_n = s, e, 1
        state.update(
            (n_iv, n_closed, cov_closed, max_ev, cur_s, cur_e, cur_n)
        )
        open_cov = (cur_e - cur_s) if cur_n > 0 else 0
        yield pd.DataFrame(
            {
                key_col: pd.array([key[0]], dtype="Int64"),
                "n_intervals": pd.array([n_iv], dtype="Int64"),
                "n_islands": pd.array(
                    [n_closed + (1 if cur_n > 0 else 0)], dtype="Int64"
                ),
                "covered_s": pd.array(
                    [(cov_closed + open_cov) // 1_000_000], dtype="Int64"
                ),
                "max_island_events": pd.array(
                    [max(max_ev, max(cur_n, 0))], dtype="Int64"
                ),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, n_intervals long, n_islands long, "
            "covered_s long, max_island_events long"
        ),
        stateStructType=(
            "n_iv long, n_closed long, cov_closed long, max_ev long, "
            "cur_s long, cur_e long, cur_n long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_ohlc_bars(
    df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Online OHLC bar generator — the LIVE stateful twin of the batch
    ``window_ohlc_bars`` query: per key, hourly open/high/low/close
    bars over the purchase value stream, each touched bar re-emitted
    with its updated state every micro-batch (update mode; the LAST
    emission per (key, bar) is that bar's final truth once event time
    moves past it).

    State per key is ONE open bar (7 longs) — in-order delivery means a
    bar can never reopen once a later bucket starts, so closed bars
    leave state immediately: the streaming analogue of the batch
    query's "output is strictly |users| × |active hours|" bound.
    Equivalence contract: same as the other twins — per-key in-order
    event-time delivery; the bucket width and micro-unit quantization
    derive from the SAME constants as the batch query
    (windows._OHLC_BUCKET_US), so the formulas cannot drift.
    """
    from jorvik_spark.queries.windows import _OHLC_BUCKET_US

    filtered = df.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("event_type") == "purchase")
    ).select(
        key_col,
        "event_id",
        "ts",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("vu"),
    )
    if not df.isStreaming:
        # Batch twin: the same one-sort-exchange formulation as the
        # registered window_ohlc_bars query, emitted in THIS twin's
        # schema (raw bar_start_us long, caller's key_col) — so the
        # two 'live twin' APIs behave alike: batch input transparently
        # delegates instead of raising (matches running_intervals_union
        # above; used by the batch-equality tests).
        from pyspark.sql import Window

        bucket = F.expr(f"ts_us div {_OHLC_BUCKET_US}")
        w = Window.partitionBy(key_col, "bucket").orderBy(
            "ts_us", "event_id"
        )
        pos = filtered.withColumn("bucket", bucket).select(
            key_col,
            "bucket",
            "vu",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy(key_col, "bucket"))
            .alias("cnt"),
        )
        return (
            pos.groupBy(key_col, "bucket")
            .agg(
                F.max(F.when(F.col("rn") == 1, F.col("vu")))
                .cast("long")
                .alias("open_u"),
                F.max("vu").cast("long").alias("high_u"),
                F.min("vu").cast("long").alias("low_u"),
                F.max(F.when(F.col("rn") == F.col("cnt"), F.col("vu")))
                .cast("long")
                .alias("close_u"),
                F.count(F.lit(1)).cast("long").alias("n_trades"),
            )
            .select(
                key_col,
                (F.col("bucket") * F.lit(_OHLC_BUCKET_US))
                .cast("long")
                .alias("bar_start_us"),
                "open_u",
                "high_u",
                "low_u",
                "close_u",
                "n_trades",
            )
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bucket, o, h, lo, c, n = state.get
        else:
            bucket, o, h, lo, c, n = -1, 0, 0, 0, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        touched: dict[int, tuple] = {}
        for _, row in rows.iterrows():
            b = int(row["ts_us"]) // _OHLC_BUCKET_US
            x = int(row["vu"])
            if b != bucket:
                if bucket >= 0:
                    touched[bucket] = (o, h, lo, c, n)
                bucket, o, h, lo, c, n = b, x, x, x, x, 1
            else:
                h, lo, c, n = max(h, x), min(lo, x), x, n + 1
        if bucket >= 0:
            touched[bucket] = (o, h, lo, c, n)
        state.update((bucket, o, h, lo, c, n))
        buckets = sorted(touched)
        yield pd.DataFrame(
            {
                key_col: pd.array([key[0]] * len(buckets), dtype="Int64"),
                "bar_start_us": pd.array(
                    [b * _OHLC_BUCKET_US for b in buckets], dtype="Int64"
                ),
                "open_u": pd.array(
                    [touched[b][0] for b in buckets], dtype="Int64"
                ),
                "high_u": pd.array(
                    [touched[b][1] for b in buckets], dtype="Int64"
                ),
                "low_u": pd.array(
                    [touched[b][2] for b in buckets], dtype="Int64"
                ),
                "close_u": pd.array(
                    [touched[b][3] for b in buckets], dtype="Int64"
                ),
                "n_trades": pd.array(
                    [touched[b][4] for b in buckets], dtype="Int64"
                ),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, bar_start_us long, open_u long, "
            "high_u long, low_u long, close_u long, n_trades long"
        ),
        stateStructType=(
            "bucket long, o long, h long, lo long, c long, n long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_CUSUM_BASELINE_N = 8  # in-control training events per key


def running_cusum_changepoints(
    df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Online one-sided CUSUM change-point detector — the LIVE stateful
    sibling of the batch ``window_cusum_changepoints`` query, completing
    the anomaly family's twin coverage (z-score, MAD, OHLC, intervals
    all have one). Per key: the first _CUSUM_BASELINE_N purchase values
    freeze the in-control mean μ (Page's CUSUM monitors against a KNOWN
    in-control level — the deployment form; the batch query's
    whole-history mean is unknowable mid-stream, the one semantic
    difference, documented here), then every later event advances
    S = max(0, S + (x − μ)) and the key's running report
    (first_exceed_pos/event once S > h, max_cusum) re-emits per batch —
    the LAST emission is that key's truth.

    State per key is eight longs + the ≤ 8-value baseline ring — bounded,
    replayable, checkpoint-safe. The batch branch below computes the
    IDENTICAL frozen-baseline semantics declaratively (prefix-sum minus
    running-min closed form over the monitored suffix), so batch input
    delegates instead of raising and the equality tests compare the two
    forms row for row. Positions count MONITORED events (1 = the first
    event after the baseline window).
    """
    from jorvik_spark.queries.windows import _CUSUM_H_U
    from pyspark.sql import Window

    filtered = df.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("event_type") == "purchase")
    ).select(
        key_col,
        "event_id",
        "ts",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("vu"),
    )
    if not df.isStreaming:
        order_w = Window.partitionBy(key_col).orderBy("ts_us", "event_id")
        pos = filtered.withColumn("j", F.row_number().over(order_w))
        base = (
            pos.filter(F.col("j") <= _CUSUM_BASELINE_N)
            .groupBy(key_col)
            .agg(
                F.expr("SUM(vu) div COUNT(1)").alias("mu_u"),
                F.count(F.lit(1)).alias("nb"),
            )
            .filter(F.col("nb") == _CUSUM_BASELINE_N)
            .select(key_col, "mu_u")
        )
        mon = (
            pos.filter(F.col("j") > _CUSUM_BASELINE_N)
            .join(base, key_col)
            .withColumn("i", F.col("j") - F.lit(_CUSUM_BASELINE_N))
        )
        w_cum = (
            Window.partitionBy(key_col)
            .orderBy("i")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_prev = (
            Window.partitionBy(key_col)
            .orderBy("i")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        t = mon.withColumn(
            "tail_i", F.sum(F.col("vu") - F.col("mu_u")).over(w_cum)
        )
        s = t.withColumn(
            "cusum",
            F.col("tail_i")
            - F.least(
                F.coalesce(F.min("tail_i").over(w_prev), F.lit(0)),
                F.lit(0),
            ),
        )
        return (
            s.filter(F.col("cusum") > _CUSUM_H_U)
            .groupBy(key_col)
            .agg(
                F.min("i").cast("long").alias("first_exceed_pos"),
                F.expr("CAST(MIN_BY(event_id, i) AS BIGINT)").alias(
                    "first_exceed_event"
                ),
                F.max("cusum").cast("long").alias("max_cusum"),
            )
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ring, mu, s_cur, s_max, pos, f_pos, f_ev = state.get
            ring = list(ring)
        else:
            ring, mu, s_cur, s_max, pos, f_pos, f_ev = [], 0, 0, 0, 0, -1, -1
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        for _, row in rows.iterrows():
            x = int(row["vu"])
            if len(ring) < _CUSUM_BASELINE_N:
                ring.append(x)
                if len(ring) == _CUSUM_BASELINE_N:
                    # Python // floors; Spark div truncates — baseline
                    # sums of non-negative micro-units keep them equal.
                    mu = sum(ring) // _CUSUM_BASELINE_N
                continue
            pos += 1
            s_cur = max(0, s_cur + (x - mu))
            if s_cur > s_max:
                s_max = s_cur
            if f_pos < 0 and s_cur > _CUSUM_H_U:
                f_pos, f_ev = pos, int(row["event_id"])
        state.update((ring, mu, s_cur, s_max, pos, f_pos, f_ev))
        if f_pos >= 0:
            yield pd.DataFrame(
                {
                    key_col: pd.array([key[0]], dtype="Int64"),
                    "first_exceed_pos": pd.array([f_pos], dtype="Int64"),
                    "first_exceed_event": pd.array([f_ev], dtype="Int64"),
                    "max_cusum": pd.array([s_max], dtype="Int64"),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    key_col: pd.array([], dtype="Int64"),
                    "first_exceed_pos": pd.array([], dtype="Int64"),
                    "first_exceed_event": pd.array([], dtype="Int64"),
                    "max_cusum": pd.array([], dtype="Int64"),
                }
            )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, first_exceed_pos long, "
            "first_exceed_event long, max_cusum long"
        ),
        stateStructType=(
            "ring array<long>, mu long, s_cur long, s_max long, "
            "pos long, f_pos long, f_ev long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_FLAT_MIN_RUN = 3  # must equal windows._FLATLINE_MIN_RUN (asserted below)


def running_flatline_runs(
    df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Online flatline (stuck-value) detector — the LIVE stateful twin
    of the batch ``window_flatline_runs`` query: per key, runs of
    ≥ _FLAT_MIN_RUN consecutive identical purchase values accumulate
    into the key's report (n_flatline_runs, longest_run,
    n_flatlined_events), re-emitted each micro-batch for keys with at
    least one qualifying run — the LAST emission is that key's truth.
    A frozen value is invisible to the deviation-based live screens
    (z-score/MAD/CUSUM twins) by construction; this is the fourth
    member of the monitoring family.

    State per key is FIVE longs (current run's value + length, closed
    qualifying runs' count / longest / event total) — constant,
    replayable, checkpoint-safe. The OPEN run participates in the
    emission as soon as it qualifies (exactly the batch semantics: a
    still-running flatline is already a flatline), then merges into the
    closed totals only when a different value arrives, so no run is
    double-counted. Batch input delegates to the same gaps-and-islands
    formulation the registered query uses, in this twin's schema.
    """
    from pyspark.sql import Window

    from jorvik_spark.queries.windows import _FLATLINE_MIN_RUN

    assert _FLAT_MIN_RUN == _FLATLINE_MIN_RUN

    filtered = df.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        # null stream identity out of scope — mirrors the registered
        # batch query's declared semantics (and the run census's)
        & F.col(key_col).isNotNull()
        & (F.col("event_type") == "purchase")
    ).select(
        key_col,
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("vu"),
    )
    if not df.isStreaming:
        wi = Window.partitionBy(key_col).orderBy("ts_us", "event_id")
        wj = Window.partitionBy(key_col, "vu").orderBy("ts_us", "event_id")
        runs = (
            filtered.withColumn(
                "grp", F.row_number().over(wi) - F.row_number().over(wj)
            )
            .groupBy(key_col, "vu", "grp")
            .agg(F.count(F.lit(1)).alias("run_len"))
            .filter(F.col("run_len") >= _FLAT_MIN_RUN)
        )
        return runs.groupBy(key_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_flatline_runs"),
            F.max("run_len").cast("long").alias("longest_run"),
            F.sum("run_len").cast("long").alias("n_flatlined_events"),
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_vu, cur_len, n_runs, longest, flat_ev = state.get
        else:
            cur_vu, cur_len, n_runs, longest, flat_ev = 0, 0, 0, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        for _, row in rows.iterrows():
            x = int(row["vu"])
            if cur_len > 0 and x == cur_vu:
                cur_len += 1
            else:
                if cur_len >= _FLAT_MIN_RUN:
                    n_runs += 1
                    longest = max(longest, cur_len)
                    flat_ev += cur_len
                cur_vu, cur_len = x, 1
        state.update((cur_vu, cur_len, n_runs, longest, flat_ev))
        # open run folds into the emission once it qualifies (batch
        # semantics) without touching the closed-run state
        o_runs, o_long, o_ev = n_runs, longest, flat_ev
        if cur_len >= _FLAT_MIN_RUN:
            o_runs += 1
            o_long = max(o_long, cur_len)
            o_ev += cur_len
        if o_runs > 0:
            yield pd.DataFrame(
                {
                    key_col: pd.array([key[0]], dtype="Int64"),
                    "n_flatline_runs": pd.array([o_runs], dtype="Int64"),
                    "longest_run": pd.array([o_long], dtype="Int64"),
                    "n_flatlined_events": pd.array([o_ev], dtype="Int64"),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    key_col: pd.array([], dtype="Int64"),
                    "n_flatline_runs": pd.array([], dtype="Int64"),
                    "longest_run": pd.array([], dtype="Int64"),
                    "n_flatlined_events": pd.array([], dtype="Int64"),
                }
            )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, n_flatline_runs long, "
            "longest_run long, n_flatlined_events long"
        ),
        stateStructType=(
            "cur_vu long, cur_len long, n_runs long, longest long, "
            "flat_ev long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def suggest_watermark(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    arrival_col: str = "event_id",
    coverage_ppm: int = 999_000,
) -> str:
    """Watermark sizing from MEASURED out-of-orderness — the consumer of
    the ``audit_event_lateness`` census (round-12 verdict item #8: the
    census existed as evidence, nothing read it).

    Computes the census's lateness histogram over ``df`` (how late each
    event's event-time is vs the newest event-time already seen on its
    key's stream, arrival order = ``arrival_col``, bucketed by
    bit-length octave — the identical quantization, predicates and
    tie-breaks as ``jorvik_spark.queries.audits.audit_event_lateness``,
    pinned by tests/test_round13_ops.py), then returns the smallest
    octave-edge delay that covers at least ``coverage_ppm`` of events,
    as a Spark interval string ready for ``withWatermark`` /
    ``interval_join(lookback=...)`` / ``dedup_within_watermark``.

    Octave edges mean the suggestion is at most 2x the exact quantile —
    the honest resolution of the census — and NEVER under it: a
    watermark below the observed tail silently DROPS those events,
    while one octave of slack merely holds state a little longer. In-
    order streams (everything in bucket 0) suggest "0 seconds".

    Driver-side cost: ONE bounded collect of the <= ~40 octave rows
    (the same bounded-collect discipline as the BPE argmax and the IVF
    cell guard); the heavy lifting is the census's single key-sorted
    exchange. Run it on a recent static slice of the stream's table —
    sizing belongs to deploy time, not per-batch time.
    """
    from pyspark.sql import Window

    ev = (
        df.filter(F.col(ts).isNotNull())
        .select(
            F.col(key).alias("k"),
            F.col(arrival_col).alias("seq"),
            F.unix_micros(F.col(ts)).alias("t"),
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = ev.withColumn("mx", F.max("t").over(w)).withColumn(
        "late_s", F.expr("CAST((mx - t) div 1000000 AS BIGINT)")
    )
    bits = (
        F.when(F.col("late_s") == 0, F.lit(0))
        .otherwise(
            F.length(F.conv(F.col("late_s").cast("string"), 10, 2))
        )
        .cast("int")
    )
    hist = sorted(
        (
            (r["b"], r["n"])
            for r in late.groupBy(bits.alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: <= ~40 octave rows
        ),
    )
    total = sum(n for _, n in hist)
    if total == 0:
        return "0 seconds"
    # smallest octave whose cumulative coverage clears the target
    need = -(-total * coverage_ppm // 1_000_000)  # ceil div
    cum = 0
    for b, n in hist:
        cum += n
        if cum >= need:
            return "0 seconds" if b == 0 else f"{2 ** b - 1} seconds"
    return f"{2 ** hist[-1][0] - 1} seconds"  # unreachable; total covers


def running_ewma(
    df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Online EWMA smoother — the LIVE stateful sibling of the batch
    ``window_ewma_smooth`` query (round 13), extending the twin family
    (z-score, MAD, OHLC, intervals, CUSUM, flatline all have one).
    Emits one row per purchase event with the exponentially-weighted
    average of that event's bounded frame (the last _EWMA_FRAME values
    plus itself), exactly the batch query's restart-at-frame-head left
    fold: state per key is ONLY the ≤ _EWMA_FRAME-value ring, so the
    fold re-runs per event over at most 16 doubles — identical float
    op sequence to the batch window's F.aggregate, so live and batch
    agree bit-for-bit on ewma_u (the tests pin row equality).

    State is bounded, replayable and checkpoint-safe (the ring IS the
    frame; replaying a batch recomputes the same folds). Batch input
    delegates to the identical declarative window form instead of
    raising — the documented running_* convention.
    """
    from jorvik_spark.queries.windows import _EWMA_ALPHA, _EWMA_FRAME
    from pyspark.sql import Window

    filtered = df.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col(key_col).isNotNull()
        & (F.col("event_type") == "purchase")
    ).select(
        key_col,
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .cast("double")
        .alias("vu"),
    )
    if not df.isStreaming:
        w = (
            Window.partitionBy(key_col)
            .orderBy("ts_us", "event_id")
            .rowsBetween(-_EWMA_FRAME, Window.currentRow)
        )
        framed = filtered.withColumn("lst", F.collect_list("vu").over(w))
        ewma = F.aggregate(
            F.slice(F.col("lst"), 2, F.size("lst") - 1),
            F.element_at("lst", 1),
            lambda acc, x: acc * F.lit(1 - _EWMA_ALPHA)
            + x * F.lit(_EWMA_ALPHA),
        )
        return framed.select(
            key_col,
            "event_id",
            F.col("ts_us").cast("long").alias("t"),
            F.size("lst").cast("int").alias("n_in_frame"),
            F.floor(ewma + F.lit(0.5)).cast("long").alias("ewma_u"),
        )

    alpha, frame = _EWMA_ALPHA, _EWMA_FRAME

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        ring = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        out_eid, out_t, out_n, out_ewma = [], [], [], []
        for _, row in rows.iterrows():
            ring.append(float(row["vu"]))
            if len(ring) > frame + 1:
                ring.pop(0)
            # identical left fold as the batch window's F.aggregate
            acc = ring[0]
            for x in ring[1:]:
                acc = acc * (1 - alpha) + x * alpha
            out_eid.append(int(row["event_id"]))
            out_t.append(int(row["ts_us"]))
            out_n.append(len(ring))
            out_ewma.append(int(math.floor(acc + 0.5)))
        state.update((ring,))
        yield pd.DataFrame(
            {
                key_col: pd.array([key[0]] * len(out_eid), dtype="Int64"),
                "event_id": pd.array(out_eid, dtype="Int64"),
                "t": pd.array(out_t, dtype="Int64"),
                "n_in_frame": pd.array(out_n, dtype="Int32"),
                "ewma_u": pd.array(out_ewma, dtype="Int64"),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, event_id long, t long, "
            "n_in_frame int, ewma_u long"
        ),
        stateStructType="ring array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Split base for carrying >int64 exact integer sums through the Arrow
# state schema as (hi, lo) long pairs: v == hi * 2**60 + lo, 0 <= lo <
# 2**60 (Python divmod semantics make this exact for negatives too).
# Bounds: |v| < 2**123 — far past the DECIMAL(38,0) ceiling the batch
# twin's product sums live under.
_HILO_BASE = 1 << 60


def running_autocorr(
    df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Online lag-1 autocorrelation — the LIVE stateful sibling of the
    per-user moment stage inside the batch ``window_autocorr_census``
    query (round 13), extending the twin family (z-score, MAD, OHLC,
    intervals, CUSUM, flatline, EWMA all have one). Per key, every
    micro-batch re-emits (n_pairs, r_u): the Pearson correlation of
    consecutive purchase values so far, as a micro-unit long — the
    signal a live model-router reads to decide whether a user's stream
    has become momentum-driven (r → +1) or mean-reverting (r → −1).

    EXACT integer state, not float state: the five moments accumulate
    as Python arbitrary-precision integers and persist through the
    Arrow state schema as (hi, lo) long pairs split at 2^60 (the three
    product sums overflow int64 at natural data — the batch twin holds
    them in DECIMAL(38,0)); zero-variance sides are detected by
    any-value-differs flags against the first/second values (exactly
    the batch twin's MIN≠MAX guard, O(1) state), never a float test.
    r_u itself is the batch twin's identical fixed dag — exact ints →
    IEEE doubles → one multiply/subtract/sqrt/divide chain →
    floor(r*1e6+0.5) — so live and batch agree bit-for-bit and the
    restart test pins row equality. Degenerate series (< 3 pairs or a
    zero-variance side) report r_u NULL, the census's declared
    semantics.

    State per key is 16 longs — bounded, replayable, checkpoint-safe.
    Batch input delegates to the identical declarative form (the
    documented running_* convention).
    """
    filtered = df.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col(key_col).isNotNull()
        & (F.col("event_type") == "purchase")
    ).select(
        key_col,
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("vu"),
    )
    if not df.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(key_col).orderBy("ts_us", "event_id")
        pairs = filtered.select(
            key_col,
            F.lag("vu").over(w).alias("x"),
            F.col("vu").alias("y"),
        ).filter(F.col("x").isNotNull())
        xd = F.col("x").cast("decimal(19,0)")
        yd = F.col("y").cast("decimal(19,0)")
        mom = pairs.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(xd * yd).alias("sxy"),
            F.sum(xd * xd).alias("sxx"),
            F.sum(yd * yd).alias("syy"),
            # min!=max, not COUNT(DISTINCT) — the census's
            # Expand-avoidance (see window_autocorr_census)
            (F.min("x") != F.max("x")).cast("int").alias("dcx"),
            (F.min("y") != F.max("y")).cast("int").alias("dcy"),
        )
        nd = F.col("n").cast("double")
        sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
        r1 = F.when(
            (F.col("n") >= 3) & (F.col("dcx") == 1) & (F.col("dcy") == 1),
            (nd * F.col("sxy").cast("double") - sxd * syd)
            / F.sqrt(
                (nd * F.col("sxx").cast("double") - sxd * sxd)
                * (nd * F.col("syy").cast("double") - syd * syd)
            ),
        )
        return mom.select(
            key_col,
            F.col("n").cast("long").alias("n_pairs"),
            F.floor(r1 * 1_000_000 + F.lit(0.5)).cast("long").alias("r_u"),
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            (nv, prev, v0, v1, dx, dy, sx, sy,
             sxy_hi, sxy_lo, sxx_hi, sxx_lo, syy_hi, syy_lo) = state.get
            sxy = sxy_hi * _HILO_BASE + sxy_lo
            sxx = sxx_hi * _HILO_BASE + sxx_lo
            syy = syy_hi * _HILO_BASE + syy_lo
        else:
            nv, prev, v0, v1, dx, dy = 0, 0, 0, 0, 0, 0
            sx = sy = sxy = sxx = syy = 0
        # Concat ALL Arrow chunks before the one global sort (the
        # running_ewma pattern): a per-chunk sort would form pairs that
        # straddle a chunk boundary in arrival order whenever a key's
        # micro-batch spans multiple record batches, diverging from the
        # batch twin's (ts_us, event_id) ordering.
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        for vu in rows["vu"].astype("int64"):
            cur = int(vu)
            if nv == 0:
                v0 = cur
            elif nv == 1:
                v1 = cur
            if nv >= 1:
                # pair (prev -> cur): x-series gains prev, y gains cur
                if prev != v0:
                    dx = 1
                if nv >= 2 and cur != v1:
                    dy = 1
                sx += prev
                sy += cur
                sxy += prev * cur
                sxx += prev * prev
                syy += cur * cur
            prev = cur
            nv += 1
        sxy_hi, sxy_lo = divmod(sxy, _HILO_BASE)
        sxx_hi, sxx_lo = divmod(sxx, _HILO_BASE)
        syy_hi, syy_lo = divmod(syy, _HILO_BASE)
        state.update(
            (nv, prev, v0, v1, dx, dy, sx, sy,
             sxy_hi, sxy_lo, sxx_hi, sxx_lo, syy_hi, syy_lo)
        )
        n = nv - 1
        r_u = None
        if n >= 3 and dx and dy:
            # the batch twin's EXACT dag: ints -> IEEE doubles -> one
            # multiply/subtract/sqrt/divide chain -> half-up micro floor
            num = float(n) * float(sxy) - float(sx) * float(sy)
            den = math.sqrt(
                (float(n) * float(sxx) - float(sx) * float(sx))
                * (float(n) * float(syy) - float(sy) * float(sy))
            )
            r_u = int(math.floor(num / den * 1_000_000 + 0.5))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_pairs": pd.array([n], dtype="Int64"),
                "r_u": pd.array([r_u], dtype="Int64"),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, n_pairs long, r_u long",
        stateStructType=(
            "nv long, prev long, v0 long, v1 long, dx long, dy long,"
            " sx long, sy long, sxy_hi long, sxy_lo long,"
            " sxx_hi long, sxx_lo long, syy_hi long, syy_lo long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_holt(
    df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Online Holt level+trend smoother — the LIVE stateful sibling of
    the batch ``window_holt_smooth`` query (round 14), following the
    ``running_ewma`` pattern exactly: state per key is ONLY the
    bounded ≤ _HOLT_FRAME+1-value ring (the ring IS the frame), each
    event re-runs the identical left fold over at most 16 doubles with
    the 2-element list accumulator, so live and batch agree
    bit-for-bit on level_u/trend_u/forecast_u (tests pin row equality
    across a kill-and-resume). Batch input delegates to the identical
    declarative window form instead of raising — the documented
    running_* convention.
    """
    from pyspark.sql import Window

    from jorvik_spark.queries.windows import _HOLT_ALPHA, _HOLT_BETA, _HOLT_FRAME

    filtered = df.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col(key_col).isNotNull()
        & (F.col("event_type") == "purchase")
    ).select(
        key_col,
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .cast("double")
        .alias("vu"),
    )
    if not df.isStreaming:
        w = (
            Window.partitionBy(key_col)
            .orderBy("ts_us", "event_id")
            .rowsBetween(-_HOLT_FRAME, Window.currentRow)
        )
        framed = filtered.withColumn("lst", F.collect_list("vu").over(w))
        a, b = _HOLT_ALPHA, _HOLT_BETA

        def _step(acc, x):
            lvl = F.element_at(acc, 1)
            trd = F.element_at(acc, 2)
            new_l = x * F.lit(a) + (lvl + trd) * F.lit(1 - a)
            new_b = (new_l - lvl) * F.lit(b) + trd * F.lit(1 - b)
            return F.array(new_l, new_b)

        st = F.aggregate(
            F.slice(F.col("lst"), 2, F.size("lst") - 1),
            F.array(F.element_at("lst", 1), F.lit(0.0)),
            _step,
        )
        return framed.withColumn("st", st).select(
            key_col,
            "event_id",
            F.col("ts_us").cast("long").alias("t"),
            F.size("lst").cast("int").alias("n_in_frame"),
            F.floor(F.element_at("st", 1) + F.lit(0.5))
            .cast("long")
            .alias("level_u"),
            F.floor(F.element_at("st", 2) + F.lit(0.5))
            .cast("long")
            .alias("trend_u"),
            F.floor(
                F.element_at("st", 1) + F.element_at("st", 2) + F.lit(0.5)
            )
            .cast("long")
            .alias("forecast_u"),
        )

    alpha, beta, frame = _HOLT_ALPHA, _HOLT_BETA, _HOLT_FRAME

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        ring = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        out = {k: [] for k in ("eid", "t", "n", "l", "b", "f")}
        for _, row in rows.iterrows():
            ring.append(float(row["vu"]))
            if len(ring) > frame + 1:
                ring.pop(0)
            # identical left fold as the batch window's F.aggregate
            lvl, trd = ring[0], 0.0
            for x in ring[1:]:
                new_l = x * alpha + (lvl + trd) * (1 - alpha)
                trd = (new_l - lvl) * beta + trd * (1 - beta)
                lvl = new_l
            out["eid"].append(int(row["event_id"]))
            out["t"].append(int(row["ts_us"]))
            out["n"].append(len(ring))
            out["l"].append(int(math.floor(lvl + 0.5)))
            out["b"].append(int(math.floor(trd + 0.5)))
            out["f"].append(int(math.floor(lvl + trd + 0.5)))
        state.update((ring,))
        yield pd.DataFrame(
            {
                key_col: pd.array([key[0]] * len(out["eid"]), dtype="Int64"),
                "event_id": pd.array(out["eid"], dtype="Int64"),
                "t": pd.array(out["t"], dtype="Int64"),
                "n_in_frame": pd.array(out["n"], dtype="Int32"),
                "level_u": pd.array(out["l"], dtype="Int64"),
                "trend_u": pd.array(out["b"], dtype="Int64"),
                "forecast_u": pd.array(out["f"], dtype="Int64"),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, event_id long, t long, n_in_frame int,"
            " level_u long, trend_u long, forecast_u long"
        ),
        stateStructType="ring array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_churn(
    df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Online per-key inactivity tracker — the LIVE stateful sibling of
    the batch ``audit_user_churn_census`` (round 15): per event, the
    closed gap to the key's previous event and the running maximum
    historical gap. The census's churn ratio is then one narrow
    expression over each key's LATEST row (open silence ÷
    max_hist_gap_us) — an ops dashboard keeps this per-key state hot
    instead of re-scanning history per refresh.

    State per key is TWO longs (last event µs, max closed gap µs) —
    the smallest state in the running_* family. Ties inside a
    micro-batch break by (ts_us, event_id), the module convention, so
    live and batch agree bit-for-bit (the restart test pins row
    equality across a kill-and-resume). Batch input delegates to the
    identical declarative window form instead of raising.
    """
    filtered = df.filter(
        F.col("ts").isNotNull() & F.col(key_col).isNotNull()
    ).select(
        key_col,
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    if not df.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(key_col).orderBy("ts_us", "event_id")
        gap = F.col("ts_us") - F.lag("ts_us").over(w)
        run = Window.partitionBy(key_col).orderBy("ts_us", "event_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            filtered.withColumn("gap_us", gap)
            .withColumn("max_hist_gap_us", F.max("gap_us").over(run))
            .select(
                key_col,
                "event_id",
                F.col("ts_us").cast("long").alias("t"),
                F.col("gap_us").cast("long"),
                F.col("max_hist_gap_us").cast("long"),
            )
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_t, maxg = state.get if state.exists else (None, None)
        # decode the single-event sentinel stored below: a restored key
        # with (last_t, -1) has a timestamp but no gap history yet
        maxg = None if maxg == -1 else maxg
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        out = {k: [] for k in ("eid", "t", "gap", "maxg")}
        for _, row in rows.iterrows():
            t = int(row["ts_us"])
            gap = None if last_t is None else t - last_t
            if gap is not None and (maxg is None or gap > maxg):
                maxg = gap
            out["eid"].append(int(row["event_id"]))
            out["t"].append(t)
            out["gap"].append(gap)
            out["maxg"].append(maxg)
            last_t = t
        # state columns are non-nullable longs in practice once a key
        # has 2+ events; a single-event key stores (last_t, -1) and
        # decodes -1 back to "no history yet"
        state.update((last_t, -1 if maxg is None else maxg))
        yield pd.DataFrame(
            {
                key_col: pd.array([key[0]] * len(out["eid"]), dtype="Int64"),
                "event_id": pd.array(out["eid"], dtype="Int64"),
                "t": pd.array(out["t"], dtype="Int64"),
                "gap_us": pd.array(out["gap"], dtype="Int64"),
                "max_hist_gap_us": pd.array(out["maxg"], dtype="Int64"),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, event_id long, t long,"
            " gap_us long, max_hist_gap_us long"
        ),
        stateStructType="last_t long, maxg long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_breakout(
    df: DataFrame,
    key_col: str = "user_id",
    lookback: int = 8,
) -> DataFrame:
    """Online rolling-max breakout detector — the LIVE stateful sibling
    of the batch ``window_breakout_census`` (round 16): per event, the
    max of the key's previous ≤ ``lookback`` micro-quantized values and
    whether this reading strictly exceeds it (a new recent high). The
    census's per-user breakout counts are then a plain aggregate over
    these rows — an alerting pipeline consumes the per-event flag
    directly instead of re-windowing history.

    State per key is a hard-bounded ring of ≤ ``lookback`` longs (the
    holt/EWMA ring convention); ties inside a micro-batch break by
    (ts_us, event_id), the module convention, so live and batch agree
    bit-for-bit. Batch input delegates to the identical declarative
    window form instead of raising.
    """
    filtered = df.filter(
        F.col("ts").isNotNull()
        & F.col(key_col).isNotNull()
        & F.col("value").isNotNull()
    ).select(
        key_col,
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("vu"),
    )
    if not df.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(key_col).orderBy("ts_us", "event_id").rowsBetween(
            -lookback, -1
        )
        prev_max = F.max("vu").over(w)
        return filtered.select(
            key_col,
            "event_id",
            F.col("ts_us").cast("long").alias("t"),
            F.col("vu").cast("long"),
            prev_max.cast("long").alias("prev_max_u"),
            (
                prev_max.isNotNull() & (F.col("vu") > prev_max)
            ).alias("is_breakout"),
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (ring,) = state.get if state.exists else ([],)
        ring = list(ring)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        out = {k: [] for k in ("eid", "t", "vu", "pm", "br")}
        for _, row in rows.iterrows():
            t, vu = int(row["ts_us"]), int(row["vu"])
            pm = max(ring) if ring else None
            out["eid"].append(int(row["event_id"]))
            out["t"].append(t)
            out["vu"].append(vu)
            out["pm"].append(pm)
            out["br"].append(pm is not None and vu > pm)
            ring.append(vu)
            if len(ring) > lookback:
                ring.pop(0)
        state.update((ring,))
        yield pd.DataFrame(
            {
                key_col: pd.array([key[0]] * len(out["eid"]), dtype="Int64"),
                "event_id": pd.array(out["eid"], dtype="Int64"),
                "t": pd.array(out["t"], dtype="Int64"),
                "vu": pd.array(out["vu"], dtype="Int64"),
                "prev_max_u": pd.array(out["pm"], dtype="Int64"),
                "is_breakout": pd.array(out["br"], dtype="boolean"),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, event_id long, t long, vu long,"
            " prev_max_u long, is_breakout boolean"
        ),
        stateStructType="ring array<bigint>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
