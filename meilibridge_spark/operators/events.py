"""Event-stream operators over the events table (event_id, ts, user_id,
event_type, value, props): tumbling-window aggregation and
gap-sessionization — the stream-shaped capabilities a transcript/event
pipeline needs beyond CDC (watermarks + windowed aggs per the Spark
Structured Streaming model; the same expressions run identically in
batch, which is what the DuckDB oracle checks).

All pure Catalyst: F.window for the tumbling buckets (epoch-aligned,
matching DuckDB's time_bucket), window functions for sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window counts + value sums per event type ->
    (window_start, window_end, event_type, n_events, sum_value).
    Shuffle on (window, type) with map-side combine; epoch-aligned
    buckets."""
    return (
        events.groupBy(F.window(ts_col, window), F.col(type_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            type_col,
            "n_events",
            "sum_value",
        )
    )


def windowed_event_counts_stream(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "0 seconds",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Streaming form of ``windowed_event_counts``: the watermark bounds
    state and (in append mode) closes windows for late data handling.
    Same bucket semantics as the batch form."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col(type_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            type_col,
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes`` ->
    (event_id, user_id, ts, session_idx) with session_idx numbering a
    user's sessions from 1 in time order (ties broken by event id).
    Partition-parallel per user (Window.partitionBy — no global sort);
    the streaming equivalent is applyInPandasWithState keyed by user
    with the same gap rule."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # microsecond precision (unix_timestamp truncates to whole seconds
    # and would split sub-second gaps differently from the oracle's
    # epoch()); TIMESTAMP_NTZ casts to TIMESTAMP in the pinned-UTC
    # session, matching DuckDB's treatment of naive timestamps
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    is_new = F.when(
        prev.isNull()
        | (us(F.col(ts_col)) - us(prev) > gap_minutes * 60 * 1_000_000),
        1,
    ).otherwise(0)
    tagged = events.select(
        id_col, user_col, ts_col, is_new.alias("_new")
    )
    cum = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return tagged.select(
        id_col,
        user_col,
        ts_col,
        F.sum("_new").over(cum).cast("long").alias("session_idx"),
    )
