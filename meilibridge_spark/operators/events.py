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


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
):
    """Streaming gap sessionization — the custom STATEFUL operator form
    (``applyInPandasWithState`` keyed by user): per-user state carries
    (last event time, sessions so far), each micro-batch extends it
    with the same gap rule as :func:`sessionize`, so replaying a stream
    whose per-user event times are non-decreasing ACROSS micro-batches
    yields exactly the batch output (tested). Within a micro-batch,
    arrival order is irrelevant (events are sorted by (ts, id) before
    the cumulative rule — Spark gives no intra-batch order guarantee).

    Scale shape: state is two longs per user (bounded by |users|, not
    |events|), batches process vectorized (shift/cumsum over the
    group's pandas frame, no per-event Python loop beyond numpy), and
    the only exchange is the groupBy(user) hash partitioning — the
    standard stateful-streaming layout. Out-of-order delivery ACROSS
    batches is the documented limit (state has already advanced; a
    straggler older than last_ts starts/extends sessions by the gap
    rule against the newest timestamp, exactly how a low-watermark
    violation behaves in any single-pass sessionizer).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    gap_us = gap_minutes * 60 * 1_000_000
    # output dtypes follow the INPUT schema (string users, int ids and
    # TIMESTAMP_NTZ all work, like the batch sessionize) — only the
    # session index has a fixed type
    in_types = {f.name: f.dataType for f in stream.schema.fields}
    out_schema = StructType(
        [
            StructField(id_col, in_types[id_col]),
            StructField(user_col, in_types[user_col]),
            StructField(ts_col, in_types[ts_col]),
            StructField("session_idx", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_us", LongType()), StructField("n_sessions", LongType())]
    )

    def fn(key, pdfs, state: "GroupState"):
        import numpy as np
        import pandas as pd

        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, id_col], kind="mergesort")
        us = rows[ts_col].astype("int64").to_numpy() // 1_000  # ns -> us
        last_us, n_sessions = state.get if state.exists else (None, 0)
        prev = np.empty_like(us)
        prev[1:] = us[:-1]
        new = np.empty(len(us), dtype=np.int64)
        if last_us is None:
            new[0] = 1
        else:
            prev[0] = last_us
            new[0] = 1 if us[0] - last_us > gap_us else 0
        new[1:] = (us[1:] - prev[1:] > gap_us).astype(np.int64)
        sidx = int(n_sessions) + np.cumsum(new)
        state.update((int(us[-1]), int(sidx[-1])))
        yield pd.DataFrame(
            {
                id_col: rows[id_col].to_numpy(),
                user_col: key[0],
                ts_col: rows[ts_col].to_numpy(),
                "session_idx": sidx,
            }
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
