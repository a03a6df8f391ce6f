"""Structured-Streaming CDC sync (S21/S20): the foreachBatch MERGE is
source-agnostic — exercised with the file source (availableNow backlog
drain) AND a Kafka-shaped rate source (continuous micro-batches),
proving the 'swap the reader, keep the sink' claim executable."""

import os
import time

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import AnalyzerConfig, IndexConfig
from meilibridge_spark.operators.search import search
from meilibridge_spark.plans.build import build_and_save
from meilibridge_spark.sources.cdc import generate_cdc_batch
from meilibridge_spark.sources.tables import load_snapshot, snapshot_log
from meilibridge_spark.sources.transcripts import generate_transcripts
from meilibridge_spark.streaming.cdc_stream import (
    rate_source_cdc,
    start_cdc_sync,
)

CFG = IndexConfig(
    index_name="stream-idx",
    primary_key=("conv_id", "turn_idx"),
    analyzer=AnalyzerConfig.make(stop_words=["ba"]),
)


def test_file_source_available_now(spark, tmp_index_dir, tmp_path):
    base = generate_transcripts(spark, n_convs=8, seed=4)
    build_and_save(spark, base, CFG, tmp_index_dir)
    cdc = generate_cdc_batch(
        spark, base, seed=2, n_updates=3, n_inserts=2, n_deletes=1, n_replaces=1
    )
    cdc_dir = str(tmp_path / "cdc")
    cdc.write.parquet(cdc_dir)
    q = start_cdc_sync(
        spark,
        cdc_path=cdc_dir,
        index_dir=tmp_index_dir,
        cfg=CFG,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    log = snapshot_log(tmp_index_dir)
    assert len(log) == 2 and log[-1]["parent_snapshot_id"] == 1
    idx = load_snapshot(spark, tmp_index_dir, CFG)
    # an inserted turn's vocabulary is searchable post-merge
    hits = search(idx, "inserted turn", 5)
    assert hits.count() > 0


def test_exactly_one_of_path_or_source(spark, tmp_index_dir):
    with pytest.raises(ValueError, match="exactly one"):
        start_cdc_sync(spark, cdc_path=None, index_dir=tmp_index_dir, cfg=CFG)


def test_rate_source_kafka_shape(spark, tmp_index_dir, tmp_path):
    """Continuous micro-batches from a non-file source through the SAME
    foreachBatch sink: batch 0 of rate-micro-batch deterministically
    inserts stream-0..stream-4."""
    base = generate_transcripts(spark, n_convs=6, seed=5)
    build_and_save(spark, base, CFG, tmp_index_dir)
    q = start_cdc_sync(
        spark,
        index_dir=tmp_index_dir,
        cfg=CFG,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        trigger_available_now=False,
        source=rate_source_cdc(spark, rows_per_batch=5),
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and len(snapshot_log(tmp_index_dir)) < 2:
            time.sleep(1)
        assert len(snapshot_log(tmp_index_dir)) >= 2, "no micro-batch committed"
    finally:
        q.stop()
    idx = load_snapshot(spark, tmp_index_dir, CFG)
    docs = {
        r["conv_id"]
        for r in idx.docs.filter(
            F.col("conv_id").startswith("stream-")
        ).collect()
    }
    assert {"stream-0", "stream-1", "stream-2", "stream-3", "stream-4"} <= docs
    assert search(idx, "streamed", 10).count() > 0


def test_streaming_view_sync(spark, tmp_index_dir, tmp_path):
    """S25 x S21: base-table CDC streamed into a VIEW-backed index.
    The source-of-truth base parquet is already advanced (CDC events
    describe changes that have happened at the source); each
    micro-batch re-fetches touched view rows via view_of()."""
    from meilibridge_spark.operators.search import search
    from meilibridge_spark.sources.cdc import apply_events
    from tests.test_views import _dim, _view

    base0 = generate_transcripts(spark, n_convs=6, seed=8).persist()
    dim = _dim(spark, base0)
    build_and_save(spark, _view(base0, dim), CFG, tmp_index_dir)

    cdc = generate_cdc_batch(
        spark, base0, seed=4, n_updates=3, n_inserts=2, n_deletes=1, n_replaces=1
    )
    base_dir = str(tmp_path / "base")
    apply_events(base0, cdc).write.parquet(base_dir)  # source advanced
    cdc_dir = str(tmp_path / "cdc")
    cdc.write.parquet(cdc_dir)

    q = start_cdc_sync(
        spark,
        cdc_path=cdc_dir,
        index_dir=tmp_index_dir,
        cfg=CFG,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
        view_of=lambda: _view(spark.read.parquet(base_dir), dim),
    )
    q.awaitTermination(180)
    idx = load_snapshot(spark, tmp_index_dir, CFG)
    # docs match the final view state exactly
    want = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in _view(spark.read.parquet(base_dir), dim).collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in idx.docs.collect()
    }
    assert got == want
    # an inserted turn picked up its conv's dim topic through the view
    hits = search(idx, "inserted turn", 5)
    joined = hits.join(idx.docs.select("doc_id", "text"), "doc_id").collect()
    assert joined and all(
        any(t in r["text"] for t in ("quasar", "nebula", "pulsar"))
        for r in joined
    )


def test_windowed_agg_with_watermark(spark):
    """Watermarked tumbling-window aggregation in append mode: windows
    close as the (deterministic rate-micro-batch) event time advances
    past window_end + watermark, and each closed 2-minute window holds
    exactly the 2 batches x 10 rows that fell in it."""
    import time as _t

    from pyspark.sql import functions as F

    from meilibridge_spark.operators.events import (
        windowed_event_counts_stream,
    )

    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 10)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 60_000)
        .load()
    )
    ev = raw.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % 2).cast("string").alias("event_type"),
    )
    out = windowed_event_counts_stream(ev, window="2 minutes", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .start()
    )
    try:
        deadline = _t.time() + 120
        rows = []
        while _t.time() < deadline:
            rows = spark.sql("SELECT * FROM winagg").collect()
            if len(rows) >= 4:  # two closed windows x two event types
                break
            _t.sleep(1)
        assert len(rows) >= 4, rows
    finally:
        q.stop()
    by_window: dict = {}
    for r in rows:
        secs = (r["window_end"] - r["window_start"]).total_seconds()
        assert secs == 120.0
        by_window.setdefault(r["window_start"], 0)
        by_window[r["window_start"]] += r["n_events"]
    # each closed 2-min window = 2 rate batches x 10 rows
    assert all(v == 20 for v in by_window.values()), by_window


def test_start_cdc_sync_requires_sink_args(spark, tmp_path):
    with pytest.raises(ValueError, match="required"):
        start_cdc_sync(spark, cdc_path=str(tmp_path))


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState gap sessionization: replaying the events
    table as TWO micro-batches (split by time, per-user order preserved
    across batches) must reproduce the batch sessionize() output
    exactly — state (last_ts, n_sessions) carries the rule over the
    batch boundary."""
    import shutil

    from meilibridge_spark.operators.events import sessionize, sessionize_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ts_sorted = [r["ts"] for r in events.select("ts").orderBy("ts").collect()]
    cut = ts_sorted[len(ts_sorted) // 2]

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for i, part in enumerate(
        (events.filter(F.col("ts") < F.lit(cut)),
         events.filter(F.col("ts") >= F.lit(cut)))
    ):
        d = tmp_path / f"w{i}"
        part.coalesce(1).write.parquet(str(d))
        src = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        dst = stream_dir / f"{i:02d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300), "stream did not drain in time"
    finally:
        q.stop()
    got = {
        r["event_id"]: r["session_idx"]
        for r in spark.table("sess_stream").collect()
    }
    want = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert len(got) == events.count()
    assert got == want


def test_sessionize_stream_string_users(spark, tmp_path):
    """Output dtypes follow the input schema: string user ids and int
    event ids stream through unchanged (the batch form is type-agnostic;
    the stateful form must be too)."""
    from meilibridge_spark.operators.events import sessionize, sessionize_stream

    rows = [
        (1, "u-a", "2026-01-01 10:00:00"),
        (2, "u-a", "2026-01-01 10:05:00"),
        (3, "u-a", "2026-01-01 12:00:00"),
        (4, "u-b", "2026-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = tmp_path / "ev"
    df.coalesce(1).write.parquet(str(d))
    stream = spark.readStream.schema(df.schema).parquet(str(d))
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_str")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in spark.table("sess_str").collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == want == {
        ("u-a", 1): 1, ("u-a", 2): 1, ("u-a", 3): 2, ("u-b", 4): 1
    }
