"""Realtime CDC sync as Structured Streaming (SURVEY.md §3.2 Spark shape).

The reference's `sync start` holds a Mongo change-stream per collection
and fires a goroutine per event (pkg/bridge/mongo.go:97-183, S21). Our
engine consumes the same event shape (sources/cdc.py CDC_SCHEMA) as a
stream — file source here; Kafka in production is a one-line swap — and
applies each micro-batch with the exact incremental MERGE
(plans/incremental.py) inside ``foreachBatch``, committing a snapshot
per batch. Idempotent MERGE + snapshot commit log give effective
exactly-once (re-applying a replayed batch is a no-op, S14 analog).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from meilibridge_spark.config import IndexConfig
from meilibridge_spark.plans.incremental import apply_cdc
from meilibridge_spark.sources.cdc import CDC_SCHEMA
from meilibridge_spark.sources.tables import (
    load_snapshot,
    save_snapshot,
    save_snapshot_delta,
)


def start_cdc_sync(
    spark: SparkSession,
    cdc_path: "str | None" = None,
    index_dir: str = "",
    cfg: "IndexConfig | None" = None,
    checkpoint_dir: str = "",
    trigger_available_now: bool = True,
    source=None,
    view_of=None,
    delta_commits: bool = False,
):
    """Stream CDC events into the index at ``index_dir``. Each
    micro-batch: load current snapshot -> MERGE -> commit child
    snapshot. Returns the StreamingQuery.

    The source is pluggable — the sink-side MERGE never sees where a
    batch came from:
    - ``cdc_path``: file source (parquet of CDC_SCHEMA rows), the
      sandbox default;
    - ``source``: ANY streaming DataFrame already shaped to CDC_SCHEMA
      — ``spark.readStream.format("kafka")...`` with the value parsed
      via ``from_json(..., CDC_SCHEMA)``, a rate source mapped to
      events (tested), a socket feed, etc. This is the "Kafka is a
      config swap" claim made executable.

    ``view_of``: optional zero-arg callable returning the CURRENT join
    view DataFrame (S25 streaming shape): each micro-batch of
    base-table CDC then re-fetches the touched VIEW rows
    (operators/views.view_cdc_events) before the MERGE — the streaming
    analog of the reference's view-aware event handlers
    (pkg/bridge/mongo.go:196-205). The callable is invoked per batch so
    it reads the source tables' current state, exactly like the
    reference's per-event FindOne against the source view.

    ``trigger_available_now=True`` processes the backlog then stops —
    the streaming analog of the reference's --auto scheduled re-sync
    (S20); pass False for a continuous query.

    ``delta_commits=True`` commits each micro-batch as a DELTA snapshot
    (save_snapshot_delta): the write costs O(touched docs +
    affected-term postings) instead of a full-corpus rewrite — the only
    viable shape for a continuous stream over a 10^12-turn corpus.
    Run compact_snapshot (jobs/compact.py) periodically to collapse the
    chain; expire_snapshots keeps the ancestor closure alive.
    """
    if (source is None) == (cdc_path is None):
        raise ValueError("pass exactly one of cdc_path / source")
    if not index_dir or cfg is None or not checkpoint_dir:
        raise ValueError(
            "index_dir, cfg and checkpoint_dir are required (they are "
            "keyword-optional only so cdc_path/source can be swapped)"
        )

    def process_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from meilibridge_spark.sources.tasks import task_scope

        # each micro-batch commit is one journaled task (/tasks analog
        # — the reference WaitForTask's every write; a failed epoch
        # surfaces as a failed task a monitor can poll for)
        with task_scope(
            index_dir,
            "documentAdditionOrUpdate",
            index_uid=cfg.normalized_name(),
            details={"cdcEpoch": int(epoch_id)},
        ) as task:
            index = load_snapshot(spark, index_dir, cfg)
            if view_of is not None:
                from meilibridge_spark.operators.views import view_cdc_events

                batch_df = view_cdc_events(view_of(), batch_df)
            merged = apply_cdc(index, batch_df, cfg)
            if delta_commits:
                save_snapshot_delta(
                    merged,
                    index_dir,
                    extra_metrics={"cdc_epoch": int(epoch_id)},
                )
                task["details"] = {"snapshotId": merged.snapshot_id,
                                   "delta": True}
                return
            merged.docs = merged.docs.persist()
            merged.postings = merged.postings.persist()
            save_snapshot(
                merged,
                index_dir,
                parent_id=index.snapshot_id,
                extra_metrics={"cdc_epoch": int(epoch_id)},
            )
            merged.docs.unpersist()
            merged.postings.unpersist()
            task["details"] = {"snapshotId": merged.snapshot_id}

    reader = (
        source
        if source is not None
        else spark.readStream.schema(CDC_SCHEMA).parquet(cdc_path)
    )
    writer = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rate_source_cdc(spark: SparkSession, rows_per_batch: int = 5):
    """Kafka stand-in for the source-abstraction tests: map the built-in
    ``rate-micro-batch`` source to CDC insert events (batch 0 always
    carries values 0..rows_per_batch-1, so the first micro-batch is
    deterministic). A real Kafka feed differs only in the reader:

        spark.readStream.format("kafka").option(...).load()
             .select(F.from_json(F.col("value").cast("string"),
                                 CDC_SCHEMA).alias("e")).select("e.*")

    — the sink side (start_cdc_sync's foreachBatch MERGE) is identical.
    """
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    conv = F.concat(F.lit("stream-"), F.col("value"))
    doc = F.struct(
        conv.alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("streamed turn number "), F.col("value")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("timestamp").alias("ts"),
    )
    return raw.select(
        F.lit("insert").alias("op"),
        conv.alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        doc.alias("full_document"),
        F.lit(None).cast("map<string,string>").alias("updated_fields"),
        F.lit(None).cast("array<string>").alias("removed_fields"),
        F.col("timestamp").alias("ts"),
    )
