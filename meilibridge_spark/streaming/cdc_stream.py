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

from meilibridge_spark.config import IndexConfig
from meilibridge_spark.plans.incremental import apply_cdc
from meilibridge_spark.sources.cdc import CDC_SCHEMA
from meilibridge_spark.sources.tables import load_snapshot, save_snapshot


def start_cdc_sync(
    spark: SparkSession,
    cdc_path: str,
    index_dir: str,
    cfg: IndexConfig,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Stream CDC parquet files from ``cdc_path`` into the index at
    ``index_dir``. Each micro-batch: load current snapshot -> MERGE ->
    commit child snapshot. Returns the StreamingQuery.

    ``trigger_available_now=True`` processes the backlog then stops —
    the streaming analog of the reference's --auto scheduled re-sync
    (S20); pass False for a continuous query.
    """

    def process_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index = load_snapshot(spark, index_dir, cfg)
        merged = apply_cdc(index, batch_df, cfg)
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

    reader = (
        spark.readStream.schema(CDC_SCHEMA)
        .parquet(cdc_path)
    )
    writer = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
