"""spark-submit job: OPTIMIZE-style snapshot compaction + expiry.

Usage:
  spark-submit --py-files meilibridge_spark.zip \
      meilibridge_spark/jobs/compact.py \
      --index-dir /path/to/index [--target-file-mb 128] \
      [--expire-keep-last N]

Rewrites the current snapshot with file counts sized from actual bytes
(many CDC micro-batch files -> few full files; block contents already
canonical, see sources/tables.compact_snapshot), then optionally
expires old snapshots. Prints one JSON line with the before/after
file/byte metrics recorded in the manifest.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--expire-keep-last", type=int, default=None,
                    help="after compacting, keep only the newest N "
                         "snapshots (the compacted one included)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from meilibridge_spark.config import IndexConfig
    from meilibridge_spark.session import build_session
    from meilibridge_spark.sources.tables import (
        compact_snapshot,
        expire_snapshots,
        snapshot_log,
    )

    spark = build_session("compact", cores=args.cores)
    cfg = IndexConfig(index_name="transcripts")
    new_id = compact_snapshot(
        spark, args.index_dir, cfg,
        target_file_bytes=args.target_file_mb << 20,
    )
    expired = (
        expire_snapshots(args.index_dir, keep_last=args.expire_keep_last)
        if args.expire_keep_last is not None
        else []
    )
    entry = next(
        s for s in snapshot_log(args.index_dir) if s["snapshot_id"] == new_id
    )
    print(
        json.dumps(
            {
                "snapshot_id": new_id,
                "expired": expired,
                "compaction": entry["metrics"]["compaction"],
            }
        )
    )


if __name__ == "__main__":
    main()
