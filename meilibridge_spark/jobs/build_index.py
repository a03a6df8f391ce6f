"""spark-submit job: bulk index build (the reference's `sync bulk`).

Usage:
  spark-submit --py-files meilibridge_spark.zip \
      meilibridge_spark/jobs/build_index.py \
      --source /path/to/transcripts.parquet \
      --index-dir /path/to/index \
      [--continue] [--synthetic-convs N] [--stop-words w1,w2] [--k1 1.2] [--b 0.75]

`--continue` resumes from staging / requires an existing index
(reference: --continue, cmd/meilibridge/commands/sync.go:62-107).
With --synthetic-convs the deterministic generator supplies the source
(no external data).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default=None)
    ap.add_argument("--source-format", default="parquet",
                    choices=("parquet", "ndjson", "json", "csv"),
                    help="document payload format (ndjson/csv follow "
                         "Meilisearch's payload conventions; csv "
                         "headers may be typed 'field:type')")
    ap.add_argument("--source-schema", default=None,
                    help="DDL schema for the payload ('transcripts' = "
                         "the standard transcript columns); skips the "
                         "json inference pass")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--continue", dest="cont", action="store_true")
    ap.add_argument(
        "--auto",
        type=int,
        default=None,
        metavar="SECONDS",
        help="S20 auto-bulk: re-run an incremental build every N seconds "
        "(reference default 1800, clamped >=1; config/config.go:31-33)",
    )
    ap.add_argument("--auto-rounds", type=int, default=0,
                    help="stop --auto after this many rounds (0 = forever)")
    ap.add_argument("--synthetic-convs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--stop-words", default="")
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--with-positions", action="store_true",
                    help="also build the positional postings table "
                         "(enables phrase search, Q14)")
    ap.add_argument("--with-attributes", action="store_true",
                    help="also build attr-mask blocks (attribute "
                         "criterion + attributesToSearchOn)")
    ap.add_argument("--with-typos", action="store_true",
                    help="also store the SymSpell deletion-neighborhood "
                         "table (typo serving without session rebuilds)")
    ap.add_argument("--filterable", default="",
                    help="comma-separated filterable_attributes "
                         "(persisted in the manifest, S17)")
    ap.add_argument("--sortable", default="",
                    help="comma-separated sortable_attributes (manifest)")
    ap.add_argument("--distinct-attribute", default=None,
                    help="distinct_attribute setting (manifest)")
    ap.add_argument("--geo-attributes", default=None,
                    help="lat_col,lng_col docs columns backing the "
                         "_geo field (enables _geoRadius/_geoBoundingBox "
                         "filters and _geoPoint sort; manifest)")
    args = ap.parse_args()
    geo = None
    if args.geo_attributes:
        parts = [a for a in args.geo_attributes.split(",") if a]
        if len(parts) != 2:
            ap.error("--geo-attributes must be exactly lat_col,lng_col")
        geo = tuple(parts)

    from meilibridge_spark.config import AnalyzerConfig, IndexConfig
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.session import build_session
    from meilibridge_spark.sources.transcripts import generate_transcripts

    spark = build_session("build_index", cores=args.cores)
    cfg = IndexConfig(
        index_name="transcripts",
        analyzer=AnalyzerConfig.make(
            stop_words=[w for w in args.stop_words.split(",") if w]
        ),
        k1=args.k1,
        b=args.b,
        filterable_attributes=tuple(
            a for a in args.filterable.split(",") if a
        ),
        sortable_attributes=tuple(a for a in args.sortable.split(",") if a),
        distinct_attribute=args.distinct_attribute,
        geo_attributes=geo,
    )
    if args.synthetic_convs:
        source = generate_transcripts(spark, n_convs=args.synthetic_convs, seed=args.seed)
    elif args.source:
        from meilibridge_spark.sources.ingest import read_documents

        schema = args.source_schema
        if schema == "transcripts":
            from meilibridge_spark.sources.transcripts import TRANSCRIPT_SCHEMA

            schema = TRANSCRIPT_SCHEMA
        source = read_documents(
            spark, args.source, fmt=args.source_format, schema=schema
        )
    else:
        ap.error("--source or --synthetic-convs required")
        return

    def one_build(is_continue: bool) -> None:
        t0 = time.time()
        index = build_and_save(
            spark, source, cfg, args.index_dir, recreate=not is_continue,
            with_positions=args.with_positions,
            with_attributes=args.with_attributes,
            with_typos=args.with_typos,
        )
        print(
            json.dumps(
                {
                    "snapshot_id": index.snapshot_id,
                    "n_docs": index.n_docs,
                    "avgdl": round(index.avgdl, 4),
                    "seconds": round(time.time() - t0, 3),
                    "metrics": index.metrics,
                }
            ),
            flush=True,
        )

    one_build(args.cont)
    if args.auto is not None:
        interval = max(1, args.auto)  # reference clamps >=1
        rounds = 0
        while args.auto_rounds == 0 or rounds < args.auto_rounds:
            time.sleep(interval)
            one_build(True)
            rounds += 1


if __name__ == "__main__":
    main()
