"""spark-submit job: BM25 top-k query against a saved index.

Usage:
  spark-submit --py-files meilibridge_spark.zip \
      meilibridge_spark/jobs/query.py \
      --index-dir /path/to/index --query "spark join" [-k 10] \
      [--mode df|wand] [--filter-role user]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--mode", choices=["df", "wand"], default="wand")
    ap.add_argument("--filter-role", default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from meilibridge_spark.config import IndexConfig
    from meilibridge_spark.operators.search import search, search_wand
    from meilibridge_spark.session import build_session
    from meilibridge_spark.sources.tables import load_snapshot

    spark = build_session("query", cores=args.cores)
    cfg = IndexConfig(index_name="transcripts")
    index = load_snapshot(spark, args.index_dir, cfg)

    if args.mode == "wand" and not args.filter_role:
        hits = search_wand(index, args.query, args.k)
        out = [{"doc_id": d, "score": round(s, 6)} for d, s in hits]
    else:
        filt = (
            index.docs.filter(F.col("role") == args.filter_role).select("doc_id")
            if args.filter_role
            else None
        )
        rows = search(index, args.query, args.k, filter_docs=filt).collect()
        out = [
            {"doc_id": r["doc_id"], "score": round(r["score"], 6)} for r in rows
        ]
    print(json.dumps({"query": args.query, "k": args.k, "hits": out}))


if __name__ == "__main__":
    main()
