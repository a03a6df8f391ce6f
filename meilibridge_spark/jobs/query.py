"""spark-submit job: BM25 top-k query against a saved index.

Usage:
  spark-submit --py-files meilibridge_spark.zip \
      meilibridge_spark/jobs/query.py \
      --index-dir /path/to/index --query "spark join" [-k 10] \
      [--mode df|wand] [--filter-role user]

Batch mode (one scatter-gather Spark job for the whole file, postings
served from the doc-shard cached layout):
  ... query.py --index-dir /path/to/index --queries-file qs.txt [-k 10]
      [--filter-role user]
  (qs.txt: one query per line; output: one JSON line per query;
  --filter-role rides the batch scatter-gather as a doc-shard bitmap;
  --mode applies only to single-query runs and errors in batch mode)
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query")
    ap.add_argument("--queries-file", help="batch mode: one query per line")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--mode", choices=["df", "wand"], default=None,
                    help="single-query path (default wand); invalid in batch mode")
    ap.add_argument("--filter-role", default=None)
    ap.add_argument("--filter", dest="filter_expr", default=None,
                    help="Meilisearch filter expression over filterable "
                         "attributes, e.g. \"role = 'user' AND tool EXISTS\"")
    ap.add_argument("--typo", action="store_true",
                    help="typo-tolerant term expansion (Q12)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if not args.query and not args.queries_file:
        ap.error("one of --query / --queries-file is required")
    if args.queries_file and args.mode is not None:
        ap.error("--mode applies to --query only; batch mode always uses "
                 "the scatter-gather path")
    mode = args.mode or "wand"

    from pyspark.sql import functions as F

    from meilibridge_spark.config import IndexConfig
    from meilibridge_spark.operators.search import (
        prepare_serving,
        search,
        search_many,
        search_wand,
    )
    from meilibridge_spark.session import build_session
    from meilibridge_spark.sources.tables import load_snapshot

    if args.filter_expr and args.filter_role:
        ap.error("--filter and --filter-role are mutually exclusive")

    spark = build_session("query", cores=args.cores)
    # attribute lists (filterable/sortable/...) are NOT hardcoded here:
    # load_snapshot adopts the settings the index was BUILT with from
    # the manifest, so --filter enforcement is index-defined
    cfg = IndexConfig(index_name="transcripts")
    index = load_snapshot(spark, args.index_dir, cfg)

    def make_filter():
        if args.filter_expr:
            from meilibridge_spark.functions.filters import filter_doc_ids

            return filter_doc_ids(index, args.filter_expr)
        if args.filter_role:
            return index.docs.filter(
                F.col("role") == args.filter_role
            ).select("doc_id")
        return None

    if args.queries_file:
        with open(args.queries_file) as f:
            batch = [
                (f"q{i:05d}", line.strip())
                for i, line in enumerate(f)
                if line.strip()
            ]
        filt = make_filter()
        if filt is None:
            prepare_serving(index)  # shuffle-free only helps unfiltered
        rows = search_many(
            index, batch, k=args.k, filter_docs=filt, typo=args.typo
        ).collect()
        hits: "dict[str, list]" = {qid: [] for qid, _ in batch}
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            hits[r["query_id"]].append(
                {"doc_id": r["doc_id"], "score": round(r["score"], 6)}
            )
        for qid, text in batch:
            print(json.dumps({"query_id": qid, "query": text, "hits": hits[qid]}))
        return

    query_text = args.query
    if args.typo:
        from meilibridge_spark.functions.tokenizer import parse_query
        from meilibridge_spark.operators.search import typo_expand_terms

        query_text = " ".join(
            typo_expand_terms(index, parse_query(args.query, cfg.analyzer))
        )
    if mode == "wand" and not args.filter_role and not args.filter_expr:
        hits = search_wand(index, query_text, args.k)
        out = [{"doc_id": d, "score": round(s, 6)} for d, s in hits]
    else:
        rows = search(
            index, query_text, args.k, filter_docs=make_filter()
        ).collect()
        out = [
            {"doc_id": r["doc_id"], "score": round(r["score"], 6)} for r in rows
        ]
    print(json.dumps({"query": args.query, "k": args.k, "hits": out}))


if __name__ == "__main__":
    main()
