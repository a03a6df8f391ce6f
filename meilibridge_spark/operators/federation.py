"""Federated multi-index search (Meilisearch ``POST /multi-search``
with ``federation``): one query ranked across SEVERAL indexes, hits
merged into a single list by weighted ranking score.

Meilisearch federation merges per-index hits on
``weightedRankingScore = _rankingScore * weight`` (docs.meilisearch.com
multi-search, federated mode). This engine's absolute [0, 1]
``_ranking_score`` (operators/relational.ranking_scores — the
documented showRankingScore analog) plays that role: raw BM25 sums are
NOT comparable across indexes with different corpora/analyzers, the
normalized rule-wise score is.

Plan shape: each target contributes its own bounded top-k (the same
plans the single-index paths use — scatter-gather, pushed term
filters); the federation itself is a unionByName of T tiny (<= k row)
DataFrames and one ordered limit — no cross-index shuffle of anything
doc-granular, so federating T indexes costs T independent searches
plus an O(T*k) merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meilibridge_spark.functions.tokenizer import parse_query
from meilibridge_spark.operators.relational import ranking_scores
from meilibridge_spark.operators.search import InvertedIndex, search


def federated_search(
    targets: "list[tuple[str, InvertedIndex, float]]",
    query: str,
    k: "int | None" = None,
    per_index_kwargs: "dict[str, dict] | None" = None,
) -> DataFrame:
    """One ``query`` across ``targets`` = [(index_uid, index, weight)]
    -> global top-k (index_uid, doc_id, score, ranking_score,
    weighted_ranking_score), ordered by weighted score desc with
    (score desc, index_uid, doc_id) as the deterministic tie-break.

    ``weight`` is Meilisearch's federation weight (>= 0, default 1.0
    — boosts or demotes a whole index). ``per_index_kwargs`` forwards
    extra search() options (filter_docs, attributes_to_search_on, ...)
    to specific targets by uid, like per-query options in the
    multi-search body.
    """
    if not targets:
        raise ValueError("federated_search needs at least one target")
    uids = [u for u, _, _ in targets]
    if len(set(uids)) != len(uids):
        raise ValueError(f"duplicate index_uid in targets: {uids}")
    parts = []
    for uid, index, weight in targets:
        if weight < 0:
            raise ValueError(f"weight for {uid!r} must be >= 0, got {weight}")
        kk = k or index.cfg.max_total_hits
        kw = (per_index_kwargs or {}).get(uid, {})
        n_q = len(parse_query(query, index.cfg.analyzer))
        if n_q == 0:
            continue
        hits = search(index, query, kk, **kw)
        scored = ranking_scores(hits, n_query_terms=n_q)
        parts.append(
            scored.select(
                F.lit(uid).alias("index_uid"),
                "doc_id",
                "score",
                F.col("_ranking_score").alias("ranking_score"),
                (F.col("_ranking_score") * F.lit(float(weight))).alias(
                    "weighted_ranking_score"
                ),
            )
        )
    spark = targets[0][1].postings.sparkSession
    schema = (
        "index_uid string, doc_id long, score double, "
        "ranking_score double, weighted_ranking_score double"
    )
    if not parts:
        return spark.createDataFrame([], schema)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged.orderBy(
        F.col("weighted_ranking_score").desc(),
        F.col("score").desc(),
        F.col("index_uid").asc(),
        F.col("doc_id").asc(),
    ).limit(k or max(t[1].cfg.max_total_hits for t in targets))
