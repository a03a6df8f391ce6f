"""BM25 top-k query execution (SURVEY.md §3.3 'fourth lifecycle').

Three paths over the same postings tables, all rank-identical (tested):

- ``search``        distributed DataFrame path: filter postings to the
                    query's terms (parquet row-group pruning via the
                    term-sorted layout), decode via mapInPandas, score
                    JVM-side, groupBy(doc_id) + orderBy + limit(k).
- ``search_many``   batch of queries in ONE job — the throughput path:
                    decode the union of needed terms once, broadcast-join
                    the (query_id, term, idf) plan, window top-k per query.
- ``search_wand``   driver-side block-max WAND over the collected term
                    postings — the serving path; exact (WAND-on ==
                    WAND-off, FIXTURES.md §6).

Scores: sum_t idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), ordering
(score desc, doc_id asc); `score` is rounded to 1e-9 only at comparison
boundaries (tests / oracles), not here.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meilibridge_spark.functions.bm25 import idf as idf_fn
from meilibridge_spark.functions.bm25 import impact_upper_bound
from meilibridge_spark.functions.codec import decode_block
from meilibridge_spark.functions.tokenizer import parse_query
from meilibridge_spark.functions.wand import TermPostings, dense_topk, wand_topk
from meilibridge_spark.sources.tables import InvertedIndex

DECODED_SCHEMA = "term string, doc_id long, tf long, dl long"

SCORED_SCHEMA = "qkey string, doc_id long, score double"

#: scorer output when the batch runs with the 'words' ranking criterion
SCORED_SCHEMA_M = "qkey string, doc_id long, score double, matched int"


def decode_postings(postings: DataFrame) -> DataFrame:
    """Posting blocks -> (term, doc_id, tf, dl) rows via mapInPandas
    (numpy varint decode, Arrow-batched)."""

    # manual column pruning: mapInPandas consumes every input column, so
    # without this select the parquet scan reads all block metadata too
    postings = postings.select(
        "term", "first_doc", "docs_bin", "tfs_bin", "dls_bin"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            terms, docs, tfs, dls = [], [], [], []
            for row in pdf.itertuples(index=False):
                d, t, dl = decode_block(
                    row.first_doc, row.docs_bin, row.tfs_bin, row.dls_bin
                )
                terms.append(np.repeat(row.term, d.size))
                docs.append(d)
                tfs.append(t)
                dls.append(dl)
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(docs),
                    "tf": np.concatenate(tfs),
                    "dl": np.concatenate(dls),
                }
            )

    return postings.mapInPandas(_decode, schema=DECODED_SCHEMA)


def _idf_map(index: InvertedIndex, q_terms: "list[str]") -> "dict[str, float]":
    """Tiny driver-side lookup of the query terms' df -> idf (term
    metadata broadcast, SURVEY §3 note). Results are memoized on the
    index (terms are immutable within a snapshot), so a warm serving
    loop pays zero Spark jobs here; absent terms memoize as misses."""
    if not q_terms:
        return {}
    cache: "dict[str, float | None] | None" = getattr(index, "_idf_cache", None)
    if cache is None:
        cache = {}
        index._idf_cache = cache
    missing = [t for t in q_terms if t not in cache]
    if missing:
        df_map = getattr(index, "_df_map", None)
        if df_map is not None:
            # vocabulary prefetched (prepare_serving): zero Spark jobs
            for t in missing:
                df = df_map.get(t)
                cache[t] = (
                    float(idf_fn(index.n_docs, df)) if df is not None else None
                )
        else:
            rows = index.terms.filter(F.col("term").isin(missing)).collect()
            found = {
                r["term"]: float(idf_fn(index.n_docs, r["df"])) for r in rows
            }
            for t in missing:
                cache[t] = found.get(t)
    return {t: v for t in q_terms if (v := cache.get(t)) is not None}


def _contrib_col(index: InvertedIndex) -> "F.Column":
    k1, b = index.cfg.k1, index.cfg.b
    dl_norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(index.avgdl)
    )
    return F.col("idf") * F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + dl_norm)


def candidate_rows(index: InvertedIndex, q_terms: "list[str]") -> DataFrame:
    """Decoded candidate postings for the query terms. The term filter
    lands on the parquet scan (sorted-by-term layout -> row-group skip)."""
    return decode_postings(index.postings.filter(F.col("term").isin(q_terms)))


def search(
    index: InvertedIndex,
    query: str,
    k: "int | None" = None,
    filter_docs: "DataFrame | None" = None,
    words_rank: "bool | None" = None,
    orig_terms: "list[str] | None" = None,
    typo_rank: bool = False,
) -> DataFrame:
    """Top-k hits as a DataFrame (doc_id, score, matched_terms
    [, matched_exact]).

    ``filter_docs``: optional DataFrame with a doc_id column restricting
    candidates (Q7 filterable attributes -> pre-score semi-join); BM25
    stats stay corpus-global (Meilisearch filter semantics).

    ``words_rank`` (default cfg.words_ranking): Q11 'words' criterion —
    docs matching more query terms rank first (matched_terms desc),
    BM25 then doc_id break ties; the head of the reference's default
    ranking_rules [words, typo, ...] (config/type.go:56).

    ``orig_terms`` + ``typo_rank``: Q11 'typo' criterion (second rule
    of the default list), simplified as documented: when the query was
    typo-expanded, docs matching more ORIGINAL (exact) terms rank above
    docs matched only through expansions (matched_exact desc). Both
    flags compose in reference rule order: words, then typo, then BM25.
    """
    k = k or index.cfg.max_total_hits
    if words_rank is None:
        words_rank = index.cfg.words_ranking
    if typo_rank and orig_terms is None:
        raise ValueError("typo_rank requires orig_terms")
    q_terms = parse_query(query, index.cfg.analyzer)
    idf_map = _idf_map(index, q_terms)
    spark = index.postings.sparkSession
    if not idf_map:
        return spark.createDataFrame(
            [], "doc_id long, score double, matched_terms int"
        )
    rows = candidate_rows(index, list(idf_map))
    if filter_docs is not None:
        # no forced broadcast: a filterable-attribute set can be a large
        # fraction of the corpus (same hazard as the relational hit-set
        # joins) — AQE picks broadcast from the MEASURED filter size
        # when it is actually small
        rows = rows.join(filter_docs.select("doc_id"), "doc_id", "left_semi")
    idf_expr = F.create_map(
        *[x for t, v in idf_map.items() for x in (F.lit(t), F.lit(v))]
    )
    scored = rows.withColumn("idf", idf_expr[F.col("term")]).withColumn(
        "contrib", _contrib_col(index)
    )
    aggs = [
        F.sum("contrib").alias("score"),
        F.count("*").cast("int").alias("matched_terms"),
    ]
    if orig_terms is not None:
        aggs.append(
            F.sum(
                F.when(F.col("term").isin(list(orig_terms)), 1).otherwise(0)
            )
            .cast("int")
            .alias("matched_exact")
        )
    agg = scored.groupBy("doc_id").agg(*aggs)
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    if typo_rank:
        order.insert(0, F.col("matched_exact").desc())
    if words_rank:
        order.insert(0, F.col("matched_terms").desc())
    return agg.orderBy(*order).limit(k)


def _decode_shard_terms(
    rows,
    base: int,
    avgdl: float,
    k1: float,
    b: float,
    mask: "np.ndarray | None" = None,
) -> "dict[str, tuple[np.ndarray, np.ndarray]]":
    """Decode one shard's blocks: term -> (doc offsets, idf-independent
    BM25 impacts), each term decoded ONCE. ``mask`` (bool, shard_range
    wide) drops disallowed doc offsets at decode time, so a filtered
    batch pays the filter once per term instead of once per query."""
    per_term: "dict[str, tuple[np.ndarray, np.ndarray]]" = {}
    for r in rows:
        offs, impact = per_term.get(r.term, (None, None))
        d, t, dl = decode_block(
            r.first_doc, bytes(r.docs_bin), bytes(r.tfs_bin), bytes(r.dls_bin)
        )
        imp = t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * dl / avgdl))
        o = d - base
        if mask is not None:
            keep = mask[o]
            o, imp = o[keep], imp[keep]
        if offs is None:
            per_term[r.term] = (o, imp)
        else:
            per_term[r.term] = (
                np.concatenate((offs, o)),
                np.concatenate((impact, imp)),
            )
    return per_term


def _score_shard(
    per_term: "dict[str, tuple[np.ndarray, np.ndarray]]",
    term_plan: "dict[str, list[tuple[str, float]]]",
    qkeys: "list[str]",
    shard_range: int,
    base: int,
    k: int,
    query_chunk: int,
    track_matched: bool = False,
) -> "tuple[list, list, list, list]":
    """Dense scatter-add scoring of one shard for every query; exact
    per-query local top-k. Queries are chunked to bound the dense array
    at chunk*shard_range*8 bytes (64 * 2^14 * 8 = 8 MiB at the default
    cfg.shard_range of 2^14).

    Ordering: (score desc, doc_id asc); with ``track_matched`` a
    matched-term-count array is accumulated alongside and the local
    top-k uses the 'words' key (matched desc, score desc, doc_id asc) —
    matching the single-query words_rank contract exactly. The count
    scatter-add only runs when requested, so the default batch path
    pays nothing."""
    out_q, out_d, out_s, out_m = [], [], [], []
    for c0 in range(0, len(qkeys), query_chunk):
        chunk = qkeys[c0 : c0 + query_chunk]
        scores = np.zeros((len(chunk), shard_range), dtype=np.float64)
        counts = (
            np.zeros((len(chunk), shard_range), dtype=np.int32)
            if track_matched
            else None
        )
        touched = np.zeros(len(chunk), dtype=bool)
        for qi, qkey in enumerate(chunk):
            for term, idf in term_plan[qkey]:
                hit = per_term.get(term)
                if hit is None or not hit[0].size:
                    continue
                # a term's doc offsets are unique within a shard,
                # so plain fancy-index += is a correct scatter-add
                scores[qi][hit[0]] += idf * hit[1]
                if counts is not None:
                    counts[qi][hit[0]] += 1
                touched[qi] = True
        for qi, qkey in enumerate(chunk):
            if not touched[qi]:
                continue
            row = scores[qi]
            pos = np.flatnonzero(row)
            vals = row[pos]
            if counts is None:
                if pos.size > k:
                    kth = np.partition(vals, pos.size - k)[pos.size - k]
                    keep = vals >= kth
                    pos, vals = pos[keep], vals[keep]
                order = np.lexsort((pos, -vals))[:k]
                pos, vals = pos[order], vals[order]
            else:
                mts = counts[qi][pos]
                order = np.lexsort((pos, -vals, -mts))[:k]
                pos, vals = pos[order], vals[order]
                out_m.append(mts[order])
            out_q.append(np.repeat(qkey, pos.size))
            out_d.append(pos + base)
            out_s.append(vals)
    return out_q, out_d, out_s, out_m


def _make_shard_scorer(
    plan: "list[tuple[str, list[tuple[int, float]]]]",
    qkeys: "list[str]",
    shard_range: int,
    avgdl: float,
    k1: float,
    b: float,
    k: int,
    query_chunk: int = 64,
    track_matched: bool = False,
):
    """Per-partition scatter-gather scorer (document-partitioned search,
    the standard sharded-index query architecture).

    Input rows: compressed posting blocks of the batch's query terms,
    shuffled so one doc-shard's blocks land in one partition. For each
    shard: decode each term ONCE, precompute its idf-independent BM25
    impact, then accumulate every query's scores into a dense
    (queries x shard_range) float64 array — doc offsets within a shard
    index directly, so accumulation is pure numpy scatter-add. Exact
    per-query top-k (score desc, doc_id asc tie-break) is selected per
    shard; only n_shards*k rows per query leave the partition.
    """
    term_plan: dict[str, list[tuple[int, float]]] = dict(plan)

    def scorer(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        # buffer the partition's (compressed) blocks grouped by shard
        by_shard: "dict[int, list]" = {}
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                by_shard.setdefault(int(row.first_doc) // shard_range, []).append(row)
        for shard in sorted(by_shard):
            base = shard * shard_range
            per_term = _decode_shard_terms(by_shard[shard], base, avgdl, k1, b)
            out_q, out_d, out_s, out_m = _score_shard(
                per_term, term_plan, qkeys, shard_range, base, k, query_chunk,
                track_matched,
            )
            if out_q:
                cols = {
                    "qkey": np.concatenate(out_q),
                    "doc_id": np.concatenate(out_d),
                    "score": np.concatenate(out_s),
                }
                if track_matched:
                    cols["matched"] = np.concatenate(out_m)
                yield pd.DataFrame(cols)

    return scorer


def _make_filtered_shard_scorer(
    plan: "list[tuple[str, list[tuple[int, float]]]]",
    qkeys: "list[str]",
    shard_range: int,
    avgdl: float,
    k1: float,
    b: float,
    k: int,
    query_chunk: int = 64,
    track_matched: bool = False,
):
    """Cogrouped variant of the shard scorer for filtered batch search
    (Q7 semantics in the batch path): key = doc-shard; left = the
    shard's compressed posting blocks, right = the shard's allowed
    doc_ids from ``filter_docs``. The allowed set becomes a shard-local
    boolean mask applied at decode time; BM25 stats stay corpus-global
    (Meilisearch filter semantics). A shard with blocks but no allowed
    docs emits nothing; a shard with allowed docs but no blocks has no
    candidates by construction."""
    term_plan: dict[str, list[tuple[int, float]]] = dict(plan)
    empty_cols: dict = {"qkey": [], "doc_id": [], "score": []}
    if track_matched:
        empty_cols["matched"] = []
    empty = pd.DataFrame(empty_cols)

    def scorer(key, blocks_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
        if blocks_pdf.empty or filt_pdf.empty:
            return empty
        base = int(key[0]) * shard_range
        mask = np.zeros(shard_range, dtype=bool)
        mask[filt_pdf["doc_id"].to_numpy(dtype=np.int64) - base] = True
        per_term = _decode_shard_terms(
            blocks_pdf.itertuples(index=False), base, avgdl, k1, b, mask=mask
        )
        out_q, out_d, out_s, out_m = _score_shard(
            per_term, term_plan, qkeys, shard_range, base, k, query_chunk,
            track_matched,
        )
        if not out_q:
            return empty
        cols = {
            "qkey": np.concatenate(out_q),
            "doc_id": np.concatenate(out_d),
            "score": np.concatenate(out_s),
        }
        if track_matched:
            cols["matched"] = np.concatenate(out_m)
        return pd.DataFrame(cols)

    return scorer


def search_many(
    index: InvertedIndex,
    queries: "list[tuple[str, str]]",
    k: "int | None" = None,
    gather: str = "auto",
    filter_docs: "DataFrame | None" = None,
    typo: bool = False,
    typo_cfg=None,
    words_rank: "bool | None" = None,
) -> DataFrame:
    """Score a batch of (query_id, query_text) in one Spark job ->
    (query_id, doc_id, score[, matched_terms], rank<=k).

    ``words_rank`` (default cfg.words_ranking): the Q11 'words'
    criterion in the batch path — per-shard local top-k and the global
    merge both order by (matched_terms desc, score desc, doc_id asc),
    rank-identical to search(words_rank=True) (tested). The
    matched-count accumulation only runs when the flag is on.

    ``typo=True`` applies Q12 typo expansion to every query before
    planning: ONE levenshtein scan over the candidate dictionary covers
    the whole batch (typo_expansion_map), then each expanded term scores
    with its own idf exactly as in ``search_typo`` (rank-identical,
    tested).

    ``filter_docs``: optional DataFrame with a doc_id column restricting
    candidates for EVERY query in the batch (Q7 filterable attributes,
    config/type.go:62); BM25 stats stay corpus-global. The filter rides
    the same scatter-gather: allowed ids are cogrouped with the posting
    blocks by doc-shard and applied as a shard-local bitmap at decode
    time — nothing doc-granular beyond the filtered ids themselves is
    shuffled. Batches mixing different filters = one search_many call
    per filter group. (The cogroup shuffles blocks by shard even in
    serving mode; unfiltered batches keep the shuffle-free path.)

    Document-partitioned scatter-gather: the only shuffle moves the
    batch's COMPRESSED posting blocks (grouped by doc-shard); each
    shard scores all queries in one vectorized pass and emits its local
    top-k, and the global merge ranks just n_shards*k rows per query.
    Nothing doc-granular is ever shuffled or materialized, so the
    heavy stage scales with shard count (= corpus size /
    cfg.shard_range, default 2^14), independent of query count or term
    hotness. At extreme shard
    counts the final single-level merge generalizes to a tree merge;
    at 10^12 turns the per-query merge input is n_shards*k rows,
    which a two-level (salted) merge handles the same way.
    """
    k = k or index.cfg.max_total_hits
    if words_rank is None:
        words_rank = index.cfg.words_ranking
    spark = index.postings.sparkSession
    # dedup queries by their normalized term set: identical queries (and
    # rewordings hitting the same terms) are scored once and fanned back
    # out at the end — contributions are query-independent
    parsed = {qid: parse_query(text, index.cfg.analyzer) for qid, text in queries}
    exp_map: "dict[str, list[str]]" = {}
    if typo:
        all_q_terms = list(
            dict.fromkeys(t for ts in parsed.values() for t in ts)
        )
        exp_map = typo_expansion_map(index, all_q_terms, typo_cfg)
    key_of: dict[str, str] = {}
    key_terms: dict[str, tuple[str, ...]] = {}
    for qid, _ in queries:
        terms = list(dict.fromkeys(parsed[qid]))
        if exp_map:
            for t in list(terms):
                for c in exp_map.get(t, ()):
                    if c not in terms:
                        terms.append(c)
        terms = tuple(terms)
        key = "\x1f".join(terms)
        key_of[qid] = key
        key_terms[key] = terms
    all_terms = sorted({t for ts in key_terms.values() for t in ts})
    idf_map = _idf_map(index, all_terms)
    plan = [
        (key, sorted({(t, idf_map[t]) for t in ts if t in idf_map}))
        for key, ts in key_terms.items()
    ]
    plan = [(key, terms) for key, terms in plan if terms]
    if not plan:
        return spark.createDataFrame(
            [],
            "query_id string, doc_id long, score double, matched_terms int, rank int"
            if words_rank
            else "query_id string, doc_id long, score double, rank int",
        )
    qkeys = sorted(key for key, _ in plan)

    if filter_docs is not None:
        shard_of = lambda c: F.floor(c / F.lit(index.cfg.shard_range)).cast("long")  # noqa: E731
        src = index.serving if index.serving is not None else index.postings
        blocks = src.filter(F.col("term").isin(sorted(idf_map))).select(
            "term", "first_doc", "docs_bin", "tfs_bin", "dls_bin"
        ).withColumn("_shard", shard_of(F.col("first_doc")))
        fids = filter_docs.select(
            F.col("doc_id").cast("long").alias("doc_id")
        ).withColumn("_shard", shard_of(F.col("doc_id")))
        per_key = (
            blocks.groupBy("_shard")
            .cogroup(fids.groupBy("_shard"))
            .applyInPandas(
                _make_filtered_shard_scorer(
                    plan,
                    qkeys,
                    index.cfg.shard_range,
                    index.avgdl,
                    index.cfg.k1,
                    index.cfg.b,
                    k,
                    track_matched=words_rank,
                ),
                schema=SCORED_SCHEMA_M if words_rank else SCORED_SCHEMA,
            )
        )
        return _gather_hits(index, per_key, key_of, qkeys, k, gather, words_rank)

    if index.serving is not None:
        # serving layout is already doc-shard partitioned and cached:
        # the term filter is a narrow op, so the query runs SHUFFLE-FREE
        sharded = index.serving.filter(
            F.col("term").isin(sorted(idf_map))
        ).select("term", "first_doc", "docs_bin", "tfs_bin", "dls_bin")
    else:
        blocks = index.postings.filter(F.col("term").isin(sorted(idf_map))).select(
            "term", "first_doc", "docs_bin", "tfs_bin", "dls_bin"
        )
        # partition count: no more than the corpus' shard count (extra
        # partitions would be empty tasks), no more than the session's
        # shuffle width. Per-partition memory is the batch's compressed
        # query-term postings / n_parts — size shuffle.partitions so
        # that fits the executor at the target scale.
        n_shards = max(1, -(-index.n_docs // index.cfg.shard_range))
        n_parts = min(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")), n_shards
        )
        sharded = blocks.repartition(
            n_parts, F.floor(F.col("first_doc") / F.lit(index.cfg.shard_range))
        )
    per_key = sharded.mapInPandas(
        _make_shard_scorer(
            plan,
            qkeys,
            index.cfg.shard_range,
            index.avgdl,
            index.cfg.k1,
            index.cfg.b,
            k,
            track_matched=words_rank,
        ),
        schema=SCORED_SCHEMA_M if words_rank else SCORED_SCHEMA,
    )
    return _gather_hits(index, per_key, key_of, qkeys, k, gather, words_rank)


#: Driver-gather ceiling for the scatter-GATHER merge: when the scorer's
#: worst-case output (n_shards * k * n_distinct_queries rows) fits under
#: this, collect and merge in the driver — one Spark job, no extra
#: window shuffle or mapping join. Deliberately low: driver merge time
#: is serial and does not scale with the cluster, so it must stay
#: negligible next to one stage's scheduling latency. Larger batches
#: (and the 10^12-turn shard-count regime) use the distributed window
#: merge. Tunable; recorded in BASELINE.md.
DRIVER_GATHER_MAX_ROWS = 20_000

#: above this shard count 'auto' upgrades the window merge to the
#: two-level tree merge (one reducer per qkey would otherwise rank
#: n_shards*k rows serially)
TREE_MERGE_SHARDS = 4096

#: parallel pre-merge reducers per query in the tree merge
TREE_FANOUT = 32


def _gather_hits(
    index: InvertedIndex,
    per_key: DataFrame,
    key_of: "dict[str, str]",
    qkeys: "list[str]",
    k: int,
    gather: str,
    words_rank: bool = False,
) -> DataFrame:
    """Merge per-shard local top-k rows (qkey, doc_id, score) into the
    global per-query top-k and fan deduped qkeys back out to query_ids.

    ``gather``: 'driver' | 'window' | 'tree' | 'auto' (auto switches
    driver vs window on DRIVER_GATHER_MAX_ROWS; above TREE_MERGE_SHARDS
    shards auto upgrades window -> tree).

    'tree' is the extreme-shard-count path: a single window partition
    per qkey would pull n_shards*k rows through ONE reducer task
    (~6e7 shards at 10^12 turns). The tree pre-merge first takes top-k
    within (qkey, salt) groups — TREE_FANOUT parallel reducers per
    query — so the final per-qkey window ranks only TREE_FANOUT*k rows.
    Exact: each salt group's global-top-k members survive their local
    top-k by construction.
    """
    from pyspark.sql.window import Window

    spark = per_key.sparkSession
    n_shards = max(1, -(-index.n_docs // index.cfg.shard_range))
    if gather == "auto" and n_shards > TREE_MERGE_SHARDS:
        gather = "tree"
    out_schema = (
        "query_id string, doc_id long, score double, matched_terms int, rank int"
        if words_rank
        else "query_id string, doc_id long, score double, rank int"
    )
    if gather == "driver" or (
        gather == "auto" and n_shards * k * len(qkeys) <= DRIVER_GATHER_MAX_ROWS
    ):
        rows = per_key.collect()
        by_key: "dict[str, list]" = {key: [] for key in qkeys}
        if words_rank:
            for r in rows:
                by_key[r["qkey"]].append(
                    (r["doc_id"], r["score"], r["matched"])
                )
            sort_key = lambda t: (-t[2], -t[1], t[0])  # noqa: E731
        else:
            for r in rows:
                by_key[r["qkey"]].append((r["doc_id"], r["score"]))
            sort_key = lambda t: (-t[1], t[0])  # noqa: E731
        out = []
        for qid, key in key_of.items():
            hits = sorted(by_key.get(key, ()), key=sort_key)[:k]
            if words_rank:
                out.extend(
                    (qid, int(d), float(sc), int(m), rank)
                    for rank, (d, sc, m) in enumerate(hits, start=1)
                )
            else:
                out.extend(
                    (qid, int(d), float(sc), rank)
                    for rank, (d, sc) in enumerate(hits, start=1)
                )
        return spark.createDataFrame(out, out_schema)

    order = [F.col("score").desc(), F.col("doc_id").asc()]
    if words_rank:
        order.insert(0, F.col("matched").desc())

    if gather == "tree":
        w_local = Window.partitionBy("qkey", "_salt").orderBy(*order)
        per_key = (
            per_key.withColumn("_salt", F.col("doc_id") % F.lit(TREE_FANOUT))
            .withColumn("_rn", F.row_number().over(w_local))
            .filter(F.col("_rn") <= k)
            .drop("_rn", "_salt")
        )

    w_global = Window.partitionBy("qkey").orderBy(*order)
    ranked = (
        per_key.withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
    )
    mapping = spark.createDataFrame(
        list(key_of.items()), "query_id string, qkey string"
    )
    out_cols = ["query_id", "doc_id", "score"]
    joined = ranked.join(F.broadcast(mapping), "qkey")
    if words_rank:
        joined = joined.withColumnRenamed("matched", "matched_terms")
        out_cols.append("matched_terms")
    return joined.select(*out_cols, "rank")


#: prepare_serving prefetches the term -> df map to the driver only
#: below this vocabulary size (~40 MB of dict at the limit); larger
#: vocabularies keep the per-batch terms-scan lookup (memoized per
#: term) or serve through DriverSearcher's bloom-backed alternative.
PREFETCH_MAX_TERMS = 2_000_000


def prepare_serving(
    index: InvertedIndex,
    n_parts: "int | None" = None,
    prefetch_terms: bool = True,
) -> InvertedIndex:
    """Switch the index into serving mode: materialize the postings
    re-partitioned by doc-shard and cache them, so every subsequent
    ``search_many`` batch is shuffle-free (the scatter-gather stage reads
    resident partitions). On a real cluster this is the natural stored
    layout of a query-serving tier — postings co-partitioned by doc
    range across executors; the stored term-sorted parquet remains the
    scan-pruning layout for single-term lookups.

    ``prefetch_terms``: also collect the (bounded, see
    PREFETCH_MAX_TERMS) term -> df dictionary so query planning costs
    zero Spark jobs — the same trade DriverSearcher makes."""
    spark = index.postings.sparkSession
    n = n_parts or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    index.serving = index.postings.repartition(
        n, F.floor(F.col("first_doc") / F.lit(index.cfg.shard_range))
    ).persist()
    index.serving.count()
    if prefetch_terms and getattr(index, "_df_map", None) is None:
        n_terms = index.terms.count()
        if n_terms <= PREFETCH_MAX_TERMS:
            index._df_map = {
                r["term"]: int(r["df"])
                for r in index.terms.select("term", "df").collect()
            }
    return index


def _fetch_raw(index: InvertedIndex, terms: "list[str]") -> "dict[str, dict]":
    """Fetch + decode the terms' blocks to the driver (one Spark job),
    keeping the stored per-block (max_tf, min_dl) metadata raw so
    bounds can be rebuilt under any (idf, avgdl)."""
    if not terms:
        return {}
    rows = index.postings.filter(F.col("term").isin(terms)).collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    out: dict[str, dict] = {}
    for term, blks in by_term.items():
        blks.sort(key=lambda r: r["block_id"])
        docs, tfs, dls, starts, last_doc, max_tf, min_dl = [], [], [], [], [], [], []
        off = 0
        for r in blks:
            d, t, dl = decode_block(
                r["first_doc"],
                bytes(r["docs_bin"]),
                bytes(r["tfs_bin"]),
                bytes(r["dls_bin"]),
            )
            docs.append(d)
            tfs.append(t)
            dls.append(dl)
            starts.append(off)
            off += d.size
            last_doc.append(r["last_doc"])
            max_tf.append(r["max_tf"])
            min_dl.append(r["min_dl"])
        out[term] = {
            "doc_ids": np.concatenate(docs),
            "tfs": np.concatenate(tfs),
            "dls": np.concatenate(dls),
            "block_starts": np.asarray(starts, dtype=np.int64),
            "block_last_doc": np.asarray(last_doc, dtype=np.int64),
            "max_tf": np.asarray(max_tf, dtype=np.int64),
            "min_dl": np.asarray(min_dl, dtype=np.int64),
        }
    return out


def _to_term_postings(
    term: str, raw: dict, idf: float, index: InvertedIndex
) -> TermPostings:
    ub = idf * impact_upper_bound(
        raw["max_tf"], raw["min_dl"], index.avgdl, index.cfg.k1, index.cfg.b
    )
    return TermPostings(
        term=term,
        idf=idf,
        doc_ids=raw["doc_ids"],
        tfs=raw["tfs"],
        dls=raw["dls"],
        block_starts=raw["block_starts"],
        block_last_doc=raw["block_last_doc"],
        block_ub=np.asarray(ub),
    )


def collect_term_postings(
    index: InvertedIndex, q_terms: "list[str]"
) -> "list[TermPostings]":
    idf_map = _idf_map(index, q_terms)
    raws = _fetch_raw(index, list(idf_map))
    return [
        _to_term_postings(t, raw, idf_map[t], index) for t, raw in raws.items()
    ]


def search_wand(
    index: InvertedIndex, query: str, k: "int | None" = None
) -> "list[tuple[int, float]]":
    """Driver-side exact top-k with block-max WAND pruning."""
    k = k or index.cfg.max_total_hits
    q_terms = parse_query(query, index.cfg.analyzer)
    terms = collect_term_postings(index, q_terms)
    return wand_topk(terms, k, index.avgdl, index.cfg.k1, index.cfg.b)


def _edit_distance(a: str, b: str) -> int:
    """Plain Levenshtein (same metric as Spark's ``levenshtein``) for
    driver-side assignment of the already-JVM-filtered candidate terms
    to their query terms — candidate sets are tiny by construction."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _typo_candidate_terms(index: InvertedIndex, typo=None) -> DataFrame:
    """Term source for typo candidates. With ``disable_on_attributes``
    (config/type.go:75) the vocabulary found ONLY in disabled
    attributes must not produce typo matches, so the candidate
    dictionary is re-derived from the enabled searchable attributes of
    the docs table (computed once per index, cached). Exact query terms
    always match wherever they occur — only the fuzzy expansion is
    restricted."""
    typo = typo or index.cfg.typo
    disabled = set(typo.disable_on_attributes)
    attrs = [a for a in index.cfg.searchable_attributes if a not in disabled]
    if not disabled or len(attrs) == len(index.cfg.searchable_attributes):
        return index.terms
    spark = index.postings.sparkSession
    if not attrs:
        return spark.createDataFrame([], "term string")
    cache: dict = getattr(index, "_typo_term_src", None) or {}
    index._typo_term_src = cache
    key = tuple(attrs)
    if key not in cache:
        from meilibridge_spark.operators.docs import make_term_freq_udf

        # bounded cache: a long-lived session cycling through different
        # disable_on_attributes configs must not accumulate persisted
        # DataFrames — keep only the most recent key, unpersisting the
        # evicted entries (re-deriving a config is one tokenize pass)
        for old_key in list(cache):
            cache.pop(old_key).unpersist()
        tf_udf = make_term_freq_udf(index.cfg.analyzer)
        text = F.concat_ws(
            " ", *[F.coalesce(F.col(a), F.lit("")) for a in attrs]
        )
        cache[key] = (
            index.docs.select(tf_udf(text).alias("_t"))
            .select(F.explode("_t.terms").alias("term"))
            .distinct()
            .persist()
        )
    return cache[key]


def typo_expansion_map(
    index: InvertedIndex,
    q_terms: "list[str]",
    typo_cfg=None,
) -> "dict[str, list[str]]":
    """Q12: map each eligible query term to its dictionary terms within
    edit distance 1 (len >= one_typo, default 5) or 2 (len >= two_typos,
    default 9) — reference knobs config/type.go:70-80. Terms listed in
    ``disable_on_words`` are never expanded. One JVM levenshtein scan
    over the candidate dictionary covers ALL terms (batch-friendly);
    candidates are assigned to their query terms driver-side."""
    typo = typo_cfg or index.cfg.typo
    if not typo.enabled:
        return {}
    disabled = {w.lower() for w in typo.disable_on_words}
    fuzzy = {
        t: (2 if len(t) >= typo.two_typos else 1)
        for t in dict.fromkeys(q_terms)
        if len(t) >= typo.one_typo and t not in disabled
    }
    if not fuzzy:
        return {}
    conds = None
    for t, d in fuzzy.items():
        c = F.levenshtein(F.col("term"), F.lit(t)) <= d
        conds = c if conds is None else (conds | c)
    cands = [
        r["term"]
        for r in _typo_candidate_terms(index, typo)
        .filter(conds)
        .select("term")
        .orderBy("term")
        .collect()
    ]
    out: "dict[str, list[str]]" = {}
    for t, d in fuzzy.items():
        exp = [c for c in cands if c != t and _edit_distance(t, c) <= d]
        if exp:
            out[t] = exp
    return out


def typo_expand_terms(
    index: InvertedIndex,
    q_terms: "list[str]",
    typo_cfg=None,
) -> "list[str]":
    """Expanded term list: the original terms followed by their typo
    candidates (first-seen order, de-duplicated)."""
    exp = typo_expansion_map(index, q_terms, typo_cfg)
    out = list(dict.fromkeys(q_terms))
    for t in list(out):
        for c in exp.get(t, ()):
            if c not in out:
                out.append(c)
    return out


def search_typo(
    index: InvertedIndex,
    query: str,
    k: "int | None" = None,
    typo_cfg=None,
    typo_rank: bool = False,
) -> DataFrame:
    """BM25 top-k with typo-tolerant term expansion (each expanded term
    scores with its own idf). ``typo_rank=True`` applies the 'typo'
    ranking criterion: exact-term matches rank above expansion-only
    matches (see ``search``)."""
    q_terms = parse_query(query, index.cfg.analyzer)
    expanded = typo_expand_terms(index, q_terms, typo_cfg)
    return search(
        index,
        " ".join(expanded),
        k,
        orig_terms=q_terms if typo_rank else None,
        typo_rank=typo_rank,
    )


def prefix_expand_terms(
    index: InvertedIndex,
    q_terms: "list[str]",
    max_expansions: int = 10,
) -> "list[str]":
    """Meilisearch-style LAST-WORD PREFIX search: the final query word
    also matches dictionary terms it prefixes (Meilisearch applies
    prefix matching to the last word of the query by default — public
    search semantics; the reference exposes no knob for it). Bounded to
    ``max_expansions`` candidates in lexicographic order for
    determinism. The ``startsWith`` predicate is pushed to the terms
    parquet scan (StringStartsWith row-group pruning); each expanded
    term scores with its own idf."""
    if not q_terms:
        return []
    last = q_terms[-1]
    out = list(dict.fromkeys(q_terms))
    # over-fetch by the number of query terms that could collide with
    # the prefix scan (any term in `out` sharing the prefix), so the
    # caller always gets max_expansions NEW candidates when they exist
    overlap = sum(1 for t in out if t.startswith(last))
    rows = (
        index.terms.filter(F.col("term").startswith(last))
        .select("term")
        .orderBy("term")
        .limit(max_expansions + overlap)
        .collect()
    )
    added = 0
    for r in rows:
        if added >= max_expansions:
            break
        if r["term"] not in out:
            out.append(r["term"])
            added += 1
    return out


def search_prefix(
    index: InvertedIndex,
    query: str,
    k: "int | None" = None,
    max_expansions: int = 10,
) -> DataFrame:
    """BM25 top-k with last-word prefix expansion."""
    q_terms = parse_query(query, index.cfg.analyzer)
    expanded = prefix_expand_terms(index, q_terms, max_expansions)
    return search(index, " ".join(expanded), k)


class DriverSearcher:
    """Low-latency serving path: the term dictionary (term -> df) is
    collected once (BOUNDED — see below) and the decoded postings of
    recently-used terms are LRU-cached on the driver, so a warm query
    costs zero Spark jobs.

    Scale guard: the full-dictionary prefetch only happens below
    PREFETCH_MAX_TERMS (the same bound ``prepare_serving`` applies).
    Above it — a 10^8-10^9-term vocabulary would OOM the driver — the
    searcher falls back to a memoized per-term df lookup against the
    terms table (one bounded ``isin`` scan per batch of unseen terms;
    hot Zipf terms make the memo hit rate high by construction). Both
    modes are rank-identical (tested). Cache capacity bounds postings
    memory either way.
    """

    def __init__(
        self,
        index: InvertedIndex,
        cache_capacity: int = 4096,
        max_prefetch_terms: int = PREFETCH_MAX_TERMS,
    ) -> None:
        from collections import OrderedDict

        self.index = index
        self._df_memo: "dict[str, int | None]" = {}
        if (
            getattr(index, "_df_map", None) is not None
            or index.terms.count() <= max_prefetch_terms
        ):
            self._df_map = getattr(index, "_df_map", None) or {
                r["term"]: int(r["df"])
                for r in index.terms.select("term", "df").collect()
            }
        else:
            self._df_map = None  # vocabulary too large: lookup path
        self._cache: "OrderedDict[str, dict]" = OrderedDict()
        self._capacity = cache_capacity

    def _dfs(self, terms: "list[str]") -> "dict[str, int]":
        """df for each known term — dict hit when prefetched, else a
        memoized ``isin``-pushed terms-table lookup (misses memoized
        too, so absent terms never re-scan)."""
        if self._df_map is not None:
            return {t: self._df_map[t] for t in terms if t in self._df_map}
        missing = [t for t in terms if t not in self._df_memo]
        if missing:
            rows = (
                self.index.terms.filter(F.col("term").isin(missing))
                .select("term", "df")
                .collect()
            )
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_memo[t] = found.get(t)
        return {t: v for t in terms if (v := self._df_memo.get(t)) is not None}

    def _get_raw(self, terms: "list[str]") -> "dict[str, dict]":
        missing = [t for t in terms if t not in self._cache]
        if missing:
            fetched = _fetch_raw(self.index, missing)
            for t in missing:
                if t in fetched:
                    self._cache[t] = fetched[t]
                    if len(self._cache) > self._capacity:
                        self._cache.popitem(last=False)
        out = {}
        for t in terms:
            if t in self._cache:
                self._cache.move_to_end(t)
                out[t] = self._cache[t]
        return out

    #: above this dense-array extent the dense scorer's 8B/slot array
    #: stops being driver-friendly and WAND's pruning wins
    DENSE_MAX_DOCS = 50_000_000

    def search(
        self, query: str, k: "int | None" = None, strategy: str = "auto"
    ) -> "list[tuple[int, float]]":
        """strategy: 'auto' (dense scatter-add when the query's doc-id
        extent fits a driver-side score array, else WAND), 'dense', or
        'wand'. All three are exact and rank-identical (tested).

        The auto decision uses the actual array extent, max(doc_id)+1 —
        not n_docs — so sparse external doc-id spaces (doc_id_col
        indexes) route to WAND instead of allocating a huge array;
        negative ids always route to WAND (dense would reject them).
        """
        k = k or self.index.cfg.max_total_hits
        dfs = self._dfs(parse_query(query, self.index.cfg.analyzer))
        raws = self._get_raw(list(dfs))
        n = self.index.n_docs
        tps = [
            _to_term_postings(t, raw, float(idf_fn(n, dfs[t])), self.index)
            for t, raw in raws.items()
        ]
        cfg = self.index.cfg
        live = [t for t in tps if t.doc_ids.size]
        extent = max(
            (int(t.doc_ids[-1]) + 1 for t in live), default=0
        )
        ids_ok = all(int(t.doc_ids[0]) >= 0 for t in live)
        if strategy == "dense" or (
            strategy == "auto" and ids_ok and extent <= self.DENSE_MAX_DOCS
        ):
            return dense_topk(tps, k, n, self.index.avgdl, cfg.k1, cfg.b)
        return wand_topk(tps, k, self.index.avgdl, cfg.k1, cfg.b)
