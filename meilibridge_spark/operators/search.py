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
from meilibridge_spark.functions.wand import TermPostings, wand_topk
from meilibridge_spark.sources.tables import InvertedIndex

DECODED_SCHEMA = "term string, doc_id long, tf long, dl long"


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
    metadata broadcast, SURVEY §3 note)."""
    if not q_terms:
        return {}
    rows = index.terms.filter(F.col("term").isin(q_terms)).collect()
    return {r["term"]: float(idf_fn(index.n_docs, r["df"])) for r in rows}


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
) -> DataFrame:
    """Top-k hits as a DataFrame (doc_id, score, matched_terms).

    ``filter_docs``: optional DataFrame with a doc_id column restricting
    candidates (Q7 filterable attributes -> pre-score semi-join); BM25
    stats stay corpus-global (Meilisearch filter semantics).
    """
    k = k or index.cfg.max_total_hits
    q_terms = parse_query(query, index.cfg.analyzer)
    idf_map = _idf_map(index, q_terms)
    spark = index.postings.sparkSession
    if not idf_map:
        return spark.createDataFrame(
            [], "doc_id long, score double, matched_terms int"
        )
    rows = candidate_rows(index, list(idf_map))
    if filter_docs is not None:
        rows = rows.join(
            F.broadcast(filter_docs.select("doc_id")), "doc_id", "left_semi"
        )
    idf_expr = F.create_map(
        *[x for t, v in idf_map.items() for x in (F.lit(t), F.lit(v))]
    )
    scored = rows.withColumn("idf", idf_expr[F.col("term")]).withColumn(
        "contrib", _contrib_col(index)
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("contrib").alias("score"),
            F.count("*").cast("int").alias("matched_terms"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def search_many(
    index: InvertedIndex,
    queries: "list[tuple[str, str]]",
    k: "int | None" = None,
) -> DataFrame:
    """Score a batch of (query_id, query_text) in one Spark job ->
    (query_id, doc_id, score, rank<=k). Decodes each needed term's
    postings once; the per-query term plan is a broadcast join."""
    from pyspark.sql.window import Window

    k = k or index.cfg.max_total_hits
    spark = index.postings.sparkSession
    # dedup queries by their normalized term set: identical queries (and
    # rewordings hitting the same terms) are scored once and fanned back
    # out at the end — contributions are query-independent
    key_of: dict[str, str] = {}
    key_terms: dict[str, tuple[str, ...]] = {}
    for qid, text in queries:
        terms = tuple(parse_query(text, index.cfg.analyzer))
        key = "\x1f".join(terms)
        key_of[qid] = key
        key_terms[key] = terms
    all_terms = sorted({t for ts in key_terms.values() for t in ts})
    idf_map = _idf_map(index, all_terms)
    plan = [
        (key, t, idf_map[t])
        for key, ts in key_terms.items()
        for t in ts
        if t in idf_map
    ]
    if not plan:
        return spark.createDataFrame(
            [], "query_id string, doc_id long, score double, rank int"
        )
    live_terms = {key: [t for t in ts if t in idf_map] for key, ts in key_terms.items()}
    single = {key for key, ts in live_terms.items() if len(ts) == 1}
    plan_multi = [p for p in plan if p[0] not in single]
    plan_single = [p for p in plan if p[0] in single]

    rows = candidate_rows(index, sorted(idf_map)).persist()
    parts = []
    if plan_multi:
        plan_df = spark.createDataFrame(
            plan_multi, "qkey string, term string, idf double"
        )
        scored = rows.join(F.broadcast(plan_df), "term").withColumn(
            "contrib", _contrib_col(index)
        )
        parts.append(
            scored.groupBy("qkey", "doc_id").agg(F.sum("contrib").alias("score"))
        )
    if plan_single:
        # single-term queries: doc_id is unique within a term's postings,
        # so the per-doc sum (and its shuffle) is unnecessary
        plan_df1 = spark.createDataFrame(
            plan_single, "qkey string, term string, idf double"
        )
        parts.append(
            rows.join(F.broadcast(plan_df1), "term")
            .withColumn("score", _contrib_col(index))
            .select("qkey", "doc_id", "score")
        )
    per_doc = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])

    # exact two-level top-k: a hot single-term query has ~df(term)
    # candidates, and one row_number window per query would sort them
    # all in ONE task (the per-query skew straggler). Level 1 takes a
    # local top-k per (query, doc-hash salt) — parallel across S
    # partitions per query; level 2 ranks only S*k survivors.
    n_salts = 32
    w_local = Window.partitionBy("qkey", "_salt").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    w_global = Window.partitionBy("qkey").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    per_key = (
        per_doc.withColumn("_salt", F.pmod(F.col("doc_id"), F.lit(n_salts)))
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
        .drop("_salt", "_lr")
    )
    mapping = spark.createDataFrame(
        list(key_of.items()), "query_id string, qkey string"
    )
    return per_key.join(F.broadcast(mapping), "qkey").select(
        "query_id", "doc_id", "score", "rank"
    )


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


def typo_expand_terms(
    index: InvertedIndex,
    q_terms: "list[str]",
    one_typo_min_len: int = 5,
    two_typo_min_len: int = 9,
) -> "list[str]":
    """Q12 typo tolerance (off by default; Meilisearch defaults
    min_word_size_for_typos one=5/two=9, config/type.go:70-80): expand
    each query term with dictionary terms within edit distance 1
    (len >= 5) or 2 (len >= 9). One small scan over the term dictionary
    with JVM levenshtein — no Python."""
    fuzzy = [t for t in q_terms if len(t) >= one_typo_min_len]
    out = list(dict.fromkeys(q_terms))
    if not fuzzy:
        return out
    conds = None
    for t in fuzzy:
        d = 2 if len(t) >= two_typo_min_len else 1
        c = F.levenshtein(F.col("term"), F.lit(t)) <= d
        conds = c if conds is None else (conds | c)
    for r in index.terms.filter(conds).select("term").orderBy("term").collect():
        if r["term"] not in out:
            out.append(r["term"])
    return out


def search_typo(
    index: InvertedIndex,
    query: str,
    k: "int | None" = None,
) -> DataFrame:
    """BM25 top-k with typo-tolerant term expansion (each expanded term
    scores with its own idf)."""
    q_terms = parse_query(query, index.cfg.analyzer)
    expanded = typo_expand_terms(index, q_terms)
    return search(index, " ".join(expanded), k)


class DriverSearcher:
    """Low-latency serving path: the term dictionary (term -> df) is
    collected once and the decoded postings of recently-used terms are
    LRU-cached on the driver, so a warm query costs zero Spark jobs.

    Scale note: the dictionary is ~vocab-sized (fine up to tens of
    millions of terms); at larger vocabularies swap the dict for a
    postings-backed lookup with a bloom filter — the cache interface
    stays the same. Cache capacity bounds memory, hot Zipf terms make
    the hit rate high by construction.
    """

    def __init__(self, index: InvertedIndex, cache_capacity: int = 4096) -> None:
        from collections import OrderedDict

        self.index = index
        self._df_map = {
            r["term"]: int(r["df"])
            for r in index.terms.select("term", "df").collect()
        }
        self._cache: "OrderedDict[str, dict]" = OrderedDict()
        self._capacity = cache_capacity

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

    def search(self, query: str, k: "int | None" = None) -> "list[tuple[int, float]]":
        k = k or self.index.cfg.max_total_hits
        q_terms = [
            t
            for t in parse_query(query, self.index.cfg.analyzer)
            if t in self._df_map
        ]
        raws = self._get_raw(q_terms)
        n = self.index.n_docs
        tps = [
            _to_term_postings(t, raw, float(idf_fn(n, self._df_map[t])), self.index)
            for t, raw in raws.items()
        ]
        return wand_topk(tps, k, self.index.avgdl, self.index.cfg.k1, self.index.cfg.b)
