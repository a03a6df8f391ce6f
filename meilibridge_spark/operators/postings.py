"""Term-partitioned posting-list construction (SURVEY.md §2C, §7 stages 3-5).

Two-stage build with partition-local partial runs:

  stage 1 (mapInPandas, Arrow batch = the unit of locality): within
      each batch, flatten the per-doc (term, tf) arrays and group by
      term with one stable numpy argsort — emitting ONE compact row per
      (term, batch): (term, first_doc, doc_ids[], tfs[], dls[]). The
      docs DataFrame is range-partitioned by doc_id (assign_doc_ids's
      layout), so batches are disjoint doc_id ranges — the batch ID is
      a natural salt: a hot Zipf-head term's postings are built by
      every input partition in parallel instead of one straggler task.
  stage 2 (groupBy(term).applyInPandas): concatenate a term's partial
      runs, argsort by doc_id (correct under ANY input layout; ~free
      when runs arrive range-ordered), delta-gap + varint block encode
      (functions/codec.py).

Compared to the textbook salted groupBy (shuffle every (term, doc_id,
tf, dl) tuple, then merge), the only wide exchange here moves ~(terms x
batches) compressed ARRAY rows — orders of magnitude fewer rows at any
scale, and skew-free by construction.

Encoding is content-deterministic: the same corpus yields byte-identical
postings regardless of partitioning (resume/identity tests rely on it).

Scale note (10^12 turns): a single row per term bounds a hot term's
postings to one stage-2 task. The evolution path is doc-range index
shards (Lucene-segment style: postings per (shard, term), queries merge
per-shard top-k exactly) — the stage-1 output here already IS that
sharded form.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meilibridge_spark.config import IndexConfig
from meilibridge_spark.functions.codec import encode_blocks

POSTINGS_SCHEMA = (
    "term string, block_id long, n int, first_doc long, last_doc long, "
    "max_tf int, min_dl long, sum_tf long, "
    "docs_bin binary, tfs_bin binary, dls_bin binary"
)

POSTING_COLUMNS = [
    "term",
    "block_id",
    "n",
    "first_doc",
    "last_doc",
    "max_tf",
    "min_dl",
    "sum_tf",
    "docs_bin",
    "tfs_bin",
    "dls_bin",
]

PARTIAL_SCHEMA = (
    "term string, shard long, doc_ids array<long>, "
    "tfs array<long>, dls array<long>"
)


def explode_terms(docs: DataFrame) -> DataFrame:
    """docs(doc_id, terms struct<terms,tfs>, dl) ->
    (doc_id, term, tf, dl) rows — kept for operators that want the
    relational form; the posting build itself uses the compact
    partial-run path below."""
    return docs.select(
        "doc_id",
        "dl",
        F.explode(
            F.arrays_zip(
                F.col("terms.terms").alias("term"),
                F.col("terms.tfs").alias("tf"),
            )
        ).alias("_t"),
    ).select(
        "doc_id",
        F.col("_t.term").alias("term"),
        F.col("_t.tf").alias("tf"),
        "dl",
    )


def _make_partial_runs(shard_range: int):
    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if pdf.empty:
                continue
            terms_col = pdf["terms_arr"]
            tfs_col = pdf["tfs_arr"]
            lens = np.fromiter(
                (len(x) for x in terms_col), dtype=np.int64, count=len(pdf)
            )
            total = int(lens.sum())
            if total == 0:
                continue
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), lens)
            dls = np.repeat(pdf["dl"].to_numpy(dtype=np.int64), lens)
            flat_terms = np.concatenate(
                [np.asarray(x, dtype=object) for x in terms_col]
            )
            flat_tfs = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in tfs_col]
            )
            shards = doc_ids // shard_range
            # one stable sort groups by (term, shard), keeping the
            # batch's doc order within each group
            codes, uniq_terms = pd.factorize(flat_terms, sort=True)
            key = codes.astype(np.int64) * (shards.max() + 1) + shards
            order = np.argsort(key, kind="stable")
            sk = key[order]
            sd, stf, sdl = doc_ids[order], flat_tfs[order], dls[order]
            starts = np.unique(sk, return_index=True)[1]
            bounds = np.append(starts, sk.size)
            yield pd.DataFrame(
                {
                    "term": uniq_terms[
                        (sk[starts] // (shards.max() + 1)).astype(np.int64)
                    ],
                    "shard": sk[starts] % (shards.max() + 1),
                    "doc_ids": [
                        sd[bounds[i] : bounds[i + 1]] for i in range(starts.size)
                    ],
                    "tfs": [
                        stf[bounds[i] : bounds[i + 1]] for i in range(starts.size)
                    ],
                    "dls": [
                        sdl[bounds[i] : bounds[i + 1]] for i in range(starts.size)
                    ],
                }
            )

    return run


def _make_encoder(block_size: int, shard_range: int):
    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_ids = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in pdf["doc_ids"]]
        )
        tfs = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["tfs"]])
        dls = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["dls"]])
        # runs arrive in arbitrary batch order; one vectorized argsort
        # restores global doc order (correct for any input layout)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        blocks = encode_blocks(doc_ids, tfs, dls, block_size, shard_range)
        out = pd.DataFrame(blocks)
        out.insert(0, "term", pdf["term"].iloc[0])
        return out[POSTING_COLUMNS]

    return encode


def build_postings(
    docs: DataFrame,
    cfg: IndexConfig,
    doc_sorted: bool = True,
) -> DataFrame:
    """docs(doc_id, terms, dl) -> postings blocks (POSTINGS_SCHEMA).

    Stage-2 parallelism is per (term, doc-shard), so a hot Zipf-head
    term encodes in n_docs/shard_range parallel tasks; canonical
    shard-aligned block ids keep the output byte-identical to any other
    build path. ``doc_sorted`` is advisory only (kept for callers that
    know their layout; correctness never depends on it)."""
    del doc_sorted
    src = docs.select(
        "doc_id",
        F.col("terms.terms").alias("terms_arr"),
        F.col("terms.tfs").alias("tfs_arr"),
        "dl",
    )
    partial = src.mapInPandas(
        _make_partial_runs(cfg.shard_range), schema=PARTIAL_SCHEMA
    )
    return partial.groupBy("term", "shard").applyInPandas(
        _make_encoder(cfg.block_size, cfg.shard_range), schema=POSTINGS_SCHEMA
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """Per-term dictionary from block metadata (JVM agg, no decode):
    df = total postings, cf = total tf."""
    return postings.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("cf")
    )
