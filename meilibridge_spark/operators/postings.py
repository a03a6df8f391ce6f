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
    "term string, block_id int, n int, first_doc long, last_doc long, "
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
    "term string, first_doc long, doc_ids array<long>, "
    "tfs array<long>, dls array<long>"
)


def explode_terms(docs: DataFrame) -> DataFrame:
    """docs(doc_id, terms array<struct<term,tf>>, dl) ->
    (doc_id, term, tf, dl) rows — kept for operators that want the
    relational form; the posting build itself uses the compact
    partial-run path below."""
    return docs.select(
        "doc_id",
        "dl",
        F.explode("terms").alias("_t"),
    ).select(
        "doc_id",
        F.col("_t.term").alias("term"),
        F.col("_t.tf").alias("tf"),
        "dl",
    )


def _partial_runs(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    for pdf in batches:
        if pdf.empty:
            continue
        terms_col = pdf["terms"]
        lens = np.fromiter((len(x) for x in terms_col), dtype=np.int64, count=len(pdf))
        if lens.sum() == 0:
            continue
        doc_ids = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), lens)
        dls = np.repeat(pdf["dl"].to_numpy(dtype=np.int64), lens)
        flat_terms = np.fromiter(
            (e["term"] for row in terms_col for e in row),
            dtype=object,
            count=int(lens.sum()),
        )
        flat_tfs = np.fromiter(
            (e["tf"] for row in terms_col for e in row),
            dtype=np.int64,
            count=int(lens.sum()),
        )
        # stable sort by term keeps the batch's doc order within a term
        order = np.argsort(flat_terms, kind="stable")
        st, sd, stf, sdl = (
            flat_terms[order],
            doc_ids[order],
            flat_tfs[order],
            dls[order],
        )
        uniq, starts = np.unique(st, return_index=True)
        bounds = np.append(starts, st.size)
        yield pd.DataFrame(
            {
                "term": uniq,
                "first_doc": sd[starts],
                "doc_ids": [sd[bounds[i] : bounds[i + 1]] for i in range(uniq.size)],
                "tfs": [stf[bounds[i] : bounds[i + 1]] for i in range(uniq.size)],
                "dls": [sdl[bounds[i] : bounds[i + 1]] for i in range(uniq.size)],
            }
        )


def _make_encoder(block_size: int):
    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_ids = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in pdf["doc_ids"]]
        )
        tfs = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["tfs"]])
        dls = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["dls"]])
        # runs are disjoint doc ranges when the input was range-laid-out;
        # the argsort makes the result correct for any layout
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        blocks = encode_blocks(doc_ids, tfs, dls, block_size)
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

    ``doc_sorted=False`` forces a range repartition by doc_id first so
    stage-1 batches are contiguous ranges (inputs that didn't come from
    assign_doc_ids, e.g. a table with pre-existing ids)."""
    src = docs.select("doc_id", "terms", "dl")
    if not doc_sorted:
        parts = int(
            docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        src = src.repartitionByRange(parts, "doc_id").sortWithinPartitions("doc_id")
    partial = src.mapInPandas(_partial_runs, schema=PARTIAL_SCHEMA)
    return partial.groupBy("term").applyInPandas(
        _make_encoder(cfg.block_size), schema=POSTINGS_SCHEMA
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """Per-term dictionary from block metadata (JVM agg, no decode):
    df = total postings, cf = total tf."""
    return postings.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("cf")
    )
