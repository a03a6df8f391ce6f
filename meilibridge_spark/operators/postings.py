"""Term-partitioned posting-list construction (SURVEY.md §2C, §7 stages 3-5).

Two-stage salted build to defuse hot-term skew (the transcripts vocab is
Zipfian — a vanilla ``groupBy(term)`` straggles on head terms):

  stage 1 (JVM only): salt = doc-range bucket; ``groupBy(term, salt)``
      + ``sort_array(collect_list(struct(doc_id, tf, dl)))`` builds
      docID-sorted partial runs with map-side combine — a hot term's
      postings are built by ``n_salts`` parallel tasks.
  stage 2 (grouped-map pandas UDF): ``groupBy(term)`` over the compact
      partial runs (n_salts rows/term, arrays not scalars) concatenates
      runs in salt order — salts are doc_id RANGES, so concatenation in
      salt order IS the globally sorted run — then delta-gap+varint
      block-encodes (functions/codec.py).

The shuffle that moves raw (term, doc_id, tf, dl) tuples is stage 1's
only wide exchange; stage 2 shuffles ~n_salts compressed array rows per
term. Encoding is content-deterministic, so the same corpus always
yields byte-identical postings (resume/identity tests rely on this).
"""

from __future__ import annotations

import pandas as pd
import numpy as np
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


def explode_terms(docs: DataFrame) -> DataFrame:
    """docs(doc_id, terms array<struct<term,tf>>, dl) ->
    (doc_id, term, tf, dl) — tf already per-doc combined (no extra
    groupBy shuffle; Catalyst prunes every other docs column)."""
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


def _make_encoder(block_size: int):
    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("salt")
        doc_ids = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["doc_ids"]])
        tfs = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["tfs"]])
        dls = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["dls"]])
        term = pdf["term"].iloc[0]
        blocks = encode_blocks(doc_ids, tfs, dls, block_size)
        out = pd.DataFrame(blocks)
        out.insert(0, "term", term)
        return out[POSTING_COLUMNS]

    return encode


def build_postings(
    term_rows: DataFrame,
    cfg: IndexConfig,
    n_docs: int,
) -> DataFrame:
    """(doc_id, term, tf, dl) -> postings blocks (POSTINGS_SCHEMA).

    ``n_docs`` sizes the doc-range salt so stage-2 concatenation in
    salt order preserves global docID order.
    """
    n_salts = max(1, cfg.n_salts)
    range_size = max(1, -(-n_docs // n_salts))  # ceil
    salted = term_rows.withColumn(
        "salt", (F.col("doc_id") / F.lit(range_size)).cast("int")
    )
    partial = (
        salted.groupBy("term", "salt")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf", "dl"))
            ).alias("run")
        )
        .select(
            "term",
            "salt",
            F.col("run.doc_id").alias("doc_ids"),
            F.col("run.tf").alias("tfs"),
            F.col("run.dl").alias("dls"),
        )
    )
    return partial.groupBy("term").applyInPandas(
        _make_encoder(cfg.block_size), schema=POSTINGS_SCHEMA
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """Per-term dictionary from block metadata (JVM agg, no decode):
    df = total postings, cf = total tf."""
    return postings.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("cf")
    )
