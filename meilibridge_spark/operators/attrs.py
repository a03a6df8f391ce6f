"""Per-(term, doc) best-attribute-rank postings — the data layer of the
Q11 ``attribute`` ranking criterion (the 4th rule of the reference's
default ranking_rules [words, typo, proximity, attribute, sort,
exactness], /root/reference/config/type.go:56): documents whose matched
terms occur in MORE IMPORTANT searchable attributes (lower index in
``searchable_attributes``, Q5 order) rank first.

Storage reuses the main posting-block machinery verbatim
(operators/postings.py + functions/codec.py): per (term, doc) the "tf"
slot carries ``min_attr_rank + 1`` (1-based keeps the varint/min_dl
metadata semantics untouched) and the dl slot is 0. This buys, for free:

- byte-deterministic, shard-aligned blocks (same canonical layout
  guarantees as the score postings);
- the batch scatter-gather can co-shuffle attr blocks WITH score blocks
  (one union keyed by doc-shard, distinguished by a ``_kind`` column)
  — nothing doc-granular moves, the criterion costs one extra
  compressed-block stream;
- term-sorted parquet pruning for the single-query join path.

Edge (documented): dictionary compounds (Q2) spanning an attribute
boundary exist in the concatenated-text postings but not here; such a
(term, doc) scores normally and takes the no-attr-info sentinel rank.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meilibridge_spark.config import IndexConfig
from meilibridge_spark.functions.tokenizer import tokenize_series
from meilibridge_spark.operators.docs import TERMS_FIELD
from meilibridge_spark.operators.postings import build_postings

#: best_attr when a matched (term, doc) has no attribute info — ranks
#: below every real attribute index
ATTR_RANK_SENTINEL = 1 << 20


def make_attr_rank_udf(analyzer, n_attrs: int):
    """Scalar pandas UDF over the N searchable-attribute text columns ->
    struct{terms: [..], tfs: [min_attr_rank + 1, ..]} per doc (the
    struct-of-arrays layout build_postings consumes; 'tfs' carries the
    1-based rank)."""

    @F.pandas_udf(TERMS_FIELD)
    def attr_rank_udf(*cols: pd.Series) -> pd.DataFrame:
        tok_lists = [tokenize_series(c, analyzer) for c in cols]
        terms_out: "list[list[str]]" = []
        ranks_out: "list[list[int]]" = []
        for i in range(len(tok_lists[0])):
            best: "dict[str, int]" = {}
            # attribute order = importance order: first occurrence wins
            for rank in range(n_attrs):
                for t in tok_lists[rank].iloc[i]:
                    if t not in best:
                        best[t] = rank + 1
            terms_out.append(list(best.keys()))
            ranks_out.append(list(best.values()))
        return pd.DataFrame(
            {"terms": terms_out, "tfs": ranks_out}, index=cols[0].index
        )

    return attr_rank_udf


def assemble_attr_docs(docs: DataFrame, cfg: IndexConfig) -> DataFrame:
    """docs (original columns + doc_id) -> (doc_id, terms{terms,
    tfs=rank+1}, dl=0), ready for build_postings."""
    attrs = cfg.searchable_attributes
    udf = make_attr_rank_udf(cfg.analyzer, len(attrs))
    inputs = [
        F.coalesce(F.col(a).cast("string"), F.lit("")) for a in attrs
    ]
    return docs.select(
        "doc_id", udf(*inputs).alias("terms")
    ).withColumn("dl", F.lit(0).cast("long"))


def build_attr_postings(docs: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Attribute-rank blocks in POSTINGS_SCHEMA (tf slot = rank+1)."""
    return build_postings(assemble_attr_docs(docs, cfg), cfg)
