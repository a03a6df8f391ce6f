"""Relational post-processing of hit sets (SURVEY.md §2B Q6-Q10).

These are the Meilisearch settings the reference ships
(config/type.go:55-96) re-expressed as stock DataFrame ops over
(hits ⋈ docs): faceting, sort override, distinct attribute, displayed
attributes. All JVM-side Catalyst plans — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hits_with_docs(hits: DataFrame, docs: DataFrame, attrs: "list[str]") -> DataFrame:
    """hits(doc_id, score, ...) ⋈ docs on doc_id, keeping score + attrs.
    The hit set is small (<= max_total_hits) -> broadcast it."""
    return F.broadcast(hits).join(docs.select("doc_id", *attrs), "doc_id")


def facet_counts(
    hits: DataFrame, docs: DataFrame, attr: str, max_values: int = 100
) -> DataFrame:
    """Q8: per-facet value counts over matching docs, <= max_values,
    lexicographic (faceting.max_values_per_facet, config/type.go:86-88)."""
    return (
        hits_with_docs(hits, docs, [attr])
        .groupBy(attr)
        .agg(F.count("*").alias("count"))
        .orderBy(F.col(attr).asc())
        .limit(max_values)
    )


def distinct_hits(hits: DataFrame, docs: DataFrame, attr: str) -> DataFrame:
    """Q10: keep the best-scoring hit per attribute value
    (distinct_attribute, config/type.go:57). Ordering inside each group
    pins floats via 1e-9 rounding + doc_id tie-break."""
    w = Window.partitionBy(attr).orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id").asc()
    )
    return (
        hits_with_docs(hits, docs, [attr])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def sort_hits(
    hits: DataFrame,
    docs: DataFrame,
    sort_attrs: "list[tuple[str, bool]]",
    k: "int | None" = None,
) -> DataFrame:
    """Q9: user sort overrides relevancy order (sortable_attributes,
    config/type.go:63). sort_attrs = [(col, ascending)]; relevancy then
    doc_id remain the final tie-breaks."""
    attrs = [a for a, _ in sort_attrs]
    order = [
        (F.col(a).asc() if asc else F.col(a).desc()) for a, asc in sort_attrs
    ] + [F.round(F.col("score"), 9).desc(), F.col("doc_id").asc()]
    out = hits_with_docs(hits, docs, attrs).orderBy(*order)
    return out.limit(k) if k else out


def display(hits: DataFrame, docs: DataFrame, attrs: "list[str]") -> DataFrame:
    """Q6: displayed_attributes projection of returned hits
    (config/type.go:59)."""
    return hits_with_docs(hits, docs, list(attrs)).select(
        "doc_id", *attrs, "score"
    )
