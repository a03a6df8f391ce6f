"""Exhaustive pagination (Meilisearch ``page`` / ``hitsPerPage``,
v0.30+): page-sliced hits with exhaustive total_hits / total_pages
metadata, total_hits capped at maxTotalHits, page slices identical to
the offset path, placeholder-query composition, and the recorded
``hitsPerPage=0`` deviation."""

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    IndexConfig,
)
from meilibridge_spark.operators.search import placeholder_search, search
from meilibridge_spark.plans.build import build_index

# 12 docs match 'spark'; 5 also match 'join' (higher scores); doc 20
# matches neither
ROWS = [(i, f"spark doc number {i}" + (" join" if i < 5 else ""))
        for i in range(12)] + [(20, "unrelated text entirely")]
SCHEMA = "doc_id long, body string"

CFG = IndexConfig(
    index_name="paging",
    primary_key=("doc_id",),
    searchable_attributes=("body",),
    analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
)


@pytest.fixture(scope="module")
def built(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, CFG, doc_id_col="doc_id")
    idx.postings = idx.postings.persist()
    idx.postings.count()
    return idx


def _ids(df):
    return [r.doc_id for r in df.collect()]


def test_page_slices_match_offset_path(built):
    # every page of 4 equals the offset path's same slice, in order
    full = _ids(search(built, "spark join", k=12))
    for page in (1, 2, 3):
        got = search(built, "spark join", page=page, hits_per_page=4)
        assert _ids(got) == full[(page - 1) * 4 : page * 4]


def test_total_hits_and_pages_exhaustive(built):
    out = search(built, "spark join", page=1, hits_per_page=5)
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert r.total_hits == 12  # every 'spark' doc, not just the page
        assert r.total_pages == 3  # ceil(12 / 5)
        assert r.page == 1 and r.hits_per_page == 5


def test_total_hits_capped_at_max_total_hits(spark):
    import dataclasses

    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(
        df, dataclasses.replace(CFG, max_total_hits=7), doc_id_col="doc_id"
    )
    out = search(idx, "spark", page=1, hits_per_page=3).collect()
    assert out[0].total_hits == 7  # 12 matches, counter capped like the endpoint
    assert out[0].total_pages == 3  # ceil(7 / 3)


def test_page_past_end_empty_schema_intact(built):
    out = search(built, "spark", page=9, hits_per_page=5)
    assert out.count() == 0
    assert {"doc_id", "score", "total_hits", "total_pages", "page",
            "hits_per_page"} <= set(out.columns)


def test_last_partial_page(built):
    out = search(built, "spark", page=3, hits_per_page=5)
    assert out.count() == 2  # 12 = 5 + 5 + 2


def test_defaults_when_one_param_given(built):
    # page alone -> hitsPerPage defaults to 20 (one page holds all 12)
    assert search(built, "spark", page=1).count() == 12
    assert search(built, "spark", page=2).count() == 0
    # hitsPerPage alone -> page defaults to 1
    got = search(built, "spark join", hits_per_page=3)
    assert _ids(got) == _ids(search(built, "spark join", k=3))


def test_hits_per_page_zero_recorded_deviation(built):
    out = search(built, "spark", page=1, hits_per_page=0)
    assert out.count() == 0  # count-only queries: documented deviation


def test_invalid_params_raise(built):
    with pytest.raises(ValueError, match="page"):
        search(built, "spark", page=0)
    with pytest.raises(ValueError, match="hitsPerPage"):
        search(built, "spark", hits_per_page=-1)


def test_composes_with_filter(built):
    filt = built.docs.filter(F.col("doc_id") < 6).select("doc_id")
    out = search(
        built, "spark", filter_docs=filt, page=1, hits_per_page=4
    ).collect()
    assert len(out) == 4
    assert out[0].total_hits == 6 and out[0].total_pages == 2


def test_placeholder_pagination(built):
    # empty-q + page/hitsPerPage: all 13 docs, doc_id order
    out = placeholder_search(built, page=2, hits_per_page=5)
    assert _ids(out) == [5, 6, 7, 8, 9]
    r = out.collect()[0]
    assert r.total_hits == 13 and r.total_pages == 3


# ------------------------------------------------- serving-path pagination


def test_driver_searcher_page_parity(built):
    from meilibridge_spark.operators.search import DriverSearcher

    s = DriverSearcher(built)
    for page in (1, 2, 3):
        hits, total, pages = s.search_page(
            "spark join", page=page, hits_per_page=4
        )
        df = search(built, "spark join", page=page, hits_per_page=4)
        rows = df.collect()
        assert [d for d, _ in hits] == [r.doc_id for r in rows]
        if rows:
            assert total == rows[0].total_hits
            assert pages == rows[0].total_pages


def test_driver_searcher_page_count_only_and_past_end(built):
    from meilibridge_spark.operators.search import DriverSearcher

    s = DriverSearcher(built)
    hits, total, pages = s.search_page("spark", page=1, hits_per_page=0)
    assert hits == [] and total == 12 and pages == 0
    hits, total, pages = s.search_page("spark", page=9, hits_per_page=5)
    assert hits == [] and total == 12 and pages == 3
    with pytest.raises(ValueError, match="page"):
        s.search_page("spark", page=0)


def test_driver_searcher_page_with_filter(built):
    from meilibridge_spark.operators.search import DriverSearcher

    s = DriverSearcher(built)
    filt = built.docs.filter(F.col("doc_id") < 6).select("doc_id")
    allowed = s.prepare_filter(filt)
    hits, total, pages = s.search_page(
        "spark", page=2, hits_per_page=4, filter_docs=allowed
    )
    assert total == 6 and pages == 2 and len(hits) == 2
    df_rows = search(
        built, "spark", filter_docs=filt, page=2, hits_per_page=4
    ).collect()
    assert [d for d, _ in hits] == [r.doc_id for r in df_rows]
