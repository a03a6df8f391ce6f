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


# ------------------------------------------------- batch exhaustive pagination


def test_batch_paged_matches_single_per_query(built):
    from meilibridge_spark.operators.search import search_many

    qs = [("a", "spark join"), ("b", "spark"), ("c", "zzznothing")]
    for page in (1, 2, 3, 9):
        b = search_many(built, qs, page=page, hits_per_page=4).collect()
        for qid, text in qs:
            s = search(built, text, page=page, hits_per_page=4).collect()
            got = sorted(
                (r.doc_id, round(r.score, 9), r.total_hits, r.total_pages)
                for r in b
                if r.query_id == qid
            )
            want = sorted(
                (r.doc_id, round(r.score, 9), r.total_hits, r.total_pages)
                for r in s
            )
            assert got == want, (page, qid)
            # rank stays the absolute pre-slice position
            ranks = sorted(r.rank for r in b if r.query_id == qid)
            lo = (page - 1) * 4
            assert ranks == list(range(lo + 1, lo + 1 + len(ranks)))


def test_batch_count_parity_with_search_count(built):
    from meilibridge_spark.operators.search import (
        search_count,
        search_many_count,
    )

    qs = [
        ("plain", "spark join"),
        ("one", "join"),
        ("none", "zzznothing"),
        ("empty", ""),
    ]
    got = {
        r.query_id: r.total_hits
        for r in search_many_count(built, qs).collect()
    }
    for qid, text in qs:
        want = search_count(built, text).collect()[0].total_hits
        assert got[qid] == want, (qid, got[qid], want)
    assert got["none"] == 0 and got["empty"] == 13


def test_batch_count_strategies_and_filter(built, spark):
    from meilibridge_spark.operators.search import (
        search_count,
        search_many_count,
    )

    filt = built.docs.filter(F.col("doc_id") < 6).select("doc_id")
    qs = [("a", "spark join"), ("b", "spark zzznothing")]
    # matching_strategy='all': b has an unsatisfiable word -> 0
    got = {
        r.query_id: r.total_hits
        for r in search_many_count(
            built, qs, matching_strategy="all", filter_docs=filt
        ).collect()
    }
    for qid, text in qs:
        want = (
            search_count(
                built, text, matching_strategy="all", filter_docs=filt
            )
            .collect()[0]
            .total_hits
        )
        assert got[qid] == want, (qid, got[qid], want)
    assert got["b"] == 0


def test_batch_count_negative_and_placeholder(built):
    from meilibridge_spark.operators.positions import (
        negative_exclusion_docs,
    )
    from meilibridge_spark.operators.search import (
        search_count,
        search_many_count,
    )

    qs = [("neg", "-spark"), ("negpos", "spark -join"), ("ph", "")]
    got = {
        r.query_id: r.total_hits
        for r in search_many_count(built, qs).collect()
    }
    excl = negative_exclusion_docs(built, ["spark"], [])
    want_neg = (
        search_count(built, "", exclude_docs=excl).collect()[0].total_hits
    )
    assert got["neg"] == want_neg == 1  # only doc 20 lacks 'spark'
    # positive term minus negated docs: 12 spark docs, 5 contain 'join'
    assert got["negpos"] == 7
    assert got["ph"] == 13


def test_batch_paged_cap_and_past_cap(spark):
    import dataclasses

    from meilibridge_spark.operators.search import (
        search_many,
        search_many_count,
    )
    from meilibridge_spark.plans.build import build_index

    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(
        df, dataclasses.replace(CFG, max_total_hits=7), doc_id_col="doc_id"
    )
    qs = [("a", "spark")]
    out = search_many(idx, qs, page=1, hits_per_page=3).collect()
    assert out[0].total_hits == 7 and out[0].total_pages == 3
    # page 3 = ranks 7..9 but the counter caps candidates at 7: one hit
    p3 = search_many(idx, qs, page=3, hits_per_page=3).collect()
    assert [r.rank for r in p3] == [7]
    single = search(idx, "spark", page=3, hits_per_page=3).collect()
    assert [r.doc_id for r in p3] == [r.doc_id for r in single]
    # fully past the cap: empty, schema intact
    p4 = search_many(idx, qs, page=4, hits_per_page=3)
    assert p4.count() == 0
    assert {"query_id", "total_hits", "total_pages"} <= set(p4.columns)
    assert (
        search_many_count(idx, qs).collect()[0].total_hits == 7
    )


def test_batch_paged_count_only_carrier_rows(built):
    from meilibridge_spark.operators.search import search_many

    qs = [("a", "spark join"), ("b", "zzznothing"), ("c", "-spark")]
    rows = {
        r.query_id: r
        for r in search_many(built, qs, hits_per_page=0).collect()
    }
    assert set(rows) == {"a", "b", "c"}  # zero-hit queries get a row too
    for r in rows.values():
        assert r.doc_id is None and r.score is None and r.rank is None
        assert r.total_pages == 0 and r.hits_per_page == 0
    assert rows["a"].total_hits == 12
    assert rows["b"].total_hits == 0
    assert rows["c"].total_hits == 1


def test_batch_count_dedups_rank_divergent_queries(built):
    # same term set, different word order / exact form: ONE count key
    from meilibridge_spark.operators.search import search_many_count

    qs = [("x", "spark join"), ("y", "join spark")]
    got = {
        r.query_id: r.total_hits
        for r in search_many_count(built, qs).collect()
    }
    assert got["x"] == got["y"] == 12


def test_batch_paged_composes_with_criteria(built):
    # ranking criteria change order, never membership: totals identical
    # and the paged slice matches the criteria-ranked offset path
    from meilibridge_spark.operators.search import search_many

    qs = [("a", "spark join")]
    plain = search_many(built, qs, page=1, hits_per_page=4).collect()
    ranked = search_many(
        built, qs, page=1, hits_per_page=4, exactness_rank=True
    ).collect()
    assert ranked[0].total_hits == plain[0].total_hits == 12
    off = search_many(built, qs, k=4, exactness_rank=True).collect()
    assert [r.doc_id for r in sorted(ranked, key=lambda r: r.rank)] == [
        r.doc_id for r in sorted(off, key=lambda r: r.rank)
    ]
