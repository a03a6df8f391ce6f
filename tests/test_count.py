"""Count-only queries (Meilisearch ``hitsPerPage=0``): ``search_count``
returns one ``(total_hits, total_pages=0)`` row — exhaustive capped
count, parity with the paged path's totals and the serving path's
count-only response, placeholder semantics for empty queries, and the
zero-decode single-term plan."""

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    IndexConfig,
)
from meilibridge_spark.operators.search import search, search_count
from meilibridge_spark.plans.build import build_index

# 12 docs match 'spark'; 5 also match 'join'; doc 20 matches neither
ROWS = [(i, f"spark doc number {i}" + (" join" if i < 5 else ""))
        for i in range(12)] + [(20, "unrelated text entirely")]
SCHEMA = "doc_id long, body string"

CFG = IndexConfig(
    index_name="counting",
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


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_count_matches_paged_totals(built):
    r = _one(search_count(built, "spark join"))
    assert (r.total_hits, r.total_pages) == (12, 0)
    paged = search(built, "spark join", page=1, hits_per_page=5).collect()
    assert r.total_hits == paged[0].total_hits


def test_single_term_fast_path(built):
    # block-metadata sum == decoded distinct count (the zero-decode
    # ReadSchema assertion lives in test_plans.py against a saved
    # snapshot — an in-memory build has no parquet scan to prune)
    df = search_count(built, "join")
    assert df.columns == ["total_hits", "total_pages"]
    assert _one(df).total_hits == 5


def test_all_strategy_count(built):
    r = _one(search_count(built, "spark join", matching_strategy="all"))
    want = search(
        built, "spark join", k=100, matching_strategy="all"
    ).count()
    assert r.total_hits == want == 5


def test_all_shared_alternate_satisfies_both_groups(spark):
    # 'rapid' is a synonym alternate of BOTH words: a doc containing
    # only 'rapid' satisfies both groups (alternates stand in for
    # their word), exercising the (term, group) multi-membership map
    cfg = IndexConfig(
        index_name="count_syn",
        primary_key=("doc_id",),
        searchable_attributes=("body",),
        analyzer=AnalyzerConfig.make(
            token_pattern=ASCII_TOKEN_PATTERN,
            synonyms={"fast": ["rapid"], "quick": ["rapid"]},
        ),
    )
    df = spark.createDataFrame(
        [(0, "rapid car"), (1, "fast car"), (2, "quick car"),
         (3, "fast quick")],
        SCHEMA,
    )
    idx = build_index(df, cfg, doc_id_col="doc_id")
    r = _one(search_count(idx, "fast quick", matching_strategy="all"))
    assert r.total_hits == 2  # docs 0 and 3
    want = search(
        idx, "fast quick", k=100, matching_strategy="all"
    ).count()
    assert r.total_hits == want


def test_filter_and_exclusion_compose(built):
    filt = built.docs.filter(F.col("doc_id") < 6).select("doc_id")
    assert _one(search_count(built, "spark", filter_docs=filt)).total_hits == 6
    assert _one(
        search_count(built, "spark", exclude_docs=filt)
    ).total_hits == 6
    # single term + filter must NOT take the metadata fast path
    assert _one(
        search_count(built, "join", filter_docs=filt)
    ).total_hits == 5


def test_placeholder_and_unindexed(built):
    # empty q counts ALL documents (the endpoint's placeholder count)
    assert _one(search_count(built, "")).total_hits == 13
    filt = built.docs.filter(F.col("doc_id") < 3).select("doc_id")
    assert _one(search_count(built, "", filter_docs=filt)).total_hits == 3
    # no indexed term -> 0 matches
    assert _one(search_count(built, "zzznothing")).total_hits == 0
    assert _one(
        search_count(built, "zzznothing spark", matching_strategy="all")
    ).total_hits == 0


def test_count_capped_at_max_total_hits(spark):
    cfg = IndexConfig(
        index_name="count_cap",
        primary_key=("doc_id",),
        searchable_attributes=("body",),
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
        max_total_hits=4,
    )
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, cfg, doc_id_col="doc_id")
    assert _one(search_count(idx, "spark join")).total_hits == 4
    assert _one(search_count(idx, "join")).total_hits == 4  # fast path
    assert _one(search_count(idx, "")).total_hits == 4  # placeholder


def test_serving_count_parity(built):
    from meilibridge_spark.operators.search import DriverSearcher

    s = DriverSearcher(built)
    hits, total, pages = s.search_page("spark join", hits_per_page=0)
    r = _one(search_count(built, "spark join"))
    assert hits == [] and (total, pages) == (r.total_hits, r.total_pages)
    filt = built.docs.filter(F.col("doc_id") < 6).select("doc_id")
    _, ftotal, _ = s.search_page(
        "spark", hits_per_page=0, filter_docs=s.prepare_filter(filt)
    )
    assert ftotal == _one(
        search_count(built, "spark", filter_docs=filt)
    ).total_hits


def test_invalid_strategy_raises(built):
    with pytest.raises(ValueError, match="matching_strategy"):
        search_count(built, "spark", matching_strategy="frequency")
