"""Meilisearch placeholder search (empty / stop-word-only ``q``): a
query whose text yields NO indexable tokens matches ALL documents —
score 0.0, matching criteria vacuously inactive, order = doc-field
rules (custom rules / ``sort``) then doc_id asc. Endpoint layers route
automatically: ``search_with_phrases`` (single-query),
``search_many`` (batch — the same placeholder candidate path
negative-only queries use, with an empty exclusion set),
``multi_search`` (offset AND exhaustive-pagination modes), the query
CLI (``--query ""``), and ``search_count`` (count form, covered in
test_count). The low-level ``search()`` PRIMITIVE stays
term-scoring-only (empty token set = no hits) — pinned here as a
regression anchor so the layering never silently changes."""

import json
import sys

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    IndexConfig,
)
from meilibridge_spark.operators.positions import search_with_phrases
from meilibridge_spark.operators.search import (
    placeholder_search,
    search,
    search_many,
)
from meilibridge_spark.plans.build import build_index

ROWS = [
    (0, "the spark shuffle join planning", "en", 2),
    (1, "the spark only spark here", "en", 5),
    (2, "the join order statistics", "de", 4),
    (3, "spark join rare gem", "de", 1),
    (4, "rare the gem join", "en", 3),
    (5, "plain text nothing relevant", "en", 0),
]
SCHEMA = "doc_id long, text string, lang string, stars int"

CFG = IndexConfig(
    index_name="placeholder",
    primary_key=("doc_id",),
    searchable_attributes=("text",),
    filterable_attributes=("lang",),
    analyzer=AnalyzerConfig.make(
        token_pattern=ASCII_TOKEN_PATTERN, stop_words=("the",)
    ),
)

ALL_IDS = [r[0] for r in ROWS]


@pytest.fixture(scope="module")
def built(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, CFG, doc_id_col="doc_id")
    idx.postings = idx.postings.persist()
    idx.postings.count()
    return idx


def _hits(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("q", ["", "   ", "the", "the the"])
def test_empty_and_stopword_only_match_all_docs(built, q):
    got = _hits(search_with_phrases(built, q, 10))
    assert [d for d, _ in got] == ALL_IDS
    assert all(s == 0.0 for _, s in got)


def test_k_bounds_placeholder(built):
    assert [d for d, _ in _hits(search_with_phrases(built, "", 3))] == [
        0,
        1,
        2,
    ]


def test_search_primitive_stays_empty(built):
    # search() is the term-scoring primitive: no tokens -> no hits
    # (endpoint layers own the placeholder routing)
    assert search(built, "", 10).count() == 0
    assert search(built, "the", 10).count() == 0


def test_sort_composes_with_placeholder(built):
    got = search_with_phrases(
        built, "", 10, sort_params=[("stars", False)]
    ).collect()
    assert [r["doc_id"] for r in got] == [1, 2, 4, 0, 3, 5]
    assert [r["stars"] for r in got] == [5, 4, 3, 2, 1, 0]


def test_filter_composes_with_placeholder(built):
    filt = built.docs.filter(F.col("lang") == "de").select("doc_id")
    got = _hits(search_with_phrases(built, "", 10, filter_docs=filt))
    assert [d for d, _ in got] == [2, 3]


def test_placeholder_exhaustive_pagination(built):
    rows = search_with_phrases(
        built, "", page=2, hits_per_page=2
    ).collect()
    assert [r["doc_id"] for r in rows] == [2, 3]
    assert rows[0]["total_hits"] == len(ROWS)
    assert rows[0]["total_pages"] == 3
    assert rows[0]["page"] == 2 and rows[0]["hits_per_page"] == 2


def test_placeholder_page_rank_col(built):
    rows = placeholder_search(
        built, page=1, hits_per_page=4, page_rank_col="rank"
    ).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]


def test_batch_matches_single(built):
    res = search_many(
        built, [("qa", ""), ("qb", "spark"), ("qc", "the")], k=4
    ).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    # placeholder entries: all docs (doc_id asc), score 0, rank absolute
    for qid in ("qa", "qc"):
        got = sorted(by_q[qid])
        assert [d for _, d, _ in got] == ALL_IDS[:4]
        assert all(s == 0.0 for _, _, s in got)
        assert [rk for rk, _, _ in got] == [1, 2, 3, 4]
    # the term query is untouched by the classification
    single = _hits(search(built, "spark", 4))
    got = [(d, s) for _, d, s in sorted(by_q["qb"])]
    assert got == single and got


def test_batch_all_placeholder_queries(built):
    # every query token-empty -> empty plan, placeholder union only
    res = search_many(built, [("q1", ""), ("q2", "the")], k=2).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert sorted(by_q) == ["q1", "q2"]
    assert sorted(by_q["q1"]) == sorted(by_q["q2"]) == [0, 1]


def test_batch_placeholder_respects_filter(built):
    filt = built.docs.filter(F.col("lang") == "en").select("doc_id")
    res = search_many(
        built, [("qa", ""), ("qb", "join")], k=10, filter_docs=filt
    ).collect()
    qa = sorted(r["doc_id"] for r in res if r["query_id"] == "qa")
    assert qa == [0, 1, 4, 5]


def test_multi_search_empty_q_offset_and_paged(built):
    from meilibridge_spark.operators.multisearch import multi_search

    out = multi_search(
        {"ph": built},
        [
            {"index_uid": "ph", "q": "", "k": 3},
            {"index_uid": "ph", "q": "spark", "k": 2},
            {"index_uid": "ph", "q": "the", "page": 2, "hits_per_page": 2},
        ],
    ).collect()
    r0 = [r for r in out if r["request_no"] == 0]
    assert [r["doc_id"] for r in sorted(r0, key=lambda r: r["rank"])] == [
        0,
        1,
        2,
    ]
    r1 = [r for r in out if r["request_no"] == 1]
    assert [r["doc_id"] for r in sorted(r1, key=lambda r: r["rank"])] == [
        d for d, _ in _hits(search(built, "spark", 2))
    ]
    r2 = sorted(
        (r for r in out if r["request_no"] == 2), key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in r2] == [2, 3]
    assert r2[0]["total_hits"] == len(ROWS) and r2[0]["total_pages"] == 3


def test_cli_empty_query(spark, tmp_path_factory, monkeypatch, capsys):
    from meilibridge_spark.jobs import query as qjob
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.transcripts import generate_transcripts

    d = str(tmp_path_factory.mktemp("phcli"))
    src = generate_transcripts(spark, n_convs=20, seed=7)
    build_and_save(spark, src, IndexConfig(index_name="phcli"), d)
    n_docs = src.count()

    def run(*args):
        monkeypatch.setattr(sys, "argv", ["query.py", *args])
        qjob.main()
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    resp = run("--index-dir", d, "--query", "", "-k", "5")
    assert len(resp["hits"]) == 5
    assert all(h["score"] == 0.0 for h in resp["hits"])
    assert [h["doc_id"] for h in resp["hits"]] == [0, 1, 2, 3, 4]

    paged = run(
        "--index-dir", d, "--query", "", "--page", "1",
        "--hits-per-page", "3",
    )
    assert len(paged["hits"]) == 3
    assert paged["totalHits"] == min(n_docs, 1000)
