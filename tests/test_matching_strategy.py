"""matchingStrategy='all' (Meilisearch search param; the default
'last' is the existing words-ranked OR): only documents matching every
query word qualify, where synonyms and typo alternates satisfy the
word they derive from. Checks single-path semantics vs brute force,
batch==single rank identity (incl. serving + filtered), synonym and
typo group satisfaction, and the unsatisfiable-word → zero-hits edge."""

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    IndexConfig,
)
from meilibridge_spark.operators.search import (
    prepare_serving,
    search,
    search_many,
)
from meilibridge_spark.plans.build import build_index

ROWS = [
    (0, "spark shuffle join planning", "en"),
    (1, "spark only spark here", "en"),
    (2, "join order statistics", "de"),
    (3, "spark join spark join", "de"),
    (4, "fast spark joins are rapid", "en"),  # 'rapid' = synonym of fast
    (5, "rapid join of tables", "en"),
]
SCHEMA = "doc_id long, text string, lang string"

CFG = IndexConfig(
    index_name="match-all",
    primary_key=("doc_id",),
    searchable_attributes=("text",),
    filterable_attributes=("lang",),
    analyzer=AnalyzerConfig.make(
        token_pattern=ASCII_TOKEN_PATTERN, synonyms={"fast": ["rapid"]}
    ),
)


@pytest.fixture(scope="module")
def built(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, CFG, doc_id_col="doc_id")
    idx.postings = idx.postings.persist()
    idx.postings.count()
    return idx


def _brute_all(query_groups):
    """Docs where every group has >= 1 token present."""
    out = []
    for doc_id, text, _ in ROWS:
        toks = set(text.split())
        if all(any(t in toks for t in g) for g in query_groups):
            out.append(doc_id)
    return sorted(out)


def test_all_semantics_single(built):
    hits = search(built, "spark join", k=10, matching_strategy="all").collect()
    assert sorted(r["doc_id"] for r in hits) == _brute_all(
        [["spark"], ["join"]]
    )  # docs 0, 3 (not 1: no join; not 2: no spark)
    # default ('last') keeps partial matchers too
    loose = search(built, "spark join", k=10).collect()
    assert len(loose) > len(hits)


def test_all_synonym_satisfies_word(built):
    # 'fast' is satisfied by 'rapid' via the synonym group
    hits = search(built, "fast join", k=10, matching_strategy="all").collect()
    assert sorted(r["doc_id"] for r in hits) == _brute_all(
        [["fast", "rapid"], ["join"]]
    )
    assert 5 in {r["doc_id"] for r in hits}  # rapid + join, no literal fast


def test_all_unsatisfiable_word(built):
    assert (
        search(
            built, "spark zzznothing", k=10, matching_strategy="all"
        ).count()
        == 0
    )


def test_all_validation(built):
    with pytest.raises(ValueError, match="matching_strategy"):
        search(built, "spark", matching_strategy="first")
    with pytest.raises(ValueError, match="matching_strategy"):
        search_many(built, [("q", "spark")], k=5, matching_strategy="bogus")


QUERIES = [
    ("q0", "spark join"),
    ("q1", "fast join"),
    ("q2", "spark zzznothing"),
    ("q3", "spark"),
]


def _batch_ids(idx, **kw):
    rows = search_many(idx, QUERIES, k=10, matching_strategy="all", **kw)
    by_q = {}
    for r in rows.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    return {q: [d for _, d in sorted(v)] for q, v in by_q.items()}


def test_batch_matches_single(built):
    got = _batch_ids(built)
    for qid, text in QUERIES:
        single = [
            r["doc_id"]
            for r in search(
                built, text, k=10, matching_strategy="all"
            ).collect()
        ]
        assert got.get(qid, []) == single, (qid, text)


def test_batch_all_serving_and_filtered(built, spark):
    prepare_serving(built)
    try:
        got = _batch_ids(built)
        single = [
            r["doc_id"]
            for r in search(
                built, "spark join", k=10, matching_strategy="all"
            ).collect()
        ]
        assert got.get("q0", []) == single
        # filtered batch composes: 'all' mask + lang bitmap
        filt = built.docs.filter(F.col("lang") == "de").select("doc_id")
        rows = search_many(
            built, QUERIES, k=10, matching_strategy="all", filter_docs=filt
        ).collect()
        ids = {
            r["doc_id"] for r in rows if r["query_id"] == "q0"
        }
        assert ids == {3}  # doc 3 is the only de doc with spark AND join
    finally:
        built.serving = None


def test_batch_all_with_typo(built):
    # 'sparc' (distance-1 typo of spark) satisfies the spark group
    rows = search_many(
        built,
        [("t0", "sparc join")],
        k=10,
        matching_strategy="all",
        typo=True,
    ).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == _brute_all([["spark"], ["join"]])


def test_all_dropped_query_indexed_orphan_term(built):
    """ADVICE r03 (high): a query dropped as unsatisfiable whose terms
    include an INDEXED word used by no surviving query ('statistics' is
    in doc 2 only) left that term's fetched blocks without an idf entry
    — KeyError aborted the whole batch job. The block fetch must cover
    only surviving-plan terms."""
    rows = search_many(
        built,
        [("q1", "statistics zzznothing"), ("q2", "spark")],
        k=10,
        matching_strategy="all",
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert "q1" not in by_q  # unsatisfiable: zero hits
    assert by_q["q2"] == set(_brute_all([["spark"]]))


def test_all_exactness_rank_batch(built):
    """ADVICE r03 (medium): exactness_rank composed with
    matching_strategy='all' was silently inert in the batch path
    (exact_sets keyed before the word-group suffix). exact_form must
    reflect the exact user-typed form and match the 'last' path."""
    rows = search_many(
        built,
        [("q", "fast join")],
        k=10,
        matching_strategy="all",
        exactness_rank=True,
    ).collect()
    assert rows, "expected hits for 'fast join' under 'all'"
    by_doc = {r["doc_id"]: r["exact_form"] for r in rows}
    # doc 5 matches 'join' exactly but 'fast' only via synonym 'rapid'
    assert by_doc[5] == 1
    last = {
        r["doc_id"]: r["exact_form"]
        for r in search_many(
            built, [("q", "fast join")], k=10, exactness_rank=True
        ).collect()
    }
    for d, ef in by_doc.items():
        assert last[d] == ef, d
