"""Q11 `attribute` and `exactness` ranking criteria (reference default
ranking_rules [words, typo, proximity, attribute, sort, exactness],
config/type.go:56): single-path semantics vs a brute-force reference,
batch==single rank identity across every batch variant (shuffled,
serving-resident, filtered), and snapshot round-trip of the attr
blocks."""

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    IndexConfig,
)
from meilibridge_spark.operators.search import search, search_many
from meilibridge_spark.plans.build import build_index

# title is the more important attribute (rank 0), body rank 1
ROWS = [
    (0, "spark shuffle", "join planning and shuffle costs", "en"),
    (1, "vector index", "spark join strategies for wide tables", "en"),
    (2, "join order", "statistics drive the optimizer", "de"),
    (3, "storage formats", "spark spark spark join join", "en"),
    (4, "spark join", "irrelevant body text here", "de"),
    (5, "metrics", "observability of spark executors", "en"),
]
SCHEMA = "doc_id long, title string, body string, lang string"

CFG = IndexConfig(
    index_name="rank-criteria",
    primary_key=("doc_id",),
    searchable_attributes=("title", "body"),
    filterable_attributes=("lang",),
    analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
)


@pytest.fixture(scope="module")
def built(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, CFG, doc_id_col="doc_id", with_attributes=True)
    idx.postings = idx.postings.persist()
    idx.attrs = idx.attrs.persist()
    idx.postings.count()
    return idx


def _brute_attr(query_terms):
    """Reference: per doc, best_attr = min attr rank over matched terms."""
    out = {}
    for doc_id, title, body, _ in ROWS:
        ranks = []
        for t in query_terms:
            if t in title.lower().split():
                ranks.append(0)
            elif t in body.lower().split():
                ranks.append(1)
        if ranks:
            out[doc_id] = min(ranks)
    return out


def test_attribute_rank_semantics(built):
    hits = search(built, "spark join", 10, attribute_rank=True).collect()
    got = {r["doc_id"]: r["best_attr"] for r in hits}
    assert got == _brute_attr(["spark", "join"])
    # ordering: best_attr asc strictly before score
    attrs_in_order = [r["best_attr"] for r in hits]
    assert attrs_in_order == sorted(attrs_in_order)
    # doc 4 has 'spark join' in the TITLE -> best_attr 0, ranks above
    # higher-BM25 body-only matches
    assert hits[0]["best_attr"] == 0


def test_attribute_rank_requires_attr_index(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, CFG, doc_id_col="doc_id", with_attributes=False)
    with pytest.raises(ValueError, match="with_attributes"):
        search(idx, "spark", 5, attribute_rank=True)
    with pytest.raises(ValueError, match="with_attributes"):
        search_many(idx, [("q", "spark")], k=5, attribute_rank=True)


SYN_CFG = IndexConfig(
    index_name="rank-exact",
    primary_key=("doc_id",),
    searchable_attributes=("body",),
    analyzer=AnalyzerConfig.make(
        token_pattern=ASCII_TOKEN_PATTERN, synonyms={"fast": ["quick"]}
    ),
)

EX_ROWS = [
    (0, "a quick join on the fast path"),  # both forms
    (1, "quick quick quick quick join"),   # synonym-only, high tf
    (2, "fast join planning"),             # exact form
    (3, "slow join"),                      # neither
]


@pytest.fixture(scope="module")
def built_syn(spark):
    df = spark.createDataFrame(EX_ROWS, "doc_id long, body string")
    idx = build_index(df, SYN_CFG, doc_id_col="doc_id")
    idx.postings = idx.postings.persist()
    idx.postings.count()
    return idx


def test_exactness_rank_semantics(built_syn):
    """Docs matching the user-typed form ('fast') rank above docs that
    matched only through the synonym ('quick'), regardless of BM25."""
    hits = search(
        built_syn, "fast join", 10,
        exact_terms=["fast", "join"], exactness_rank=True,
    ).collect()
    got = [(r["doc_id"], r["exact_form"]) for r in hits]
    assert {d: e for d, e in got} == {0: 2, 1: 1, 2: 2, 3: 1}
    exacts = [e for _, e in got]
    assert exacts == sorted(exacts, reverse=True)
    assert [d for d, _ in got][:2] == [0, 2] or [d for d, _ in got][:2] == [2, 0]


def _cmp_batch_single(idx, queries, k, single_kw, batch_kw, cols):
    batch = [(f"q{i}", q) for i, q in enumerate(queries)]
    res = search_many(idx, batch, k=k, **batch_kw).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], tuple(r[c] for c in cols))
        )
    for qid, text in batch:
        single = [
            tuple(r[c] for c in cols)
            for r in search(idx, text, k, **single_kw).collect()
        ]
        many = [t for _, t in sorted(by_q.get(qid, []))]
        assert many == pytest.approx(single), f"{qid}: {text!r}"


QUERIES = ["spark join", "vector", "join statistics", "spark", "zzz"]


def test_batch_attribute_matches_single(built):
    for gather in ("driver", "window", "tree"):
        _cmp_batch_single(
            built, QUERIES, 4,
            {"attribute_rank": True},
            {"attribute_rank": True, "gather": gather},
            ["doc_id", "best_attr"],
        )


def test_batch_attribute_serving_and_filtered(built, spark):
    from meilibridge_spark.operators.search import prepare_serving

    # filtered batch with attribute criterion
    filt = built.docs.filter(F.col("lang") == "en").select("doc_id")
    _cmp_batch_single(
        built, QUERIES, 4,
        {"attribute_rank": True, "filter_docs": filt},
        {"attribute_rank": True, "filter_docs": filt},
        ["doc_id", "best_attr"],
    )
    # serving-resident attr blocks (bkind union) — still rank-identical,
    # for both attribute and plain batches
    prepare_serving(built, n_parts=2)
    try:
        assert "bkind" in built.serving.columns
        _cmp_batch_single(
            built, QUERIES, 4,
            {"attribute_rank": True},
            {"attribute_rank": True},
            ["doc_id", "best_attr"],
        )
        _cmp_batch_single(built, QUERIES, 4, {}, {}, ["doc_id"])
    finally:
        built.serving.unpersist()
        built.serving = None


def test_batch_exactness_matches_single(built_syn):
    ex = {"q0": ["fast", "join"], "q1": ["quick"]}
    batch = [("q0", "fast join"), ("q1", "quick")]
    res = search_many(
        built_syn, batch, k=4, exactness_rank=True, exact_terms=ex
    ).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["exact_form"])
        )
    for qid, text in batch:
        single = [
            (r["doc_id"], r["exact_form"])
            for r in search(
                built_syn, text, 4,
                exact_terms=ex[qid], exactness_rank=True,
            ).collect()
        ]
        many = [(d, e) for _, d, e in sorted(by_q[qid])]
        assert many == single, qid
    # default exact set = user-typed tokens (no explicit exact_terms)
    res2 = search_many(built_syn, batch, k=4, exactness_rank=True).collect()
    assert sorted(
        (r["query_id"], r["rank"], r["doc_id"]) for r in res2
    ) == sorted((r["query_id"], r["rank"], r["doc_id"]) for r in res)


def test_composed_criteria_batch_matches_single(built):
    """words + attribute compose in reference rule order in BOTH paths."""
    _cmp_batch_single(
        built, QUERIES, 5,
        {"words_rank": True, "attribute_rank": True},
        {"words_rank": True, "attribute_rank": True},
        ["doc_id", "matched_terms", "best_attr"],
    )


def test_attr_blocks_snapshot_roundtrip(spark, tmp_index_dir):
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import load_snapshot

    df = spark.createDataFrame(ROWS, SCHEMA)
    build_and_save(
        spark, df, CFG, tmp_index_dir,
        doc_id_col="doc_id", with_attributes=True,
    )
    idx = load_snapshot(spark, tmp_index_dir, CFG)
    assert idx.attrs is not None
    hits = search(idx, "spark join", 10, attribute_rank=True).collect()
    assert {r["doc_id"]: r["best_attr"] for r in hits} == _brute_attr(
        ["spark", "join"]
    )


def _brute_search_on(query_terms, allowed):
    """Reference: (term, doc) qualifies iff the term occurs in one of
    the ALLOWED attributes; matched = count of qualifying terms."""
    out = {}
    for doc_id, title, body, _ in ROWS:
        attr_toks = {"title": title.lower().split(), "body": body.lower().split()}
        n = sum(
            1
            for t in query_terms
            if any(t in attr_toks[a] for a in allowed)
        )
        if n:
            out[doc_id] = n
    return out


def test_attributes_to_search_on_semantics(built):
    for allowed in (("title",), ("body",)):
        hits = search(
            built, "spark join", 10, attributes_to_search_on=allowed
        ).collect()
        got = {r["doc_id"]: r["matched_terms"] for r in hits}
        assert got == _brute_search_on(["spark", "join"], allowed), allowed
    # restricting to ALL searchable attributes is a no-op
    full = search(built, "spark join", 10).collect()
    both = search(
        built, "spark join", 10, attributes_to_search_on=("title", "body")
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in both] == pytest.approx(
        [(r["doc_id"], r["score"]) for r in full]
    )
    # doc 0: 'spark' only in title, 'join' only in body (disjoint), so
    # the two restricted scores sum to the unrestricted score
    score_of = lambda rows, d: next(  # noqa: E731
        r["score"] for r in rows if r["doc_id"] == d
    )
    t = search(built, "spark join", 10, attributes_to_search_on=("title",)).collect()
    b = search(built, "spark join", 10, attributes_to_search_on=("body",)).collect()
    assert score_of(t, 0) + score_of(b, 0) == pytest.approx(score_of(full, 0))


def test_attributes_to_search_on_with_attribute_rank(built):
    # best_attr is computed WITHIN the subset: body-restricted hits all
    # carry best_attr == 1 (body is rank 1 of (title, body))
    hits = search(
        built, "spark join", 10,
        attributes_to_search_on=("body",), attribute_rank=True,
    ).collect()
    assert hits and all(r["best_attr"] == 1 for r in hits)


def test_attributes_to_search_on_batch_matches_single(built, spark):
    from meilibridge_spark.operators.search import prepare_serving

    kw = {"attributes_to_search_on": ("title",), "words_rank": True}
    _cmp_batch_single(
        built, QUERIES, 4, kw, kw, ["doc_id", "matched_terms"]
    )
    # filtered-batch path
    filt = built.docs.filter(F.col("lang") == "en").select("doc_id")
    batch = [("q0", "spark join")]
    res = search_many(
        built, batch, k=4, filter_docs=filt,
        attributes_to_search_on=("title",),
    ).collect()
    single = search(
        built, "spark join", 4, filter_docs=filt,
        attributes_to_search_on=("title",),
    ).collect()
    assert sorted((r["doc_id"], r["score"]) for r in res) == pytest.approx(
        sorted((r["doc_id"], r["score"]) for r in single)
    )
    # serving-resident path (attr blocks co-resident via bkind)
    prepare_serving(built, n_parts=2)
    try:
        _cmp_batch_single(
            built, QUERIES, 4, kw, kw, ["doc_id", "matched_terms"]
        )
    finally:
        built.serving.unpersist()
        built.serving = None


def test_attributes_to_search_on_errors(built, spark):
    with pytest.raises(ValueError, match="not a searchable"):
        search(built, "spark", 5, attributes_to_search_on=("lang",))
    with pytest.raises(ValueError, match="at least one"):
        search(built, "spark", 5, attributes_to_search_on=())
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, CFG, doc_id_col="doc_id", with_attributes=False)
    with pytest.raises(ValueError, match="with_attributes"):
        search(idx, "spark", 5, attributes_to_search_on=("title",))
    with pytest.raises(ValueError, match="with_attributes"):
        search_many(idx, [("q", "spark")], k=5, attributes_to_search_on=("title",))
