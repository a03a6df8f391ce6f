"""matchingStrategy='frequency' (Meilisearch v1.8 search param): the
words criterion becomes the drop level under most-frequent-first word
removal — level(doc) = max drop_rank over query word groups the doc
does NOT satisfy, drop order = corpus df DESC with ties dropped
later-position-first (freq_drop_ranks). Checks the drop-order helper,
single-path level semantics vs brute force, batch==single rank
identity (plain + filtered), synonym group satisfaction, and the
unindexed-word pre-drop (unlike 'all', it never blocks)."""

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    IndexConfig,
)
from meilibridge_spark.operators.search import (
    freq_drop_ranks,
    search,
    search_many,
)
from meilibridge_spark.plans.build import build_index

# corpus df: the=4 docs {0,1,2,4}, join=4 {0,2,3,4}, spark=3 {0,1,3},
# rare=2 {3,4}, gem=2 {3,4}
ROWS = [
    (0, "the spark shuffle join planning the", "en"),
    (1, "the spark only spark here", "en"),
    (2, "the join order statistics", "de"),
    (3, "spark join rare gem", "de"),
    (4, "rare the gem join", "en"),
    (5, "plain text nothing relevant", "en"),
]
SCHEMA = "doc_id long, text string, lang string"

CFG = IndexConfig(
    index_name="match-freq",
    primary_key=("doc_id",),
    searchable_attributes=("text",),
    filterable_attributes=("lang",),
    analyzer=AnalyzerConfig.make(
        token_pattern=ASCII_TOKEN_PATTERN, synonyms={"uncommon": ["rare"]}
    ),
)


@pytest.fixture(scope="module")
def built(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, CFG, doc_id_col="doc_id")
    idx.postings = idx.postings.persist()
    idx.postings.count()
    return idx


def _df_of(term):
    return sum(1 for _, text, _ in ROWS if term in text.split())


def _brute_levels(words):
    """(doc_id -> level) under df-desc / later-position-first drops."""
    order = sorted(
        range(len(words)),
        key=lambda i: (-_df_of(words[i]), -i),
    )
    rank_of = {words[i]: r for r, i in enumerate(order, start=1)}
    out = {}
    for doc_id, text, _ in ROWS:
        toks = set(text.split())
        missing = [rank_of[w] for w in words if w not in toks]
        if len(missing) < len(words):  # matches at least one word
            out[doc_id] = max(missing) if missing else 0
    return out


def test_drop_ranks_df_desc_position_ties():
    idf = {"the": 0.1, "join": 0.1, "rare": 2.0}
    # the(pos0) and join(pos1) tie on idf -> join (later) dropped first
    ranks = freq_drop_ranks([["the"], ["join"], ["rare"]], idf)
    assert ranks == [(1, ["join"]), (2, ["the"]), (3, ["rare"])]
    # unindexed group omitted (pre-dropped), ranks stay contiguous
    ranks = freq_drop_ranks([["zzz"], ["rare"], ["the"]], idf)
    assert ranks == [(1, ["the"]), (2, ["rare"])]


def test_single_levels_match_brute_force(built):
    words = ["the", "join", "rare"]
    hits = search(
        built, " ".join(words), k=10, matching_strategy="frequency"
    ).collect()
    want = _brute_levels(words)
    got = {r["doc_id"]: r["freq_level"] for r in hits}
    assert got == want
    # primary order: level asc, then score desc
    lv = [r["freq_level"] for r in hits]
    assert lv == sorted(lv)
    for a, b in zip(hits, hits[1:]):
        if a["freq_level"] == b["freq_level"]:
            assert a["score"] >= b["score"]


def test_batch_identical_to_single(built):
    queries = [("q1", "the join rare"), ("q2", "spark gem"), ("q3", "rare")]
    batch = search_many(
        built, queries, k=10, matching_strategy="frequency"
    ).collect()
    by_q = {}
    for r in sorted(batch, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9), r["freq_level"])
        )
    for qid, text in queries:
        single = [
            (r["doc_id"], round(r["score"], 9), r["freq_level"])
            for r in search(
                built, text, k=10, matching_strategy="frequency"
            ).collect()
        ]
        assert by_q.get(qid, []) == single, qid


def test_filtered_batch_matches_filtered_single(built, spark):
    filt = built.docs.filter(F.col("lang") == "en").select("doc_id")
    batch = search_many(
        built,
        [("q", "the join rare")],
        k=10,
        matching_strategy="frequency",
        filter_docs=filt,
    ).collect()
    got = [
        (r["doc_id"], r["freq_level"])
        for r in sorted(batch, key=lambda r: r["rank"])
    ]
    single = [
        (r["doc_id"], r["freq_level"])
        for r in search(
            built,
            "the join rare",
            k=10,
            matching_strategy="frequency",
            filter_docs=filt,
        ).collect()
    ]
    assert got == single
    assert all(d in (0, 1, 2, 4, 5) for d, _ in got)


def test_synonym_satisfies_its_word(built):
    # 'uncommon' is unindexed but its synonym 'rare' is: the group is
    # satisfied by docs containing 'rare' (3 and 4), so they take
    # level 0 while every other match needs the drop
    hits = search(
        built, "join uncommon", k=10, matching_strategy="frequency"
    ).collect()
    lv = {r["doc_id"]: r["freq_level"] for r in hits}
    assert lv[3] == 0 and lv[4] == 0
    assert all(v > 0 for d, v in lv.items() if d not in (3, 4))


def test_unindexed_word_never_blocks(built):
    # unlike 'all' (zero hits), frequency pre-drops the unknown word
    all_hits = search(
        built, "join zzznothing", k=10, matching_strategy="all"
    ).collect()
    assert all_hits == []
    freq_hits = search(
        built, "join zzznothing", k=10, matching_strategy="frequency"
    ).collect()
    assert {r["doc_id"] for r in freq_hits} == {0, 2, 3, 4}
    assert all(r["freq_level"] == 0 for r in freq_hits)
