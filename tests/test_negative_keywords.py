"""Negative keywords/phrases (Meilisearch v1.8 search syntax):
``-word`` excludes every document containing the literal word,
``-"a phrase"`` excludes documents containing the contiguous phrase.
Parsed by positions.parse_negative, executed as an exclusion doc set
anti-joined inside search (exclude_docs). Checks the parser (mid-word
hyphens, unbalanced quotes), word and phrase exclusion vs brute force,
composition with positive phrases and filters, and the
stop-word/unknown-word no-ops. A negative-only query (no indexable
positive tokens) searches ALL documents and applies the exclusion —
Meilisearch's placeholder-search semantics, routed through
search.placeholder_search (docs scan, doc_id order, score 0.0), in
both the single and the batch path."""

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    IndexConfig,
)
from meilibridge_spark.operators.positions import (
    build_positions,
    negative_exclusion_docs,
    parse_negative,
    search_with_phrases,
)
from meilibridge_spark.operators.search import search
from meilibridge_spark.plans.build import build_index

ROWS = [
    (0, "the spark shuffle join planning", "en"),
    (1, "the spark only spark here", "en"),
    (2, "the join order statistics", "de"),
    (3, "spark join rare gem", "de"),
    (4, "rare the gem join", "en"),
    (5, "plain text nothing relevant", "en"),
]
SCHEMA = "doc_id long, text string, lang string"

CFG = IndexConfig(
    index_name="neg-kw",
    primary_key=("doc_id",),
    searchable_attributes=("text",),
    filterable_attributes=("lang",),
    analyzer=AnalyzerConfig.make(
        token_pattern=ASCII_TOKEN_PATTERN, stop_words=("the",)
    ),
)


@pytest.fixture(scope="module")
def built(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, CFG, doc_id_col="doc_id")
    idx.positions = build_positions(df, CFG)
    idx.postings = idx.postings.persist()
    idx.postings.count()
    return idx


def test_parse_negative():
    rest, words, phrases = parse_negative('spark -slow -"hash join" x')
    assert rest.split() == ["spark", "x"]
    assert words == ["slow"] and phrases == ["hash join"]
    # '-' only negates after whitespace / at start: mid-word hyphens stay
    rest, words, phrases = parse_negative("state-of-art -bad")
    assert rest.split() == ["state-of-art"]
    assert words == ["bad"] and phrases == []
    # leading negative + unbalanced trailing quote opens to end-of-string
    rest, words, phrases = parse_negative('-x spark -"rare gem')
    assert rest.split() == ["spark"]
    assert words == ["x"] and phrases == ["rare gem"]
    # no negatives -> untouched
    assert parse_negative('a "b c" d') == ('a "b c" d', [], [])


def test_negative_word_excludes(built):
    base = {r["doc_id"] for r in search(built, "join", k=10).collect()}
    assert base == {0, 2, 3, 4}
    hits = search_with_phrases(built, "join -rare", k=10).collect()
    assert {r["doc_id"] for r in hits} == {0, 2}
    # scores equal the plain search's scores (exclusion, not re-ranking)
    plain = {
        r["doc_id"]: r["score"] for r in search(built, "join", k=10).collect()
    }
    for r in hits:
        assert r["score"] == pytest.approx(plain[r["doc_id"]])


def test_negative_phrase_adjacency(built):
    # doc 3 has contiguous 'rare gem'; doc 4 has 'rare the gem' (the
    # stop word keeps its position slot, so the phrase does NOT match)
    hits = search_with_phrases(built, 'join -"rare gem"', k=10).collect()
    assert {r["doc_id"] for r in hits} == {0, 2, 4}


def test_negative_composes_with_positive_phrase_and_filter(built, spark):
    filt = built.docs.filter(F.col("lang") == "en").select("doc_id")
    hits = search_with_phrases(
        built, '"spark shuffle" join -statistics', k=10, filter_docs=filt
    ).collect()
    assert [r["doc_id"] for r in hits] == [0]


def test_negative_stopword_and_unknown_are_noops(built):
    # 'the' is a stop word (tokenizes to nothing), 'zzz' is unindexed
    hits = search_with_phrases(built, "join -the -zzz", k=10).collect()
    assert {r["doc_id"] for r in hits} == {0, 2, 3, 4}
    assert (
        negative_exclusion_docs(built, ["the"], []) is None
    )


def test_negative_only_query_is_placeholder_minus_exclusion(built):
    # Meilisearch v1.8: a query of only negatives searches ALL
    # documents and applies the exclusion (placeholder semantics)
    hits = search_with_phrases(built, "-rare", k=10).collect()
    assert [r["doc_id"] for r in hits] == [0, 1, 2, 5]
    assert all(r["score"] == 0.0 and r["matched_terms"] == 0 for r in hits)
    # negative PHRASE only: adjacency ban (doc 4's stop-word slot
    # keeps it unbanned)
    hits = search_with_phrases(built, '-"rare gem"', k=10).collect()
    assert [r["doc_id"] for r in hits] == [0, 1, 2, 4, 5]
    # stop-word-only positive part is still negative-only
    hits = search_with_phrases(built, "the -rare", k=10).collect()
    assert [r["doc_id"] for r in hits] == [0, 1, 2, 5]


def test_negative_only_composes_with_filter_offset_k(built):
    filt = built.docs.filter(F.col("lang") == "en").select("doc_id")
    hits = search_with_phrases(
        built, "-rare", k=10, filter_docs=filt
    ).collect()
    # en docs {0, 1, 5} minus rare docs {3, 4}
    assert [r["doc_id"] for r in hits] == [0, 1, 5]
    hits = search_with_phrases(built, "-rare", k=2, offset=1).collect()
    assert [r["doc_id"] for r in hits] == [1, 2]
    # the sort parameter applies to placeholder hits (single path)
    hits = search_with_phrases(
        built, "-rare", k=10, sort_params=[("lang", True)]
    ).collect()
    assert [r["doc_id"] for r in hits] == [2, 0, 1, 5]
    assert [r["lang"] for r in hits] == ["de", "en", "en", "en"]


def test_batch_negative_only_unions_with_scored_queries(built):
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built,
        [("a", "-rare"), ("b", "join"), ("c", '-"rare gem"')],
        k=10,
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    a = sorted(by_q["a"], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in a] == [0, 1, 2, 5]
    assert [r["rank"] for r in a] == [1, 2, 3, 4]
    assert all(r["score"] == 0.0 for r in a)
    assert {r["doc_id"] for r in by_q["b"]} == {0, 2, 3, 4}
    c = sorted(by_q["c"], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in c] == [0, 1, 2, 4, 5]


def test_batch_negative_only_with_sort_rule(built):
    # doc-field rules apply to placeholder hits too (Meilisearch sorts
    # placeholder results): sort composes at its rule position, the
    # field is an output column with REAL doc values
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built,
        [("a", "-rare"), ("b", "join")],
        k=10,
        sort_params=[("lang", True)],
    ).collect()
    a = sorted(
        (r for r in rows if r["query_id"] == "a"), key=lambda r: r["rank"]
    )
    # candidates {0,1,2,5}: 'de' (doc 2) before 'en' (0,1,5), doc_id ties
    assert [r["doc_id"] for r in a] == [2, 0, 1, 5]
    assert [r["lang"] for r in a] == ["de", "en", "en", "en"]
    b = sorted(
        (r for r in rows if r["query_id"] == "b"), key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in b][:2] == [2, 3]  # de docs first


def test_batch_all_negative_only(built):
    # every query negative-only: the scored plan is empty, the
    # placeholder path alone produces the result
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built, [("a", "-rare"), ("b", "-join")], k=10
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q["a"] == {0, 1, 2, 5}
    assert by_q["b"] == {1, 5}


def test_explicit_exclude_docs_composes(built, spark):
    extra = spark.createDataFrame([(0,)], "doc_id long")
    hits = search_with_phrases(
        built, "join -rare", k=10, exclude_docs=extra
    ).collect()
    assert {r["doc_id"] for r in hits} == {2}


def test_parse_negative_is_quote_aware():
    # a dash INSIDE a positive quoted segment is part of the phrase,
    # not a negation (the old regex pass grabbed 'shuffle"' as a
    # negative word, inverting the query)
    rest, words, phrases = parse_negative('join "spark -shuffle"')
    assert rest == 'join "spark -shuffle"'
    assert words == [] and phrases == []
    # mixed: quoted segments pass through, outside dashes still negate
    rest, words, phrases = parse_negative('"a -b" -c "d -e')
    assert words == ["c"] and phrases == []
    assert '"a -b"' in rest and '"d -e' in rest


def test_dash_inside_positive_phrase_not_negated(built):
    # only doc 0 has 'spark shuffle' contiguous; under the old parser
    # this query EXCLUDED every shuffle doc instead of requiring the
    # phrase (near-opposite semantics)
    hits = search_with_phrases(built, 'join "spark -shuffle"', k=10).collect()
    assert {r["doc_id"] for r in hits} == {0}


# ---- batched negatives: search_many parses '-word' natively ----


def test_batch_negative_matches_single_path(built):
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built,
        [("a", "join -rare"), ("b", "join"), ("c", "spark -join")],
        k=10,
    ).collect()
    hits = {}
    for r in rows:
        hits.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    assert set(hits["a"]) == {0, 2}
    assert set(hits["b"]) == {0, 2, 3, 4}
    assert set(hits["c"]) == {1}
    # exclusion, not re-ranking: surviving scores equal the plain ones
    for d, s in hits["a"].items():
        assert s == pytest.approx(hits["b"][d])
    # and identical to the single positional path
    single = {
        r["doc_id"]: r["score"]
        for r in search_with_phrases(built, "join -rare", k=10).collect()
    }
    assert hits["a"] == pytest.approx(single)


def test_batch_negative_dedup_keys_stay_separate(built):
    # same positive term set, different negatives: must not dedup onto
    # one plan entry
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built,
        [("a", "join -rare"), ("b", "join -statistics"), ("c", "join")],
        k=10,
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q["a"] == {0, 2}
    assert by_q["b"] == {0, 3, 4}
    assert by_q["c"] == {0, 2, 3, 4}


def test_batch_negative_composes_with_strategies(built):
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built, [("a", "spark join -rare")], k=10, matching_strategy="all"
    ).collect()
    # spark AND join = {0, 3}; minus docs containing 'rare' ({3, 4})
    assert {r["doc_id"] for r in rows} == {0}
    rows = search_many(
        built, [("a", "join -rare")], k=10, matching_strategy="frequency"
    ).collect()
    assert {r["doc_id"] for r in rows} == {0, 2}


def test_batch_negative_composes_with_filter(built):
    from meilibridge_spark.operators.search import search_many

    filt = built.docs.filter(F.col("lang") == "en").select("doc_id")
    rows = search_many(
        built, [("a", "join -rare")], k=10, filter_docs=filt
    ).collect()
    # join∩en = {0, 4}; minus rare docs ({3, 4}) -> {0}
    assert {r["doc_id"] for r in rows} == {0}


def test_batch_negative_phrase_matches_single_path(built):
    # -"rare gem" bans contiguous-adjacency docs only: doc 3 has
    # 'rare gem' (banned); doc 4 has 'rare the gem' (stop-word slot
    # between them -> NOT banned) — single-path parity
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built, [("a", 'join -"rare gem"'), ("b", "join")], k=10
    ).collect()
    hits = {}
    for r in rows:
        hits.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    assert set(hits["a"]) == {0, 2, 4}
    # exclusion, not re-ranking
    for d, s in hits["a"].items():
        assert s == pytest.approx(hits["b"][d])
    single = {
        r["doc_id"]: r["score"]
        for r in search_with_phrases(
            built, 'join -"rare gem"', k=10
        ).collect()
    }
    assert hits["a"] == pytest.approx(single)


def test_batch_negative_phrase_stopword_slot_widens_gap(built):
    # -"rare the gem": 'the' is a stop word -> steps [(rare,0),(gem,2)]
    # bans doc 4 ('rare the gem join') but NOT doc 3 ('rare gem' at
    # gap 1) — raw-slot offsets, single-path parity
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built, [("a", 'join -"rare the gem"')], k=10
    ).collect()
    assert {r["doc_id"] for r in rows} == {0, 2, 3}
    single = search_with_phrases(
        built, 'join -"rare the gem"', k=10
    ).collect()
    assert {r["doc_id"] for r in single} == {0, 2, 3}


def test_batch_negative_phrase_dedup_keys_stay_separate(built):
    # same positive term set, different negative phrases: no dedup
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built,
        [
            ("a", 'join -"rare gem"'),
            ("b", 'join -"spark shuffle"'),
            ("c", "join"),
        ],
        k=10,
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q["a"] == {0, 2, 4}
    assert by_q["b"] == {2, 3, 4}
    assert by_q["c"] == {0, 2, 3, 4}


def test_batch_negative_phrase_composes(built):
    # phrase bans compose with word bans, filters and strategies in
    # one batch
    from meilibridge_spark.operators.search import search_many

    filt = built.docs.filter(F.col("lang") == "en").select("doc_id")
    rows = search_many(
        built,
        [("a", 'join -"rare gem" -statistics')],
        k=10,
        filter_docs=filt,
    ).collect()
    # join∩en = {0, 4}; -"rare gem" bans {3}; -statistics bans {2} -> {0, 4}
    assert {r["doc_id"] for r in rows} == {0, 4}
    rows = search_many(
        built,
        [("a", 'spark join -"rare gem"')],
        k=10,
        matching_strategy="all",
    ).collect()
    # spark AND join = {0, 3}; minus phrase docs {3} -> {0}
    assert {r["doc_id"] for r in rows} == {0}


def test_batch_negative_phrase_with_proximity_rank(built):
    # phrase bans and the byWord proximity criterion share the same
    # cogrouped positional side — both active in one batch
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built,
        [("a", 'spark join -"rare gem"'), ("b", "spark join")],
        k=10,
        proximity_rank=True,
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q["a"] == by_q["b"] - {3}
    # proximity criterion still ranks: doc 3 ('spark join' adjacent)
    # wins query b; with it banned in query a, doc 0 ('spark shuffle
    # join', gap 2) takes the top slot
    ranks = {
        (r["query_id"], r["doc_id"]): r["rank"] for r in rows
    }
    assert ranks[("b", 3)] == 1 and ranks[("a", 0)] == 1


def test_batch_negative_phrase_needs_positions(spark):
    from meilibridge_spark.operators.search import search_many
    from meilibridge_spark.plans.build import build_index

    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(df, CFG, doc_id_col="doc_id")  # no positions
    with pytest.raises(ValueError, match="positions table"):
        search_many(idx, [("a", 'join -"rare gem"')], k=10)


def test_batch_negative_stays_literal_under_typo(built):
    # positives typo-expand, negatives never do: '-rare' excludes only
    # literal 'rare' docs even with typo=True
    from meilibridge_spark.operators.search import search_many

    rows = search_many(
        built, [("a", "sparkk -join")], k=10, typo=True
    ).collect()
    # 'sparkk' expands to 'spark' ({0, 1, 3}); '-join' excludes the
    # literal join docs ({0, 2, 3, 4}) -> {1}
    assert {r["doc_id"] for r in rows} == {1}


def test_batch_negative_ban_is_corpus_wide_under_search_on(spark):
    """attributesToSearchOn narrows what can MATCH, never what a
    negation excludes: a doc carrying the negated word only in a
    NON-searched attribute is still excluded (single-path parity), and
    a term negated in one query stays attribute-restricted for scoring
    in another query of the same batch."""
    from meilibridge_spark.operators.search import search_many
    from meilibridge_spark.plans.build import build_index

    rows = [
        (0, "spark talk", "plain body"),
        (1, "spark intro", "secret body"),
        (2, "secret spark", "plain body"),
        (3, "other title", "spark secret"),
    ]
    cfg = IndexConfig(
        index_name="neg-attr",
        primary_key=("doc_id",),
        searchable_attributes=("title", "body"),
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
    )
    df = spark.createDataFrame(rows, "doc_id long, title string, body string")
    idx = build_index(df, cfg, doc_id_col="doc_id", with_attributes=True)

    rows_out = search_many(
        idx,
        [("a", "spark -secret"), ("b", "secret")],
        k=10,
        attributes_to_search_on=("title",),
    ).collect()
    by_q = {}
    for r in rows_out:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    # 'spark' must appear in TITLE ({0, 1, 2}); 'secret' anywhere
    # excludes ({1, 2, 3}) -> only doc 0 survives. Before the ban_src
    # snapshot, doc 1 (secret only in body) leaked through.
    assert by_q["a"] == {0}
    # 'secret' as a POSITIVE query stays title-restricted: doc 2 only
    assert by_q["b"] == {2}
