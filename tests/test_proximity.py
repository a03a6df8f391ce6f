"""Q11 'proximity' ranking criterion + v1.6 proximityPrecision
(operators/positions.proximity_costs, search(proximity_rank=True)).

Covers: per-pair cost goldens (in-order distance, reversed +1 penalty,
PROX_MAX clamp, missing-term worst), multi-pair summation, stop-word
slots widening distances, rule-order composition (words outranks
proximity, proximity outranks BM25), byAttribute precision over the
attrs bitmask blocks, the single-word no-op, and the missing-table
errors.
"""

import pytest

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    ConfigError,
    IndexConfig,
)
from meilibridge_spark.operators.positions import (
    PROX_MAX,
    build_positions,
    proximity_costs,
    proximity_pairs,
)
from meilibridge_spark.operators.search import search
from meilibridge_spark.plans.build import build_index

DOCS = [
    (0, "alpha beta gamma"),  # (alpha,beta) adjacent in order -> 1
    (1, "beta alpha end"),  # reversed adjacent -> 2
    (2, "alpha mid mid beta"),  # in-order distance 3
    (3, "alpha lonely words"),  # beta missing -> PROX_MAX
    (4, "alpha f1 f2 f3 f4 f5 f6 f7 f8 f9 beta"),  # distance 10 -> clamp
    (5, "beta gamma tail"),  # alpha missing
    (6, "unrelated filler text"),
]


def _cfg(**kw):
    return IndexConfig(
        index_name="prox",
        primary_key=("doc_id",),
        searchable_attributes=("text",),
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN, **kw),
    )


@pytest.fixture(scope="module")
def built(spark):
    cfg = _cfg()
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_index(df, cfg, doc_id_col="doc_id")
    idx.positions = build_positions(idx.docs, cfg, text_col="text").persist()
    return idx


def _costs(idx, query, **kw):
    df = proximity_costs(idx, query, **kw)
    return {r["doc_id"]: r["prox_cost"] for r in df.collect()}


def test_pair_cost_goldens(built):
    got = _costs(built, "alpha beta")
    assert got[0] == 1  # adjacent, query order
    assert got[1] == 2  # adjacent but reversed: distance 1 + 1 penalty
    assert got[2] == 3  # two fillers between
    assert got[3] == PROX_MAX  # beta absent
    assert got[4] == PROX_MAX  # distance 10, clamped
    assert got[5] == PROX_MAX  # alpha absent
    assert 6 not in got  # no pair term at all -> no row


def test_multi_pair_sum(built):
    got = _costs(built, "alpha beta gamma")
    # doc 0: (alpha,beta)=1 + (beta,gamma)=1
    assert got[0] == 2
    # doc 5: alpha missing (8) + (beta,gamma)=1
    assert got[5] == PROX_MAX + 1
    # doc 3: alpha only -> both pairs worst
    assert got[3] == 2 * PROX_MAX


def test_repeated_occurrences_take_min(spark):
    cfg = _cfg()
    df = spark.createDataFrame(
        [(0, "alpha far far far beta alpha beta")],
        "doc_id long, text string",
    )
    idx = build_index(df, cfg, doc_id_col="doc_id")
    idx.positions = build_positions(idx.docs, cfg, text_col="text")
    assert _costs(idx, "alpha beta")[0] == 1  # the late adjacent pair wins


def test_stop_word_slot_widens_distance(spark):
    cfg = _cfg(stop_words=("the",))
    df = spark.createDataFrame(
        [(0, "alpha the beta"), (1, "alpha beta now")],
        "doc_id long, text string",
    )
    idx = build_index(df, cfg, doc_id_col="doc_id")
    idx.positions = build_positions(idx.docs, cfg, text_col="text")
    got = _costs(idx, "alpha beta")
    assert got[0] == 2  # 'the' emits no posting but holds its slot
    assert got[1] == 1


def test_search_rule_order(built):
    # words (matched_terms desc) outranks proximity; proximity outranks
    # BM25 score; prox_cost is an output column
    hits = search(
        built, "alpha beta", 10, words_rank=True, proximity_rank=True
    ).collect()
    assert [r["doc_id"] for r in hits[:4]] == [0, 1, 2, 4]
    by_id = {r["doc_id"]: r for r in hits}
    assert by_id[0]["prox_cost"] == 1
    two_term = [r for r in hits if r["matched_terms"] == 2]
    one_term = [r for r in hits if r["matched_terms"] == 1]
    assert all(
        h.prox_cost <= l.prox_cost
        for h, l in zip(two_term, two_term[1:])
    )
    # every 2-term doc ranks above every 1-term doc (words first)
    assert hits.index(two_term[-1]) < hits.index(one_term[0])


def test_single_word_noop(built):
    hits = search(built, "alpha", 10, proximity_rank=True)
    rows = hits.collect()
    assert rows and all(r["prox_cost"] == 0 for r in rows)


def test_missing_positions_table_raises(spark):
    cfg = _cfg()
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_index(df, cfg, doc_id_col="doc_id")
    with pytest.raises(ValueError, match="positions"):
        search(idx, "alpha beta", 5, proximity_rank=True)


def test_by_attribute_precision(spark):
    cfg = IndexConfig(
        index_name="proxattr",
        primary_key=("doc_id",),
        searchable_attributes=("t1", "t2"),
        proximity_precision="byAttribute",
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
    )
    df = spark.createDataFrame(
        [
            (0, "alpha beta here", "filler"),  # same attribute -> 1
            (1, "alpha only", "beta only"),  # split attributes -> worst
            (2, "alpha solo", "nothing"),  # beta absent -> worst
        ],
        "doc_id long, t1 string, t2 string",
    )
    idx = build_index(df, cfg, doc_id_col="doc_id", with_attributes=True)
    got = _costs(idx, "alpha beta")
    assert got[0] == 1
    assert got[1] == PROX_MAX
    assert got[2] == PROX_MAX
    # byWord on the same index (explicit override) needs positions
    with pytest.raises(ValueError, match="positions"):
        proximity_costs(idx, "alpha beta", precision="byWord")
    # byAttribute without attrs blocks
    bare = build_index(df, cfg, doc_id_col="doc_id")
    with pytest.raises(ValueError, match="attributes"):
        proximity_costs(bare, "alpha beta")


def test_by_attribute_search_end_to_end(spark):
    cfg = IndexConfig(
        index_name="proxattr2",
        primary_key=("doc_id",),
        searchable_attributes=("t1", "t2"),
        proximity_precision="byAttribute",
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
    )
    df = spark.createDataFrame(
        [
            (0, "alpha beta", "x"),
            (1, "alpha", "beta"),
        ],
        "doc_id long, t1 string, t2 string",
    )
    idx = build_index(df, cfg, doc_id_col="doc_id", with_attributes=True)
    hits = search(idx, "alpha beta", 5, proximity_rank=True).collect()
    assert [r["doc_id"] for r in hits] == [0, 1]
    assert hits[0]["prox_cost"] == 1 and hits[1]["prox_cost"] == PROX_MAX


def test_proximity_pairs_shapes(built):
    cfg = built.cfg
    assert proximity_pairs("alpha beta gamma", cfg) == [
        ("alpha", "beta"),
        ("beta", "gamma"),
    ]
    assert proximity_pairs("alpha", cfg) == []
    assert proximity_pairs("alpha alpha", cfg) == []  # adjacent dup dropped
    assert proximity_pairs("", cfg) == []


def test_pos_cap_still_finds_close_pair(built):
    # the scale knob: capped arrays may only RAISE the cost; on these
    # tiny docs a generous cap changes nothing
    got = _costs(built, "alpha beta", pos_cap=16)
    assert got[0] == 1 and got[2] == 3


def test_proximity_ranking_subscore(built):
    from meilibridge_spark.operators.relational import ranking_scores

    hits = search(built, "alpha beta", 10, proximity_rank=True)
    out = ranking_scores(
        hits, n_query_terms=2, n_prox_pairs=1, score_details=True
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["_score_proximity"] == pytest.approx((8 - 1) / 8)
    assert by_id[3]["_score_proximity"] == 0.0
    d = by_id[0]["_ranking_score_details"].asDict()
    assert d["proximity"]["proximityCost"] == 1
    assert d["proximity"]["order"] == 1  # after words, no typo col here
    # without n_prox_pairs the subscore stays out (backward compat)
    plain = ranking_scores(hits, n_query_terms=2).columns
    assert "_score_proximity" not in plain


def _single_ranks(idx, q, k=10, **kw):
    hits = search(idx, q, k, words_rank=True, proximity_rank=True, **kw)
    return [(r["doc_id"], r["prox_cost"]) for r in hits.collect()]


def _batch_ranks(idx, queries, k=10, **kw):
    from meilibridge_spark.operators.search import search_many

    res = search_many(
        idx, queries, k=k, words_rank=True, proximity_rank=True, **kw
    ).collect()
    out = {qid: [] for qid, _ in queries}
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        out[r["query_id"]].append((r["doc_id"], r["prox_cost"]))
    return out


BATCH_QUERIES = [
    ("q0", "alpha beta"),
    ("q1", "beta alpha"),  # same terms, swapped order: different pairs
    ("q2", "alpha"),  # no pairs -> prox_cost 0
    ("q3", "alpha beta gamma"),
]


def test_batch_matches_single_path(built):
    got = _batch_ranks(built, BATCH_QUERIES)
    for qid, q in BATCH_QUERIES:
        assert got[qid] == _single_ranks(built, q), (qid, q)
    assert all(c == 0 for _, c in got["q2"])


def test_batch_prox_with_filter(built):
    filt = built.docs.filter("doc_id < 5").select("doc_id")
    got = _batch_ranks(built, BATCH_QUERIES[:2], filter_docs=filt)
    for qid, q in BATCH_QUERIES[:2]:
        assert got[qid] == _single_ranks(built, q, filter_docs=filt)


def test_batch_prox_with_matching_all(built):
    got = _batch_ranks(
        built, BATCH_QUERIES[:2], matching_strategy="all"
    )
    for qid, q in BATCH_QUERIES[:2]:
        assert got[qid] == _single_ranks(
            built, q, matching_strategy="all"
        )
        # 'all' really constrains: only docs with both words remain
        assert got[qid] and all(c < 2 * PROX_MAX for _, c in got[qid])


def test_batch_prox_serving_mode(built):
    from meilibridge_spark.operators.search import prepare_serving

    prepare_serving(built)
    try:
        got = _batch_ranks(built, BATCH_QUERIES)
        for qid, q in BATCH_QUERIES:
            assert got[qid] == _single_ranks(built, q)
    finally:
        built.serving.unpersist()
        built.serving = None


def test_batch_prox_validation(built, spark):
    import dataclasses

    from meilibridge_spark.operators.search import search_many

    bare = dataclasses.replace(built, positions=None)
    with pytest.raises(ValueError, match="positions"):
        search_many(bare, BATCH_QUERIES[:1], k=5, proximity_rank=True)
    byattr = dataclasses.replace(
        bare,
        cfg=dataclasses.replace(bare.cfg, proximity_precision="byAttribute"),
    )
    with pytest.raises(ValueError, match="attributes"):
        search_many(byattr, BATCH_QUERIES[:1], k=5, proximity_rank=True)


@pytest.fixture(scope="module")
def built_attr(spark):
    """Two-attribute corpus for byAttribute proximity: batch must match
    the single path, with and without filters."""
    import dataclasses

    cfg = dataclasses.replace(
        IndexConfig(
            index_name="proxattr_batch",
            primary_key=("doc_id",),
            searchable_attributes=("t1", "t2"),
            analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
        ),
        proximity_precision="byAttribute",
    )
    rows = [
        (0, "alpha beta here", "filler words"),  # same attr -> 1
        (1, "alpha only text", "beta only text"),  # split attrs -> 8
        (2, "alpha solo", "nothing special"),  # beta absent -> 8
        (3, "filler", "beta alpha together"),  # same attr (t2) -> 1
        (4, "gamma beta", "alpha gamma"),  # split -> 8
    ]
    df = spark.createDataFrame(rows, "doc_id long, t1 string, t2 string")
    idx = build_index(df, cfg, doc_id_col="doc_id", with_attributes=True)
    idx.postings = idx.postings.persist()
    return idx


def test_batch_prox_by_attribute_matches_single(built_attr):
    from meilibridge_spark.operators.search import search_many

    qs = [("q0", "alpha beta"), ("q1", "alpha gamma"), ("q2", "alpha")]
    got = _batch_ranks(built_attr, qs)
    for qid, q in qs:
        assert got[qid] == _single_ranks(built_attr, q), (qid, q)
    by0 = dict(got["q0"])
    assert by0[0] == 1 and by0[3] == 1 and by0[1] == PROX_MAX
    # with a filter (cogroup path, attr blocks still provide the cost)
    filt = built_attr.docs.filter("doc_id < 4").select("doc_id")
    gotf = _batch_ranks(built_attr, qs[:1], filter_docs=filt)
    assert gotf["q0"] == _single_ranks(
        built_attr, "alpha beta", filter_docs=filt
    )
    # no positional side in the plan: search_many never touched a
    # positions table (the index has none)
    assert built_attr.positions is None
    res = search_many(
        built_attr, qs[:1], k=10, proximity_rank=True
    )
    assert "prox_cost" in res.columns


def test_prox_max_constants_agree():
    from meilibridge_spark.operators.search import PROX_MAX_BATCH

    assert PROX_MAX_BATCH == PROX_MAX


def test_pair_costs_dense_kernel():
    import numpy as np

    from meilibridge_spark.operators.search import _pair_costs_dense

    def brute(da, pa, db, pb, n):
        cost = np.full(n, 8, np.int32)
        for d in range(n):
            best = 8
            for x, p in zip(da, pa):
                if x != d:
                    continue
                for y, q in zip(db, pb):
                    if y != d:
                        continue
                    c = q - p if q > p else p - q + 1
                    best = min(best, c, 8)
            cost[d] = min(best, 8)
        return cost

    rng = np.random.RandomState(7)
    for trial in range(30):
        n = 6
        na, nb = rng.randint(0, 12, size=2)
        da = np.sort(rng.randint(0, n, size=na)).astype(np.int64)
        db = np.sort(rng.randint(0, n, size=nb)).astype(np.int64)
        # unique ascending positions per doc (the positions-table shape)
        def mkpos(docs):
            out = np.empty(docs.size, dtype=np.int64)
            for d in np.unique(docs):
                m = docs == d
                out[m] = np.sort(
                    rng.choice(np.arange(40), size=m.sum(), replace=False)
                )
            return out

        pa, pb = mkpos(da), mkpos(db)
        got = _pair_costs_dense(da, pa, db, pb, n)
        want = brute(da, pa, db, pb, n)
        assert np.array_equal(got, want), (trial, da, pa, db, pb, got, want)


def test_precision_setting_validated():
    with pytest.raises(ConfigError, match="proximity_precision"):
        IndexConfig(
            index_name="bad",
            primary_key=("doc_id",),
            proximity_precision="nope",
        ).validate()


def test_precision_setting_round_trips():
    cfg = IndexConfig(
        index_name="rt",
        primary_key=("doc_id",),
        proximity_precision="byAttribute",
    )
    back = IndexConfig.from_json_dict(cfg.to_json_dict())
    assert back.proximity_precision == "byAttribute"
