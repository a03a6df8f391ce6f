"""Q16 embedders -> hybrid (keyword + semantic) search: fusion
semantics on a hand-checkable corpus, the semanticRatio endpoints
(0 == pure BM25 rank, 1 == pure cosine rank), list-fusion zeroing for
out-of-pool docs, missing/zero-norm embeddings, and argument
validation. Reference surface: config/type.go:67,90 (embedders map),
README.md AI-powered-search section."""

import math

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    IndexConfig,
)
from meilibridge_spark.operators.hybrid import search_hybrid, search_hybrid_many
from meilibridge_spark.operators.search import search
from meilibridge_spark.plans.build import build_index

ROWS = [
    (0, "spark join planning and shuffle"),
    (1, "spark spark join join strategies"),
    (2, "storage formats for wide tables"),
    (3, "metrics and observability"),
    (4, "join order statistics"),
]
# 2-d embeddings: doc 2 is nearest to the query vector (1, 0) despite
# matching no keyword; doc 3 has a zero-norm vector; doc 4 has none.
EMB = [
    (0, [0.0, 1.0]),
    (1, [0.5, 0.5]),
    (2, [1.0, 0.05]),
    (3, [0.0, 0.0]),
]
QV = [1.0, 0.0]

CFG = IndexConfig(
    index_name="hybrid-test",
    primary_key=("doc_id",),
    searchable_attributes=("text",),
    analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
)


@pytest.fixture(scope="module")
def built(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    idx = build_index(df, CFG, doc_id_col="doc_id")
    idx.postings = idx.postings.persist()
    idx.postings.count()
    emb = spark.createDataFrame(
        EMB, "vec_id long, embedding array<double>"
    ).persist()
    return idx, emb


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    return num / den


def test_fusion_values(built):
    idx, emb = built
    rows = {
        r["doc_id"]: r
        for r in search_hybrid(
            idx, emb, "spark join", QV, k=5, semantic_ratio=0.5, pool=5
        ).collect()
    }
    kw_pool = search(idx, "spark join", k=5).collect()
    kw_max = max(r["score"] for r in kw_pool)
    kw_raw = {r["doc_id"]: r["score"] for r in kw_pool}
    for d, r in rows.items():
        want_kw = kw_raw.get(d, 0.0) / kw_max if d in kw_raw else 0.0
        want_sem = 0.0
        for vid, v in EMB:
            if vid == d and any(v):
                want_sem = (1.0 + _cos(QV, v)) / 2.0
        assert r["kw"] == pytest.approx(want_kw, abs=1e-9), d
        assert r["sem"] == pytest.approx(want_sem, abs=1e-9), d
        assert r["hybrid"] == pytest.approx(
            0.5 * want_kw + 0.5 * want_sem, abs=1e-9
        ), d
    # semantic-only doc 2 surfaces with kw == 0
    assert rows[2]["kw"] == 0.0 and rows[2]["sem"] > 0.9
    # zero-norm doc 3 and embedding-less doc 4: sem == 0 (they can only
    # appear through the keyword pool)
    for d in (3, 4):
        if d in rows:
            assert rows[d]["sem"] == 0.0


def test_ratio_endpoints(built):
    idx, emb = built
    kw_order = [r["doc_id"] for r in search(idx, "spark join", k=3).collect()]
    got0 = [
        r["doc_id"]
        for r in search_hybrid(
            idx, emb, "spark join", QV, k=3, semantic_ratio=0.0, pool=5
        ).collect()
    ]
    assert got0 == kw_order
    got1 = [
        r["doc_id"]
        for r in search_hybrid(
            idx, emb, "spark join", QV, k=3, semantic_ratio=1.0, pool=5
        ).collect()
    ]
    sem_rank = sorted(
        ((vid, (1 + _cos(QV, v)) / 2) for vid, v in EMB if any(v)),
        key=lambda t: (-t[1], t[0]),
    )
    assert got1 == [vid for vid, _ in sem_rank[:3]]


def test_batch_matches_single(built):
    idx, emb = built
    queries = [
        ("q0", "spark join"),
        ("q1", "storage metrics"),
        ("q2", "zzzabsent"),
    ]
    vecs = {"q0": QV, "q1": [0.0, 1.0], "q2": [0.7, 0.7]}
    batch = search_hybrid_many(
        idx, emb, queries, vecs, k=4, semantic_ratio=0.3, pool=5
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text in queries:
        single = search_hybrid(
            idx, emb, text, vecs[qid], k=4, semantic_ratio=0.3, pool=5
        ).collect()
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], qid
        for g, s in zip(got, single):
            assert g["hybrid"] == pytest.approx(s["hybrid"], abs=1e-12), qid


def test_batch_ivf_full_probe_matches_exact(built):
    # probing every IVF list scores every embedding -> rank-identical
    # to the exact semantic pass
    idx, emb = built
    queries = [("q0", "spark join"), ("q1", "zzzabsent")]
    vecs = {"q0": QV, "q1": [0.6, 0.8]}
    kw = dict(k=3, semantic_ratio=0.5, pool=5)
    exact = search_hybrid_many(idx, emb, queries, vecs, **kw).collect()
    ivf = search_hybrid_many(
        idx, emb, queries, vecs, semantic="ivf",
        n_centroids=3, n_probe=3, **kw
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    exact, ivf = sorted(exact, key=key), sorted(ivf, key=key)
    assert [(r["query_id"], r["doc_id"]) for r in ivf] == [
        (r["query_id"], r["doc_id"]) for r in exact
    ]
    for g, s in zip(ivf, exact):
        assert g["hybrid"] == pytest.approx(s["hybrid"], abs=1e-12)


def test_batch_ivf_single_probe(built):
    # single-probe ANN: still k hits per query; every sem it reports
    # is a true cosine (subset of the exact candidates)
    idx, emb = built
    queries = [("q0", "spark join")]
    vecs = {"q0": QV}
    rows = search_hybrid_many(
        idx, emb, queries, vecs, k=3, pool=5,
        semantic="ivf", n_centroids=3, n_probe=1,
    ).collect()
    assert len(rows) == 3
    exact_sem = {
        vid: (1 + _cos(QV, v)) / 2 for vid, v in EMB if any(v)
    }
    for r in rows:
        if r["sem"] > 0:
            assert r["sem"] == pytest.approx(exact_sem[r["doc_id"]], abs=1e-9)


def test_batch_binary_full_pool_matches_exact(built):
    # binaryQuantized pool covering the whole corpus: the bit scan
    # admits every vector and the exact-cosine rerank makes fusion
    # identical to semantic='exact'
    idx, emb = built
    queries = [("q0", "spark join"), ("q1", "zzzabsent")]
    vecs = {"q0": QV, "q1": [0.6, 0.8]}
    kw = dict(k=3, semantic_ratio=0.5, pool=5)
    exact = search_hybrid_many(idx, emb, queries, vecs, **kw).collect()
    binq = search_hybrid_many(
        idx, emb, queries, vecs, semantic="binary", **kw
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    exact, binq = sorted(exact, key=key), sorted(binq, key=key)
    assert [(r["query_id"], r["doc_id"]) for r in binq] == [
        (r["query_id"], r["doc_id"]) for r in exact
    ]
    for g, s in zip(binq, exact):
        assert g["hybrid"] == pytest.approx(s["hybrid"], abs=1e-12)


def test_batch_binary_pool_sem_is_true_cosine(built):
    # every sem the binary path reports is a true cosine of a bit-scan
    # survivor; out-of-pool candidates keep sem = 0 (un-scanned =
    # unseen, same contract as ivf)
    idx, emb = built
    queries = [("q0", "spark join")]
    rows = search_hybrid_many(
        idx, emb, queries, {"q0": QV}, k=3, pool=3, semantic="binary"
    ).collect()
    assert len(rows) == 3
    exact_sem = {
        vid: (1 + _cos(QV, v)) / 2 for vid, v in EMB if any(v)
    }
    for r in rows:
        if r["sem"] > 0:
            assert r["sem"] == pytest.approx(exact_sem[r["doc_id"]], abs=1e-9)


def test_batch_binary_mixed_dim_queries_raise(built):
    idx, emb = built
    with pytest.raises(ValueError, match="equal-dim"):
        search_hybrid_many(
            idx, emb,
            [("a", "spark"), ("b", "join")],
            {"a": [1.0, 0.0], "b": [1.0, 0.0, 0.0]},
            k=2, pool=5, semantic="binary",
        )


def test_batch_validation(built):
    idx, emb = built
    with pytest.raises(ValueError, match="missing ids"):
        search_hybrid_many(idx, emb, [("a", "spark")], {}, k=2, pool=5)


def test_validation(built):
    idx, emb = built
    with pytest.raises(ValueError, match="semantic_ratio"):
        search_hybrid(idx, emb, "spark", QV, semantic_ratio=1.5)
    with pytest.raises(ValueError, match="pool"):
        search_hybrid(idx, emb, "spark", QV, k=20, pool=5)


def test_auto_without_layout_is_exact(built):
    """semantic='auto' (the new default) with no stored layout =="""
    idx, emb = built
    queries = [("q0", "spark join"), ("q1", "storage")]
    vecs = {"q0": QV, "q1": [0.0, 1.0]}
    auto = search_hybrid_many(idx, emb, queries, vecs, k=4, pool=4).collect()
    exact = search_hybrid_many(
        idx, emb, queries, vecs, k=4, pool=4, semantic="exact"
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(
        [(r["query_id"], r["rank"], r["doc_id"]) for r in auto]
    ) == sorted([(r["query_id"], r["rank"], r["doc_id"]) for r in exact])


def test_stored_vector_layout_serves_auto(spark, built, tmp_index_dir):
    """Round-4: the trained IVF quantizer + assignment persist beside
    the index (save_vector_index) and a reloaded snapshot serves
    hybrid AND similar-docs through them automatically — with
    n_probe == n_centroids the stored path is rank-identical to exact
    (the oracle contract)."""
    from meilibridge_spark.operators.similarity import (
        build_vector_index,
        similar_documents,
    )
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import (
        load_snapshot,
        save_vector_index,
    )

    idx, emb = built
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    build_and_save(spark, df, CFG, tmp_index_dir, doc_id_col="doc_id")
    vec = build_vector_index(emb, n_centroids=2, n_probe=2, train_iters=2)
    save_vector_index(vec, tmp_index_dir)
    loaded = load_snapshot(spark, tmp_index_dir, CFG)
    assert loaded.vectors is not None
    assert loaded.vectors.n_centroids == 2 and loaded.vectors.n_probe == 2
    queries = [("q0", "spark join"), ("q1", "storage")]
    vecs = {"q0": QV, "q1": [0.0, 1.0]}
    stored = search_hybrid_many(loaded, emb, queries, vecs, k=4, pool=4)
    exact = search_hybrid_many(
        loaded, emb, queries, vecs, k=4, pool=4, semantic="exact"
    )
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"]) for r in stored.collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"]) for r in exact.collect()
    )
    assert got == want and got
    # similar-docs auto path off the same stored layout
    sim_auto = similar_documents(
        emb, [0], k=3, vectors=loaded.vectors
    ).collect()
    sim_exact = similar_documents(emb, [0], k=3, method="exact").collect()
    assert [(r["vec_id"], r["rank"]) for r in sim_auto] == [
        (r["vec_id"], r["rank"]) for r in sim_exact
    ]
    # monkeypatch-free zero-retraining evidence: the stored layout's
    # assignment is read from parquet, not derived from emb
    plan = loaded.vectors.assigned._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower()
    # the probed-list literal filter prunes the directory-partitioned
    # stored layout: the scan carries PartitionFilters [centroid_id IN]
    import re

    splan = stored._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*centroid_id#\d+ IN \(", splan), (
        splan[splan.find("PartitionFilters"):][:300]
    )
    # similar-docs over the stored layout prunes the same way (the
    # epsilon-superset literal filter ahead of ivf_topk's probe join)
    simplan = (
        similar_documents(emb, [0], k=3, vectors=loaded.vectors)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert re.search(
        r"PartitionFilters: \[.*centroid_id#\d+ IN \(", simplan
    )


def test_ranking_score_fusion_mode(built):
    """score_mode='ranking_score': the keyword side of the blend is the
    hit's ABSOLUTE words-rule ranking score (matched/n_query_terms),
    matching Meilisearch's _rankingScore fusion; the semantic side is
    already (1+cos)/2. Values hand-checked; default mode unchanged."""
    idx, emb = built
    queries = [("q0", "spark join")]
    vecs = {"q0": QV}
    rows = {
        r["doc_id"]: r
        for r in search_hybrid_many(
            idx, emb, queries, vecs, k=5, pool=5,
            score_mode="ranking_score",
        ).collect()
    }
    kw_pool = {
        r["doc_id"]: r["matched_terms"]
        for r in search(idx, "spark join", k=5).collect()
    }
    for d, r in rows.items():
        want_kw = min(kw_pool.get(d, 0) / 2.0, 1.0)  # 2 query terms
        assert r["kw"] == pytest.approx(want_kw, abs=1e-9), d
        want_sem = 0.0
        for vid, v in EMB:
            if vid == d and any(v):
                want_sem = (1.0 + _cos(QV, v)) / 2.0
        assert r["sem"] == pytest.approx(want_sem, abs=1e-9), d
        assert r["hybrid"] == pytest.approx(
            0.5 * want_kw + 0.5 * want_sem, abs=1e-9
        ), d
    # both-words doc 0/1/3 get kw == 1.0 (absolute, not pool-relative)
    assert rows[0]["kw"] == pytest.approx(1.0)
    # mode validation
    with pytest.raises(ValueError, match="score_mode"):
        search_hybrid_many(
            idx, emb, queries, vecs, k=5, pool=5, score_mode="rrf"
        )


def test_with_vectors_retrieve(spark, built):
    """retrieveVectors analog: hits carry their stored embedding,
    docs without one get NULL (_vectors: {}); a stored VectorIndex is
    accepted in place of the raw embeddings frame."""
    from meilibridge_spark.operators.relational import with_vectors
    from meilibridge_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )
    from meilibridge_spark.sources.tables import VectorIndex

    idx, emb = built
    hits = search(idx, "spark join", 5)
    out = with_vectors(hits, emb, hit_bound=5)
    got = {r["doc_id"]: r["_vectors"] for r in out.collect()}
    assert got[0] == [0.0, 1.0] and got[1] == [0.5, 0.5]
    assert got[4] is None  # doc 4 has no embedding
    assert out.count() == hits.count()  # left join never drops hits
    # VectorIndex form resolves id/vec cols from the layout
    cents = ivf_centroids(emb, 2, "vec_id", "embedding")
    assigned = emb.join(ivf_assign(emb, cents, "vec_id", "embedding"), "vec_id")
    vec = VectorIndex(
        centroids=cents, assigned=assigned, n_centroids=2, n_probe=2
    )
    got2 = {
        r["doc_id"]: r["_vectors"]
        for r in with_vectors(hits, vec, hit_bound=5).collect()
    }
    assert got2 == got
