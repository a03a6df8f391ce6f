"""Block-max WAND == exhaustive scoring (lossless pruning, FIXTURES.md §6),
plus BM25 formula golden values (SURVEY.md §5 item 1)."""

import math

import numpy as np
import pytest

from meilibridge_spark.functions.bm25 import bm25_score, idf, impact_upper_bound, tf_norm
from meilibridge_spark.functions.wand import TermPostings, exhaustive_topk, wand_topk


def test_bm25_hand_computed():
    # N=10 docs, df=3, tf=2, dl=8, avgdl=10, k1=1.2, b=0.75
    want_idf = math.log(1 + (10 - 3 + 0.5) / (3 + 0.5))
    assert idf(10, 3) == pytest.approx(want_idf)
    denom = 2 + 1.2 * (1 - 0.75 + 0.75 * 8 / 10)
    want = want_idf * 2 * 2.2 / denom
    got = bm25_score(np.array([2]), np.array([8]), 10, 3, 10.0)
    assert got[0] == pytest.approx(want, rel=1e-12)


def test_impact_bound_dominates():
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 30, 500)
    dls = rng.integers(1, 300, 500)
    for avgdl in (5.0, 50.0, 500.0):
        bound = impact_upper_bound(tfs.max(), dls.min(), avgdl)
        actual = tf_norm(tfs, dls, avgdl)
        assert (actual <= bound + 1e-12).all()


def _random_terms(rng, n_docs, n_terms, block_size=16, avgdl=None):
    """Build random TermPostings sharing a doc universe with consistent dl."""
    dls_univ = rng.integers(1, 120, size=n_docs).astype(np.int64)
    avgdl = avgdl or float(dls_univ.mean())
    terms = []
    for i in range(n_terms):
        df = int(rng.integers(1, n_docs + 1))
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 10, size=df).astype(np.int64)
        dls = dls_univ[docs]
        t_idf = float(idf(n_docs, df))
        terms.append(
            TermPostings.from_arrays(f"t{i}", t_idf, docs, tfs, dls, block_size, avgdl)
        )
    return terms, avgdl


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 5, 37])
def test_wand_equals_exhaustive_random(seed, k):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(20, 400))
    n_terms = int(rng.integers(1, 6))
    terms, avgdl = _random_terms(rng, n_docs, n_terms)
    got = wand_topk(terms, k, avgdl)
    want = exhaustive_topk(terms, k, avgdl)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=0, atol=1e-9
    )


def test_wand_skewed_hot_term():
    # one hot term in every doc + one rare term: pruning must stay exact
    rng = np.random.default_rng(42)
    n_docs = 2000
    dls = rng.integers(5, 100, n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    hot_docs = np.arange(n_docs, dtype=np.int64)
    hot = TermPostings.from_arrays(
        "hot",
        float(idf(n_docs, n_docs)),
        hot_docs,
        rng.integers(1, 5, n_docs).astype(np.int64),
        dls,
        128,
        avgdl,
    )
    rare_docs = np.sort(rng.choice(n_docs, 7, replace=False)).astype(np.int64)
    rare = TermPostings.from_arrays(
        "rare",
        float(idf(n_docs, 7)),
        rare_docs,
        rng.integers(1, 5, 7).astype(np.int64),
        dls[rare_docs],
        128,
        avgdl,
    )
    got = wand_topk([hot, rare], 10, avgdl)
    want = exhaustive_topk([hot, rare], 10, avgdl)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_wand_edge_cases():
    assert wand_topk([], 10, 10.0) == []
    rng = np.random.default_rng(1)
    terms, avgdl = _random_terms(rng, 10, 2)
    assert wand_topk(terms, 0, avgdl) == []
    # k larger than corpus
    got = wand_topk(terms, 1000, avgdl)
    want = exhaustive_topk(terms, 1000, avgdl)
    assert [d for d, _ in got] == [d for d, _ in want]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 5, 37])
def test_dense_equals_exhaustive_random(seed, k):
    from meilibridge_spark.functions.wand import dense_topk

    rng = np.random.default_rng(seed + 100)
    n_docs = int(rng.integers(20, 400))
    n_terms = int(rng.integers(1, 6))
    terms, avgdl = _random_terms(rng, n_docs, n_terms)
    got = dense_topk(terms, k, n_docs, avgdl)
    want = exhaustive_topk(terms, k, avgdl)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-12
    )


def test_dense_empty_and_k0():
    from meilibridge_spark.functions.wand import dense_topk

    rng = np.random.default_rng(1)
    terms, avgdl = _random_terms(rng, 50, 2)
    assert dense_topk([], 5, 50, avgdl) == []
    assert dense_topk(terms, 0, 50, avgdl) == []


def test_dense_sparse_external_ids():
    """External doc_id_col indexes have no density guarantee: ids beyond
    n_docs must not crash (array sized by max id), and results must
    still equal the exhaustive scorer."""
    from meilibridge_spark.functions.wand import dense_topk

    rng = np.random.default_rng(7)
    terms, avgdl = _random_terms(rng, 80, 3)
    for t in terms:
        t.doc_ids = t.doc_ids * 1000 + 17  # sparse, far beyond n_docs=80
    got = dense_topk(terms, 10, 80, avgdl)
    want = exhaustive_topk(terms, 10, avgdl)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-12
    )


def test_dense_rejects_negative_ids():
    from meilibridge_spark.functions.wand import dense_topk

    rng = np.random.default_rng(8)
    terms, avgdl = _random_terms(rng, 50, 2)
    terms[0].doc_ids = terms[0].doc_ids - 10_000
    with pytest.raises(ValueError, match="non-negative"):
        dense_topk(terms, 5, 50, avgdl)


# --- budgeted (anytime) WAND: the searchCutoffMs serving analog -------


def test_budgeted_no_deadline_matches_wand():
    rng = np.random.default_rng(5)
    terms, avgdl = _random_terms(rng, 400, 4)
    from meilibridge_spark.functions.wand import wand_topk_budgeted

    out, degraded = wand_topk_budgeted(terms, 10, avgdl)
    assert degraded is False
    assert out == wand_topk(terms, 10, avgdl)


def test_budgeted_generous_deadline_identical():
    import time

    from meilibridge_spark.functions.wand import wand_topk_budgeted

    rng = np.random.default_rng(6)
    terms, avgdl = _random_terms(rng, 400, 4)
    out, degraded = wand_topk_budgeted(
        terms, 10, avgdl, deadline=time.monotonic() + 60.0
    )
    assert degraded is False
    assert out == wand_topk(terms, 10, avgdl)


def test_budgeted_expired_deadline_degrades_empty():
    import time

    from meilibridge_spark.functions.wand import wand_topk_budgeted

    rng = np.random.default_rng(7)
    terms, avgdl = _random_terms(rng, 400, 4)
    out, degraded = wand_topk_budgeted(
        terms, 10, avgdl, deadline=time.monotonic() - 1.0
    )
    # polled before the first pivot: nothing visited, nothing returned
    assert degraded is True and out == []


def test_budgeted_partial_scores_are_exact(monkeypatch):
    """A mid-traversal deadline returns fully-scored docs only: every
    returned (doc, score) carries the doc's EXACT total score (the
    anytime contract — a prefix of the doc-id space, never a
    partially-accumulated sum)."""
    import time as _time

    from meilibridge_spark.functions.wand import wand_topk_budgeted

    rng = np.random.default_rng(8)
    terms, avgdl = _random_terms(rng, 2000, 5, block_size=8)
    full = dict(exhaustive_topk(terms, 2000, avgdl))

    # fake clock: deadline fires at the SECOND 64-iteration poll
    calls = {"n": 0}

    def fake_monotonic():
        calls["n"] += 1
        return 0.0 if calls["n"] <= 1 else 99.0

    monkeypatch.setattr(_time, "monotonic", fake_monotonic)
    out, degraded = wand_topk_budgeted(terms, 10, avgdl, deadline=50.0)
    assert degraded is True
    assert 0 < len(out) <= 10  # 64 pivots visited >= 1 scored doc
    for d, s in out:
        assert s == pytest.approx(full[d], abs=1e-12)
