"""Q12 typo tolerance sub-knobs (reference config/type.go:70-80):
min_word_size_for_typos, disable_on_words, disable_on_attributes, and
typo expansion through the batch scatter-gather path."""

import numpy as np
import pytest

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    IndexConfig,
    TypoToleranceConfig,
)
from meilibridge_spark.functions.bm25 import score_round
from meilibridge_spark.operators.search import (
    search_many,
    search_typo,
    typo_expand_terms,
)
from meilibridge_spark.plans.build import build_index

DOCS = [
    # 'zebra' lives ONLY in the tag attribute; 'receive' only in text
    (0, "please receive the payment today", "invoice"),
    (1, "wire transfer arrived yesterday", "zebra"),
    (2, "receive receipts and archive them", "invoice"),
    (3, "random filler words here", "zebra"),
    (4, "windows window widths", "panel"),
]

CFG = IndexConfig(
    index_name="typo",
    primary_key=("doc_id",),
    searchable_attributes=("text", "tag"),
    analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
)


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, tag string")
    built = build_index(df, CFG, doc_id_col="doc_id")
    built.postings = built.postings.persist()
    built.postings.count()
    return built


def test_expansion_basic(idx):
    # 'receve' (len 6, one deletion away) -> 'receive'; note 'recieve'
    # is distance 2 (transposition) and does NOT expand at len 7 < 9
    assert typo_expand_terms(idx, ["receve"]) == ["receve", "receive"]
    assert typo_expand_terms(idx, ["recieve"]) == ["recieve"]
    # below one_typo length: no expansion
    assert typo_expand_terms(idx, ["wird"]) == ["wird"]


def test_min_word_size_knobs(idx):
    strict = TypoToleranceConfig.make(one_typo=8)
    assert typo_expand_terms(idx, ["receve"], strict) == ["receve"]
    # two_typos threshold: 'recaivee' (len 8) vs 'receive' = 2 edits
    assert "receive" not in typo_expand_terms(idx, ["recaivee"])
    loose = TypoToleranceConfig.make(two_typos=8)
    assert "receive" in typo_expand_terms(idx, ["recaivee"], loose)


def test_disabled_entirely(idx):
    off = TypoToleranceConfig.make(enabled=False)
    assert typo_expand_terms(idx, ["receve"], off) == ["receve"]


def test_disable_on_words(idx):
    tc = TypoToleranceConfig.make(disable_on_words=["Receve"])  # case-folded
    assert typo_expand_terms(idx, ["receve", "windoq"], tc) == [
        "receve",
        "windoq",
        "window",
    ]


def test_disable_on_attributes(idx):
    # 'zebrb' would expand to 'zebra', but zebra only occurs in 'tag'
    assert typo_expand_terms(idx, ["zebrb"]) == ["zebrb", "zebra"]
    tc = TypoToleranceConfig.make(disable_on_attributes=["tag"])
    assert typo_expand_terms(idx, ["zebrb"], tc) == ["zebrb"]
    # text-only vocabulary still expands under the restriction
    assert typo_expand_terms(idx, ["receve"], tc) == ["receve", "receive"]
    # disabling every searchable attribute kills all expansion
    tc_all = TypoToleranceConfig.make(disable_on_attributes=["tag", "text"])
    assert typo_expand_terms(idx, ["receve"], tc_all) == ["receve"]


def test_search_typo_hits(idx):
    hits = {r["doc_id"] for r in search_typo(idx, "receve", 10).collect()}
    assert hits == {0, 2}
    tc = TypoToleranceConfig.make(disable_on_words=["receve"])
    assert search_typo(idx, "receve", 10, typo_cfg=tc).count() == 0


def test_search_many_typo_matches_single(idx):
    queries = [
        ("q0", "receve payment"),
        ("q1", "zebrb"),
        ("q2", "windoq widths"),
        ("q3", "nothing relevant"),
    ]
    res = search_many(idx, queries, k=10, typo=True).collect()
    by_q: dict = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid, text in queries:
        single = [
            (r["doc_id"], r["score"])
            for r in search_typo(idx, text, 10).collect()
        ]
        many = [(d, s) for _, d, s in sorted(by_q.get(qid, []))]
        assert [d for d, _ in many] == [d for d, _ in single], f"{qid}: {text!r}"
        np.testing.assert_allclose(
            score_round([s for _, s in many]),
            score_round([s for _, s in single]),
            rtol=0,
            atol=1e-9,
        )


def test_edit_distance_matches_jvm_semantics():
    from meilibridge_spark.operators.search import _edit_distance

    cases = [
        ("kitten", "sitting", 3),
        ("abc", "abc", 0),
        ("abc", "", 3),
        ("spakr", "spark", 2),  # transposition costs 2 in Levenshtein
        ("window", "windows", 1),
    ]
    for a, b, d in cases:
        assert _edit_distance(a, b) == d
        assert _edit_distance(b, a) == d


def test_typo_rank_exact_first(idx):
    """'typo' ranking criterion: docs matching an original query term
    rank above docs reached only through expansions."""
    # 'windoq' expands to 'window'; 'transfer' is exact. Doc 1 matches
    # the exact term, doc 4 only the expansion.
    hits = search_typo(idx, "transfer windoq", 10, typo_rank=True).collect()
    ranks = {r["doc_id"]: i for i, r in enumerate(hits)}
    exact = {r["doc_id"]: r["matched_exact"] for r in hits}
    assert exact[1] == 1 and exact[4] == 0
    assert ranks[1] < ranks[4]
    mes = [r["matched_exact"] for r in hits]
    assert mes == sorted(mes, reverse=True)


def test_deletion_index_matches_levenshtein_scan(idx):
    """The SymSpell deletion-neighborhood path must produce the exact
    same expansion map as the full-dictionary levenshtein scan, and its
    candidate lookup plan must be a key-pruned filter — no levenshtein
    over the terms table."""
    from pyspark.sql import functions as F

    from meilibridge_spark.operators.search import (
        _deletion_keys,
        prepare_typo_index,
        typo_expansion_map,
    )

    queries = ["recieve", "windoe", "zebro", "xxxxx", "wird"]
    # scan path first (no index cached yet)
    assert getattr(idx, "_typo_nbr", None) in (None, {})
    scan_map = typo_expansion_map(idx, queries)
    nbr = prepare_typo_index(idx)
    try:
        idx_map = typo_expansion_map(idx, queries)
        assert idx_map == scan_map and idx_map  # identical, non-trivial
        # plan: the candidate lookup is delkey-pruned, not a
        # levenshtein scan
        qkeys = sorted(_deletion_keys("recieve", 1))
        lookup = nbr.filter(F.col("delkey").isin(qkeys)).select("term")
        plan = lookup._jdf.queryExecution().executedPlan().toString()
        assert "levenshtein" not in plan.lower()
        assert "delkey" in plan
        # the SymSpell superset property: every <=d-distance dictionary
        # term shares a deletion key with the query term
        for q, exps in scan_map.items():
            d = 2 if len(q) >= 9 else 1
            qk = _deletion_keys(q, d)
            for c in exps:
                assert qk & _deletion_keys(c, 2), (q, c)
    finally:
        for df in idx._typo_nbr.values():
            df.unpersist()
        idx._typo_nbr = {}


def test_deletion_index_respects_disable_on_attributes(idx):
    """The typo index is keyed by the candidate-dictionary config:
    with tag disabled, 'zebra' (tag-only vocabulary) must not be a
    candidate even through the indexed path."""
    from meilibridge_spark.config import TypoToleranceConfig
    from meilibridge_spark.operators.search import (
        prepare_typo_index,
        typo_expansion_map,
    )

    tc = TypoToleranceConfig.make(disable_on_attributes=("tag",))
    prepare_typo_index(idx, tc)
    try:
        got = typo_expansion_map(idx, ["zebro", "receve"], tc)
        assert "zebro" not in got
        assert got.get("receve") == ["receive"]
    finally:
        for df in idx._typo_nbr.values():
            df.unpersist()
        idx._typo_nbr = {}


def test_stored_typo_table_serves_without_build(spark, idx, tmp_index_dir, monkeypatch):
    """Round-4: the deletion-neighborhood table is STORED in the
    snapshot (with_typos=True) and maintained like attrs/positions. A
    reloaded snapshot must serve typo queries with ZERO
    neighborhood-build jobs — both the builder and the candidate
    dictionary are poisoned here, so any session-side rebuild fails
    loudly — and no session `.persist()` cache appears."""
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import load_snapshot
    import meilibridge_spark.operators.search as S

    df = spark.createDataFrame(DOCS, "doc_id long, text string, tag string")
    built = build_and_save(
        spark, df, CFG, tmp_index_dir, doc_id_col="doc_id", with_typos=True
    )
    assert built.typos is not None
    queries = ["receve", "windoe", "zebro", "xxxxx"]
    scan_map = S.typo_expansion_map(idx, queries)  # plain index: scan path

    loaded = load_snapshot(spark, tmp_index_dir, CFG)
    assert loaded.typos is not None
    monkeypatch.setattr(
        S, "build_typo_table",
        lambda *_a, **_k: pytest.fail("neighborhood build ran at serve time"),
    )
    monkeypatch.setattr(
        S, "_typo_candidate_terms",
        lambda *_a, **_k: pytest.fail("candidate-dictionary scan ran"),
    )
    assert S.prepare_typo_index(loaded) is loaded.typos
    got = S.typo_expansion_map(loaded, queries)
    assert got == scan_map and got
    assert getattr(loaded, "_typo_nbr", None) in (None, {})
    # the stored lookup is delkey-pruned against the parquet layout
    from meilibridge_spark.operators.search import terms_in

    plan = (
        loaded.typos.filter(terms_in("delkey", ["receve", "recev"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "delkey" in plan and "levenshtein" not in plan.lower()


def test_stored_typo_table_restricted_config_falls_back(spark, tmp_index_dir):
    """disable_on_attributes restricts the candidate dictionary; the
    stored full-vocabulary table must NOT answer that config."""
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import load_snapshot
    from meilibridge_spark.operators.search import typo_expansion_map

    df = spark.createDataFrame(DOCS, "doc_id long, text string, tag string")
    build_and_save(
        spark, df, CFG, tmp_index_dir, doc_id_col="doc_id", with_typos=True
    )
    loaded = load_snapshot(spark, tmp_index_dir, CFG)
    tc = TypoToleranceConfig.make(disable_on_attributes=("tag",))
    got = typo_expansion_map(loaded, ["zebro", "receve"], tc)
    assert "zebro" not in got  # tag-only vocab excluded
    assert got.get("receve") == ["receive"]
    try:
        for df_ in loaded._typo_nbr.values():
            df_.unpersist()
    except AttributeError:
        pass


def test_cdc_maintains_stored_typo_table(spark, tmp_index_dir):
    """apply_cdc keeps the stored neighborhood equal to a fresh
    expansion of the post-merge vocabulary: new vocab gains keys,
    vanished vocab loses them. Cost of the merge is ∝ affected terms."""
    from meilibridge_spark.operators.search import build_typo_table
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.plans.incremental import apply_cdc
    from meilibridge_spark.sources.cdc import generate_cdc_batch
    from meilibridge_spark.sources.transcripts import generate_transcripts

    sdf = generate_transcripts(spark, n_convs=8, seed=3).persist()
    cfg = IndexConfig(index_name="cdc-typo")
    built = build_and_save(spark, sdf, cfg, tmp_index_dir, with_typos=True)
    cdc = generate_cdc_batch(spark, sdf, seed=11)
    merged = apply_cdc(built, cdc)
    assert merged.typos is not None
    fresh = build_typo_table(merged.terms)
    assert merged.typos.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(merged.typos).count() == 0


def test_disable_on_numbers(spark):
    """Meilisearch v1.12 typoTolerance.disableOnNumbers: digit-carrying
    query words never typo-expand, and digit-carrying dictionary words
    never serve as alternates ('12345' must not match '12346')."""
    from meilibridge_spark.config import (
        ASCII_TOKEN_PATTERN,
        AnalyzerConfig,
        IndexConfig,
        TypoToleranceConfig,
    )
    from meilibridge_spark.operators.search import typo_expansion_map
    from meilibridge_spark.plans.build import build_index

    rows = [
        (0, "release 12345 stable"),
        (1, "release 12346 nightly"),
        (2, "stable branch only"),
    ]
    cfg = IndexConfig(
        index_name="typo-num",
        primary_key=("doc_id",),
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
    )
    idx = build_index(
        spark.createDataFrame(rows, "doc_id long, text string"),
        cfg,
        doc_id_col="doc_id",
    )
    on = TypoToleranceConfig.make(disable_on_numbers=True)
    off = TypoToleranceConfig.make()
    # digit query word: no expansion with the flag, expands without
    assert typo_expansion_map(idx, ["12345"], on) == {}
    assert typo_expansion_map(idx, ["12345"], off) == {"12345": ["12346"]}
    # digit dictionary words never serve as alternates either
    # ('stabl3' is a digit-carrying QUERY word -> also not expanded)
    assert typo_expansion_map(idx, ["stabl3"], on) == {}
    # plain words still expand normally under the flag
    assert typo_expansion_map(idx, ["stible"], on) == {"stible": ["stable"]}
