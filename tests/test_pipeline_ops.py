"""Engine-level checks for the training-data pipeline operators beyond
the DuckDB oracle gate (which covers value correctness at sf0.01)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_lsh_ann_subset_of_exact(spark, emb):
    """ANN hits must be a subset of the brute-force candidate scores:
    every (query, vec) pair returned by LSH carries the same cosine the
    exact path computes (recall<=1, precision of scores exact)."""
    from meilibridge_spark.operators.similarity import cosine_topk, lsh_ann_topk

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in cosine_topk(emb, q, k=500).collect()
    }
    ann = lsh_ann_topk(emb, q, k=5).collect()
    assert len(ann) > 0
    for r in ann:
        key = (r["query_id"], r["vec_id"])
        assert key in exact
        assert r["cos"] == pytest.approx(exact[key], abs=1e-9)


def test_near_dups_bucketed(spark, emb):
    from meilibridge_spark.operators.similarity import embedding_near_dups

    dups = embedding_near_dups(emb, threshold=0.0, n_bits=10).limit(50).collect()
    for r in dups:
        assert r["id_a"] < r["id_b"]
        assert -1.0 <= r["cos"] <= 1.0


def test_multimodal_decode_stub_raises(spark, docs):
    from meilibridge_spark.operators.multimodal import extract_features, synth_assets

    assets = synth_assets(docs.limit(5))
    with pytest.raises(Exception) as ei:
        extract_features(assets, real_decode=True).collect()
    assert "NotImplementedError" in str(ei.value) or "decoding" in str(ei.value)


def test_multimodal_features_deterministic(spark, docs):
    from meilibridge_spark.operators.multimodal import extract_features, synth_assets

    a = extract_features(synth_assets(docs)).orderBy("asset_id").collect()
    b = extract_features(synth_assets(docs)).orderBy("asset_id").collect()
    assert a == b
    assert all(len(r["feat"]) == 8 for r in a)
    assert {r["kind"] for r in a} == {"image", "audio", "video"}


def test_minhash_detects_true_duplicates(spark):
    """Inject an exact duplicate + a near-duplicate: LSH must surface
    both as candidates."""
    from meilibridge_spark.operators.dedup import (
        jaccard_pairs,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact dup
        (3, base + " with one extra tail"),  # near dup
        (4, "completely different content about spark query planning"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = lsh_candidate_pairs(lsh_bands(minhash_signatures(df)))
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, cands).collect()
    }
    assert jac[(1, 2)] == 1.0


def test_exact_dedup_counts(spark):
    from meilibridge_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb")], "doc_id long, text string"
    )
    got = {r["canonical_doc_id"]: r["n_docs"] for r in exact_dedup(df).collect()}
    assert got == {1: 2, 3: 1}


def test_jaccard_degenerate_shared_token_bounded(spark):
    """A stop-word-grade token shared by EVERY candidate doc must not
    inflate the plan: output rows == candidate pairs exactly, and the
    values stay exact set-Jaccard."""
    from meilibridge_spark.operators.dedup import jaccard_pairs

    n = 30
    rows = [(i, f"common alpha beta w{i} w{i + 1} w{i + 2}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ids = df.select("doc_id")
    from pyspark.sql import functions as F

    pairs = (
        ids.select(F.col("doc_id").alias("id_a"))
        .crossJoin(ids.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    n_pairs = n * (n - 1) // 2
    got = jaccard_pairs(df, pairs).collect()
    assert len(got) == n_pairs  # one row per pair, no token-join blowup
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}
    # adjacent docs share {common, alpha, beta} + 2 of 3 w-tokens -> 5/7
    assert by_pair[(0, 1)] == round(5 / 7, 6)
    # far-apart docs share only the 3 degenerate tokens -> 3/9
    assert by_pair[(0, 20)] == round(3 / 9, 6)


def test_ivf_ann_subset_of_exact(spark, emb):
    """IVF ANN hits carry the exact cosine of the brute-force path, and
    assignment sends every vector to exactly one list."""
    from meilibridge_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    cents = ivf_centroids(emb, 8)
    assert cents.count() == 8
    assign = ivf_assign(emb, cents)
    n = emb.count()
    assert assign.count() == n  # one list per vector
    assert assign.select("vec_id").distinct().count() == n
    # every centroid assigns to its own list (cos=1 with itself)
    self_rows = {
        r["vec_id"]: r["centroid_id"]
        for r in assign.filter(F.col("vec_id") < 8).collect()
    }
    assert self_rows == {i: i for i in range(8)}

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in cosine_topk(emb, q, k=500).collect()
    }
    ann = ivf_topk(emb, q, k=5, n_centroids=8, n_probe=2).collect()
    assert len(ann) > 0
    for r in ann:
        key = (r["query_id"], r["vec_id"])
        assert key in exact
        assert r["cos"] == pytest.approx(exact[key], abs=1e-9)


def test_dedup_clusters_components(spark):
    """Chain and island components resolve to min-id canonical labels,
    including a long chain needing several propagation rounds."""
    from meilibridge_spark.operators.dedup import dedup_clusters

    # chain 10-11-12-13-14 (diameter 4), pair (20,21), star 30-(31,32)
    edges = [(11, 10), (11, 12), (12, 13), (13, 14), (20, 21), (30, 31), (30, 32)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()
    }
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30,
    }


def test_resize_images_stub_and_gate(spark, docs):
    """Resize: dimension planning is exact JVM arithmetic; the pixel
    path is the gated decode slot (raises without libraries), the stub
    emits deterministic dimension-salted digests."""
    import hashlib

    from meilibridge_spark.operators.multimodal import (
        resize_images,
        resize_plan,
        synth_assets,
    )

    assets = synth_assets(docs.limit(60))
    plan = {r["asset_id"]: (r["out_w"], r["out_h"]) for r in resize_plan(assets).collect()}
    assert plan  # images exist
    for (w, h) in plan.values():
        assert 1 <= w <= 224 and 1 <= h <= 224
        # aspect fit touches one target edge (floor may shave 1px)
        assert max(w, h) >= 223
    rows = resize_images(assets).collect()
    assert {r["asset_id"] for r in rows} == set(plan)
    src = {r["asset_id"]: bytes(r["payload"]) for r in assets.collect()}
    for r in rows:
        w, h = plan[r["asset_id"]]
        assert (r["out_w"], r["out_h"]) == (w, h)
        want = hashlib.md5(src[r["asset_id"]] + f":{w}x{h}".encode()).hexdigest()
        assert r["resized_digest"] == want
    with pytest.raises(Exception, match="PIL"):
        resize_images(assets, real_decode=True).collect()


def test_dedup_clusters_nonconvergence_raises(spark):
    from meilibridge_spark.operators.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(8)]  # diameter 8
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup_clusters(pairs, max_iter=3)
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs, max_iter=10).collect()}
    assert set(got.values()) == {0}


def test_jaccard_null_text_pairs(spark):
    """NULL text behaves as an empty token set: jaccard 0, never
    negative/NULL garbage from size(-1)."""
    from meilibridge_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, None)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(df, pairs).collect()}
    assert got == {(0, 1): 0.0, (1, 2): 0.0}
    # thresholded call drops them
    assert jaccard_pairs(df, pairs, threshold=0.1).count() == 0


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """A boilerplate corpus (many identical docs -> one hot bucket) must
    produce bounded candidate pairs under max_bucket, and the dropped
    buckets must be observable via lsh_dropped_buckets."""
    from meilibridge_spark.operators.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        lsh_dropped_buckets,
        minhash_signatures,
    )

    boiler = [(i, "lorem ipsum boilerplate footer text") for i in range(50)]
    real = [
        (100, "spark query planning with adaptive execution"),
        (101, "spark query planning with adaptive executions"),
    ]
    df = spark.createDataFrame(boiler + real, "doc_id long, text string")
    bands = lsh_bands(minhash_signatures(df)).persist()
    uncapped = lsh_candidate_pairs(bands).count()
    assert uncapped >= 50 * 49 // 2  # quadratic blowup without the cap
    capped = lsh_candidate_pairs(bands, max_bucket=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got  # real near-dups survive the cap
    assert all(a >= 100 for a, _ in got)  # boilerplate bucket dropped
    dropped = lsh_dropped_buckets(bands, max_bucket=10).collect()
    assert dropped and all(r["n_docs"] == 50 for r in dropped)
    bands.unpersist()


def test_ivf_zero_norm_vectors(spark):
    """Zero-norm vectors: assigned to the -1 sentinel list, never
    returned as hits by exact or IVF search."""
    from meilibridge_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero-norm
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.1, 0.9, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assign = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(emb, ivf_centroids(emb, 2)).collect()
    }
    assert assign[2] == -1  # explicit sentinel, not an arbitrary list
    assert len(assign) == 5
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact_hits = {r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()}
    ivf_hits = {
        r["vec_id"]
        for r in ivf_topk(emb, q, k=5, n_centroids=2, n_probe=2).collect()
    }
    assert 2 not in exact_hits and 2 not in ivf_hits
    assert ivf_hits <= exact_hits


def test_ivf_kmeans_training(spark, emb):
    """Spherical k-means centroids: deterministic, balanced lists, and
    recall@k at least the sampled-centroid baseline on the fixed corpus
    (0.68 vs 0.67 at k=10, n_probe=2 — pinned by determinism)."""
    from meilibridge_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_centroids,
        ivf_topk,
        ivf_train_kmeans,
    )

    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    K = 10
    exact: dict = {}
    for r in cosine_topk(emb, q, k=K).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(cents):
        hits: dict = {}
        for r in ivf_topk(emb, q, k=K, n_probe=2, centroids=cents).collect():
            hits.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(hits.get(k_, set()) & v) / K for k_, v in exact.items()
        ) / len(exact)

    trained = ivf_train_kmeans(emb, 8, n_iter=5)
    assert recall(trained) >= recall(ivf_centroids(emb, 8))
    # deterministic across runs (no Date.now/random anywhere)
    again = ivf_train_kmeans(emb, 8, n_iter=5)
    assert sorted(
        (r["centroid_id"], tuple(r["centroid_vec"])) for r in trained.collect()
    ) == sorted(
        (r["centroid_id"], tuple(r["centroid_vec"])) for r in again.collect()
    )
    # trained lists are reasonably balanced (no empty/hot list)
    counts = [
        r["count"]
        for r in ivf_assign(emb, trained).groupBy("centroid_id").count().collect()
    ]
    assert len(counts) == 8 and min(counts) > 0
    assert max(counts) <= 4 * min(counts)


def test_highlight_hits(spark):
    from meilibridge_spark.config import ASCII_TOKEN_PATTERN
    from meilibridge_spark.operators.relational import highlight_hits

    docs = spark.createDataFrame(
        [
            (0, "Spark joins and sparkly joining"),
            (1, "no match here"),
            (2, "JOIN spark join"),
        ],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame(
        [(0, 1.0), (1, 0.5), (2, 0.9)], "doc_id long, score double"
    )
    out = {
        r["doc_id"]: r["_formatted_text"]
        for r in highlight_hits(
            hits, docs, ["spark", "join"],
            token_pattern=ASCII_TOKEN_PATTERN, hit_bound=3,
        ).collect()
    }
    # case preserved, case-insensitive match, token-bounded (no
    # highlight inside 'sparkly'/'joining')
    assert out[0] == "<em>Spark</em> joins and sparkly joining"
    assert out[1] == "no match here"
    assert out[2] == "<em>JOIN</em> <em>spark</em> <em>join</em>"


def test_highlight_empty_terms_and_tags(spark):
    from meilibridge_spark.operators.relational import highlight_hits

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    hits = spark.createDataFrame([(0, 1.0)], "doc_id long, score double")
    out = highlight_hits(hits, docs, [], hit_bound=1).collect()
    assert out[0]["_formatted_text"] == "a b c"
    out2 = highlight_hits(
        hits, docs, ["b"], pre_tag="**", post_tag="**", hit_bound=1
    ).collect()
    assert out2[0]["_formatted_text"] == "a **b** c"


def test_crop_hits(spark):
    from meilibridge_spark.operators.relational import crop_hits

    docs = spark.createDataFrame(
        [
            (0, "w1 w2 w3 w4 SPARK w6 w7 w8 w9 w10"),
            (1, "no match in this longer text at all really truly"),
            (2, "spark starts here"),
            (3, "short text"),
        ],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame(
        [(i, 1.0) for i in range(4)], "doc_id long, score double"
    )
    out = {
        r["doc_id"]: r["_cropped_text"]
        for r in crop_hits(
            hits, docs, ["spark"], crop_length=4, hit_bound=4
        ).collect()
    }
    # match at word 5 -> window [3..6], markers both sides
    assert out[0] == "…w3 w4 SPARK w6…"
    # no match -> leading words + trailing marker
    assert out[1] == "no match in this…"
    # match at word 1 -> window clamps to start
    assert out[2] == "spark starts here"
    # text shorter than crop_length -> unchanged, no markers
    assert out[3] == "short text"


def test_crop_per_attribute_lengths(spark):
    """Meilisearch's attributesToCrop ':N' suffix: 'attr:N' overrides
    cropLength for that attribute only; bad suffixes error loudly."""
    import pytest as _pytest

    from meilibridge_spark.operators.relational import crop_hits

    docs = spark.createDataFrame(
        [(0, "w1 w2 w3 w4 SPARK w6 w7 w8 w9 w10",
          "a1 a2 spark a4 a5 a6 a7 a8")],
        "doc_id long, text string, title string",
    )
    hits = spark.createDataFrame([(0, 1.0)], "doc_id long, score double")
    row = crop_hits(
        hits, docs, ["spark"], attributes=("text:4", "title"),
        crop_length=6, hit_bound=1,
    ).collect()[0]
    # text cropped to its own 4; title falls back to crop_length=6
    assert row["_cropped_text"] == "…w3 w4 SPARK w6…"
    assert row["_cropped_title"] == "a1 a2 spark a4 a5 a6…"
    with _pytest.raises(ValueError, match="integer word count"):
        crop_hits(hits, docs, ["spark"], attributes=("text:big",))
    with _pytest.raises(ValueError, match=">= 1"):
        crop_hits(hits, docs, ["spark"], attributes=("text:0",))


def test_crop_best_window(spark):
    """Meilisearch multi-match crop: the window holding the MOST term
    occurrences wins over the first match; earliest anchor on ties."""
    from meilibridge_spark.operators.relational import crop_hits

    docs = spark.createDataFrame(
        [
            # lone 'alpha' first, 3-term cluster later -> crop the cluster
            (0, "alpha x x x x x x x x x x x beta gamma alpha end"),
            # two single matches far apart -> earliest wins the tie
            (1, "beta a b c d e f g h i j k gamma z z z"),
        ],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame(
        [(0, 1.0), (1, 1.0)], "doc_id long, score double"
    )
    out = {
        r["doc_id"]: r["_cropped_text"]
        for r in crop_hits(
            hits, docs, ["alpha", "beta", "gamma"], crop_length=5,
            hit_bound=2,
        ).collect()
    }
    assert out[0] == "…x x beta gamma alpha…"
    assert out[1] == "beta a b c d…"


def test_crop_validation(spark):
    import pytest as _pytest

    from meilibridge_spark.operators.relational import crop_hits

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    hits = spark.createDataFrame([(0, 1.0)], "doc_id long, score double")
    with _pytest.raises(ValueError, match="crop_length"):
        crop_hits(hits, docs, ["a"], crop_length=0)


def test_facet_sort_by_count(spark):
    import pytest as _pytest

    from meilibridge_spark.operators.relational import facet_counts

    docs = spark.createDataFrame(
        [(0, "de"), (1, "en"), (2, "en"), (3, "fr"), (4, "fr"), (5, "fr")],
        "doc_id long, lang string",
    )
    hits = spark.createDataFrame(
        [(i, 1.0) for i in range(6)], "doc_id long, score double"
    )
    rows = facet_counts(
        hits, docs, "lang", sort_by="count", hit_bound=6
    ).collect()
    assert [(r["lang"], r["count"]) for r in rows] == [
        ("fr", 3), ("en", 2), ("de", 1),
    ]
    with _pytest.raises(ValueError, match="sort_by"):
        facet_counts(hits, docs, "lang", sort_by="size")


def test_field_distribution_null_and_subset(spark):
    """NULL is the missing-JSON-key analog: a NULL cell must not count
    toward its field's document tally, and `fields=` restricts (and
    orders the scan's ReadSchema to) the requested columns."""
    from meilibridge_spark.operators.docs import field_distribution

    docs = spark.createDataFrame(
        [(0, "a", "en"), (1, None, "en"), (2, "c", None), (3, None, None)],
        "doc_id long, text string, lang string",
    )
    rows = field_distribution(docs).collect()
    assert [(r["field"], r["n_docs"]) for r in rows] == [
        ("doc_id", 4), ("lang", 2), ("text", 2),
    ]
    sub = field_distribution(docs, fields=("lang",)).collect()
    assert [(r["field"], r["n_docs"]) for r in sub] == [("lang", 2)]


def test_facet_search_prefix_and_whole_index(spark):
    """Facet-value search: case-insensitive prefix match applied BEFORE
    the aggregation; hits=None counts over the whole table (the no-q
    endpoint form); sort_by='count' orders by count desc."""
    import pytest as _pytest

    from meilibridge_spark.operators.relational import facet_search

    docs = spark.createDataFrame(
        [(0, "En"), (1, "en"), (2, "es"), (3, "de"), (4, None), (5, "es")],
        "doc_id long, lang string",
    )
    rows = facet_search(None, docs, "lang", facet_query="E").collect()
    assert [(r["value"], r["count"]) for r in rows] == [
        ("En", 1), ("en", 1), ("es", 2),
    ]
    hits = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (5, 1.0)], "doc_id long, score double"
    )
    sub = facet_search(
        hits, docs, "lang", facet_query="e", hit_bound=3, sort_by="count"
    ).collect()
    assert [(r["value"], r["count"]) for r in sub] == [("es", 2), ("en", 1)]
    with _pytest.raises(ValueError, match="sort_by"):
        facet_search(None, docs, "lang", sort_by="size")


def test_facet_search_typo_tolerance(spark):
    """Meilisearch facet search honors typoTolerance: a query >= the
    oneTypo threshold matches values whose same-length prefix is
    within the edit budget; short queries, disableOnWords entries and
    (with disableOnNumbers) digit-carrying queries stay exact-prefix;
    cfg=None (bare primitive) never typo-matches."""
    from meilibridge_spark.config import (
        IndexConfig,
        TypoToleranceConfig,
    )
    from meilibridge_spark.operators.relational import facet_search

    docs = spark.createDataFrame(
        [
            (0, "science fiction"),
            (1, "sciense fiction"),
            (2, "history"),
            (3, "sci"),
            (4, "spruncetastic"),
        ],
        "doc_id long, genre string",
    )
    cfg = IndexConfig(index_name="fs")

    def vals(q, c=cfg):
        return sorted(
            r["value"]
            for r in facet_search(None, docs, "genre", facet_query=q, cfg=c).collect()
        )

    # len('scienc') = 6 >= oneTypo 5: budget 1 -> the typo'd value and
    # the exact one both match; 'sci' (shorter than q) accrues the
    # missing chars as edits and stays out
    assert vals("scienc") == ["science fiction", "sciense fiction"]
    # bare primitive (cfg=None): exact prefix only
    assert vals("scienc", None) == ["science fiction"]
    # short query (< oneTypo): exact prefix only ('scie' prefixes both)
    assert vals("scie") == ["science fiction", "sciense fiction"]
    assert vals("scien") == ["science fiction", "sciense fiction"]  # b=1
    # >= twoTypos chars (10 >= 9): budget 2 — both fiction values are
    # within 2 edits of the query on their 10-char prefix;
    # 'spruncetastic' needs more and stays out
    assert vals("scrence fi") == ["science fiction", "sciense fiction"]
    # disableOnWords zeroes the budget for that exact query
    c2 = IndexConfig(
        index_name="fs",
        typo=TypoToleranceConfig.make(disable_on_words=("scienc",)),
    )
    assert vals("scienc", c2) == ["science fiction"]
    # disableOnNumbers: digit-carrying queries stay exact
    c3 = IndexConfig(
        index_name="fs",
        typo=TypoToleranceConfig.make(disable_on_numbers=True),
    )
    assert vals("scienc3", c3) == []
    # typoTolerance disabled entirely
    c4 = IndexConfig(
        index_name="fs", typo=TypoToleranceConfig.make(enabled=False)
    )
    assert vals("scienc", c4) == ["science fiction"]


def test_ranking_scores_subscores_and_threshold(spark):
    """showRankingScore analog: per-rule subscores in [0,1], mean as
    _ranking_score, threshold drops below-par hits, and columns the
    hit set doesn't carry contribute no subscore."""
    import pytest as _pytest

    from meilibridge_spark.operators.relational import ranking_scores

    hits = spark.createDataFrame(
        [(0, 1.0, 2, 2), (1, 0.9, 2, 0), (2, 0.8, 1, 0)],
        "doc_id long, score double, matched_terms int, exact_form int",
    )
    rows = {r["doc_id"]: r for r in ranking_scores(hits, 2).collect()}
    assert rows[0]["_ranking_score"] == _pytest.approx(1.0)
    assert rows[1]["_ranking_score"] == _pytest.approx(0.5)  # (1 + 0)/2
    assert rows[2]["_ranking_score"] == _pytest.approx(0.25)  # (0.5 + 0)/2
    kept = ranking_scores(hits, 2, threshold=0.5).collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 1]
    # words-only hit set: mean over the single active subscore
    w = spark.createDataFrame(
        [(0, 1.0, 1)], "doc_id long, score double, matched_terms int"
    )
    row = ranking_scores(w, 4).collect()[0]
    assert row["_ranking_score"] == _pytest.approx(0.25)
    assert "_score_exactness" not in w.columns
    with _pytest.raises(ValueError, match="matched_terms"):
        ranking_scores(w.drop("matched_terms"), 2)
    with _pytest.raises(ValueError, match="threshold"):
        ranking_scores(w, 2, threshold=1.5)


def test_ranking_score_details(spark):
    """showRankingScoreDetails analog: one sub-struct per ACTIVE rule
    in rule order, each with its inputs and [0,1] score; inactive rules
    (columns the hit set lacks) are absent from the struct."""
    import pytest as _pytest

    from meilibridge_spark.operators.relational import ranking_scores

    hits = spark.createDataFrame(
        [(0, 1.0, 2, 1, 2), (1, 0.9, 2, 2, 0)],
        "doc_id long, score double, matched_terms int, "
        "matched_exact int, exact_form int",
    )
    rows = {
        r["doc_id"]: r["_ranking_score_details"]
        for r in ranking_scores(hits, 2, score_details=True).collect()
    }
    d0 = rows[0].asDict(recursive=True)
    assert set(d0) == {"words", "typo", "exactness"}
    assert d0["words"] == {
        "order": 0, "matchingWords": 2, "maxMatchingWords": 2, "score": 1.0,
    }
    assert d0["typo"]["order"] == 1 and d0["typo"]["typoCount"] == 1
    assert d0["typo"]["score"] == _pytest.approx(0.5)
    assert d0["exactness"]["matchType"] == "exactMatch"
    d1 = rows[1].asDict(recursive=True)
    assert d1["typo"]["typoCount"] == 0 and d1["typo"]["score"] == 1.0
    assert d1["exactness"]["matchType"] == "noExactMatch"
    assert d1["exactness"]["score"] == 0.0

    # words-only hit set -> words-only details
    w = spark.createDataFrame(
        [(0, 1.0, 1)], "doc_id long, score double, matched_terms int"
    )
    det = ranking_scores(w, 4, score_details=True).collect()[0]
    assert set(det["_ranking_score_details"].asDict()) == {"words"}


def test_federated_search_weighted_merge(spark):
    """Federation merges per-index top-k on weighted ranking score:
    weights re-order across indexes; raw BM25 never crosses indexes."""
    import pytest as _pytest

    from meilibridge_spark.config import ASCII_TOKEN_PATTERN, AnalyzerConfig, IndexConfig
    from meilibridge_spark.operators.federation import federated_search
    from meilibridge_spark.plans.build import build_index

    def mk(name, rows):
        cfg = IndexConfig(
            index_name=name,
            primary_key=("doc_id",),
            searchable_attributes=("text",),
            analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
        )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return build_index(df, cfg, doc_id_col="doc_id")

    a = mk("a", [(0, "spark join planning"), (1, "other words here")])
    b = mk("b", [(0, "spark only content"), (1, "unrelated text")])
    # a/doc0 matches 2/2 terms (ranking 1.0), b/doc0 matches 1/2 (0.5)
    res = federated_search([("a", a, 1.0), ("b", b, 1.0)], "spark join", 3).collect()
    assert [(r["index_uid"], r["doc_id"]) for r in res][:2] == [("a", 0), ("b", 0)]
    assert res[0]["weighted_ranking_score"] == _pytest.approx(1.0)
    assert res[1]["weighted_ranking_score"] == _pytest.approx(0.5)
    # demoting index a below 0.5 flips the order
    flipped = federated_search(
        [("a", a, 0.4), ("b", b, 1.0)], "spark join", 3
    ).collect()
    assert [(r["index_uid"], r["doc_id"]) for r in flipped][:2] == [
        ("b", 0), ("a", 0),
    ]
    with _pytest.raises(ValueError, match="duplicate"):
        federated_search([("a", a, 1.0), ("a", b, 1.0)], "spark", 3)
    with _pytest.raises(ValueError, match="weight"):
        federated_search([("a", a, -1.0)], "spark", 3)


def test_similar_documents(spark):
    """GET /similar analog: self excluded, threshold prunes before
    ranking (contiguous ranks), filter restricts candidates, unknown
    target ids raise."""
    import pytest as _pytest

    from meilibridge_spark.operators.similarity import similar_documents

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # cos(0,1) ~ 0.994
        (2, [0.0, 1.0, 0.0]),   # cos(0,2) = 0
        (3, [0.7, 0.7, 0.0]),   # cos(0,3) ~ 0.707
        (4, [-1.0, 0.0, 0.0]),  # cos(0,4) = -1 -> rs 0
        (5, [0.0, 0.0, 0.0]),   # zero-norm: never a hit
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similar_documents(emb, [0], k=10).collect()
    ids = [r["vec_id"] for r in got]
    assert ids == [1, 3, 2, 4]  # cos order; no self, no zero-norm
    assert [r["rank"] for r in got] == [1, 2, 3, 4]
    assert got[0]["ranking_score"] > 0.99 and got[-1]["ranking_score"] == 0.0

    thr = similar_documents(emb, [0], k=10, threshold=0.6).collect()
    assert [r["vec_id"] for r in thr] == [1, 3]  # rs(2)=0.5 < 0.6
    assert [r["rank"] for r in thr] == [1, 2]  # contiguous after prune

    filt = spark.createDataFrame([(2,), (4,)], "vec_id long")
    restricted = similar_documents(emb, [0], k=10, filter_docs=filt).collect()
    assert [r["vec_id"] for r in restricted] == [2, 4]

    multi = similar_documents(emb, [0, 2], k=2).collect()
    assert {r["target_id"] for r in multi} == {0, 2}
    assert all(r["target_id"] != r["vec_id"] for r in multi)

    with _pytest.raises(ValueError, match="unknown target"):
        similar_documents(emb, [0, 99], k=2)
    with _pytest.raises(ValueError, match="at least one"):
        similar_documents(emb, [], k=2)
    with _pytest.raises(ValueError, match="threshold"):
        similar_documents(emb, [0], threshold=1.5)


def test_py_files_package(tmp_path):
    """scripts/package.py builds the --py-files artifact the job
    docstrings reference: tests+caches excluded, importable straight
    off sys.path (how spark-submit ships it to executors), and
    byte-reproducible."""
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        from package import build_zip
    finally:
        sys.path.pop(0)

    z1 = str(tmp_path / "a.zip")
    members = build_zip(z1)
    assert "meilibridge_spark/operators/search.py" in members
    assert "meilibridge_spark/jobs/query.py" in members
    assert not [m for m in members if "test" in m or "__pycache__" in m]
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import meilibridge_spark.functions.codec as c; "
        "print(c.__name__)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, z1],
        capture_output=True, text=True, check=True,
        env={**os.environ, "PYTHONPATH": ""}, cwd=str(tmp_path),
    )
    assert out.stdout.strip() == "meilibridge_spark.functions.codec"
    z2 = str(tmp_path / "b.zip")
    build_zip(z2)
    assert open(z1, "rb").read() == open(z2, "rb").read()


def test_get_documents(spark, docs):
    """GET /documents analog: id-ordered pagination, fields exactly as
    requested, filter enforced against the declared filterables."""
    import pytest as _pytest

    from meilibridge_spark.functions.filters import ConfigError
    from meilibridge_spark.operators.relational import get_documents

    p1 = get_documents(docs, limit=5).collect()
    p2 = get_documents(docs, offset=5, limit=5).collect()
    assert len(p1) == 5 and len(p2) == 5
    ids = [r["doc_id"] for r in p1 + p2]
    assert ids == sorted(ids) and len(set(ids)) == 10  # contiguous pages
    got = get_documents(
        docs, ("lang",), "lang = 'en'", fields=("lang", "n_chars"), limit=3
    )
    assert got.columns == ["lang", "n_chars"]  # id only if requested
    assert all(r["lang"] == "en" for r in got.collect())
    with _pytest.raises(ConfigError):  # undeclared filterable: loud
        get_documents(docs, ("lang",), "source = 'src1'", limit=1)
    with _pytest.raises(ValueError, match="unknown field"):
        get_documents(docs, fields=("nope",), limit=1)
    with _pytest.raises(ValueError, match="offset"):
        get_documents(docs, offset=-1)


def test_get_index_documents_enforcement_is_index_defined(spark, docs):
    """The index-defined documents listing takes its filterable set
    from the BUILT settings, like filter_doc_ids — not per call site."""
    import pytest as _pytest

    from meilibridge_spark.config import (
        ASCII_TOKEN_PATTERN,
        AnalyzerConfig,
        ConfigError,
        IndexConfig,
    )
    from meilibridge_spark.operators.relational import get_index_documents
    from meilibridge_spark.plans.build import build_index

    cfg = IndexConfig(
        index_name="gd",
        primary_key=("doc_id",),
        searchable_attributes=("text",),
        filterable_attributes=("lang",),
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
    )
    idx = build_index(docs, cfg, doc_id_col="doc_id")
    page = get_index_documents(
        idx, "lang = 'en'", fields=("doc_id", "lang"), limit=4
    ).collect()
    assert len(page) == 4 and all(r["lang"] == "en" for r in page)
    with _pytest.raises(ConfigError):  # undeclared in the INDEX settings
        get_index_documents(idx, "source = 'src1'", limit=1)


def test_similar_documents_ivf(spark, emb):
    """method='ivf' at full probe == exact (ANN ⊆ exact, here =);
    at partial probe every hit is also an exact hit with the same cos."""
    from meilibridge_spark.operators.similarity import similar_documents

    exact = similar_documents(emb, [3, 7], k=5, threshold=0.55)
    full = similar_documents(
        emb, [3, 7], k=5, threshold=0.55, method="ivf",
        n_centroids=4, n_probe=4,
    )
    key = lambda r: (r["target_id"], r["rank"])  # noqa: E731
    e = [(r["target_id"], r["vec_id"], r["cos"], r["rank"])
         for r in sorted(exact.collect(), key=key)]
    f = [(r["target_id"], r["vec_id"], r["cos"], r["rank"])
         for r in sorted(full.collect(), key=key)]
    assert e == f and len(e) > 0
    part = similar_documents(
        emb, [3, 7], k=5, method="ivf", n_centroids=4, n_probe=1,
    ).collect()
    ecos = {(r["target_id"], r["vec_id"]): r["cos"] for r in
            similar_documents(emb, [3, 7], k=2000).collect()}
    assert all(
        ecos[(r["target_id"], r["vec_id"])] == r["cos"] for r in part
    )


def test_get_documents_by_ids(spark, docs):
    """POST /documents/fetch ids form: equality-set predicate pushed to
    the scan, composing with the grammar filter as an intersection."""
    import pytest as _pytest

    from meilibridge_spark.operators.relational import get_documents

    got = get_documents(docs, ids=[7, 3, 11], fields=("doc_id",), limit=20)
    assert [r["doc_id"] for r in got.collect()] == [3, 7, 11]
    # pushdown asserted on an UNCACHED table (documents is persisted by
    # the module fixture, and the cache manager substitutes any
    # same-path read with the InMemoryRelation, which carries no
    # PushedFilters line)
    fresh = get_documents(
        spark.read.parquet(f"{SF}/events.parquet"),
        ids=[7, 3, 11], fields=("event_id",), id_col="event_id", limit=20,
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "In(event_id" in plan, plan  # the IN reaches PushedFilters
    langs = {
        r["lang"]
        for r in docs.filter(F.col("doc_id").isin([3, 7, 11])).collect()
    }
    pick = sorted(langs)[0]
    both = get_documents(
        docs, ("lang",), f"lang = '{pick}'", ids=[7, 3, 11],
        fields=("doc_id", "lang"), limit=20,
    ).collect()
    assert all(r["lang"] == pick and r["doc_id"] in (3, 7, 11) for r in both)
    with _pytest.raises(ValueError, match="non-empty"):
        get_documents(docs, ids=[])


def test_similar_documents_ivf_stored_layout_honors_filter(spark, emb):
    """Regression: with a precomputed `assigned` layout (the production
    path that bypasses ivf_topk's emb argument), filter_docs must still
    restrict the candidates."""
    from meilibridge_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        similar_documents,
    )

    cents = ivf_centroids(emb, 4)
    assigned = emb.join(ivf_assign(emb, cents), "vec_id")
    allowed = emb.select("vec_id").filter(F.col("vec_id") % 2 == 0)
    hits = similar_documents(
        emb, [3], k=10, method="ivf", n_probe=4,
        centroids=cents, assigned=assigned, filter_docs=allowed,
    ).collect()
    assert hits and all(r["vec_id"] % 2 == 0 for r in hits)
    # and matches the exact path under the same filter at full probe
    exact = similar_documents(emb, [3], k=10, filter_docs=allowed).collect()
    assert [(r["vec_id"], r["cos"]) for r in hits] == [
        (r["vec_id"], r["cos"]) for r in exact
    ]


def test_star_components_match_label_prop(spark):
    """Round-4: large-star/small-star == label propagation on mixed
    component shapes (chain, pair, star, singleton-free)."""
    from meilibridge_spark.operators.dedup import dedup_clusters

    edges = [
        (11, 10), (11, 12), (12, 13), (13, 14),
        (20, 21), (30, 31), (30, 32), (32, 33),
    ]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    lp = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, algorithm="label_prop").collect()
    }
    st = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, algorithm="star").collect()
    }
    assert st == lp
    with pytest.raises(ValueError, match="algorithm"):
        dedup_clusters(pairs, algorithm="bfs")


def test_star_components_deep_chain_logarithmic(spark):
    """A 40-edge chain (diameter 40): label propagation cannot finish
    in 10 rounds (rounds needed = diameter) while the star alternation
    converges within 10 (O(log diameter)) — the deep-component case the
    star variant exists for."""
    from meilibridge_spark.operators.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(40)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup_clusters(pairs, max_iter=10, algorithm="label_prop")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(
            pairs, max_iter=10, algorithm="star"
        ).collect()
    }
    assert len(got) == 41 and set(got.values()) == {0}


def test_facet_distribution_exhaustive(spark):
    """Meilisearch-exact facetDistribution: counts over ALL docs
    matching >=1 query term (not a top-k page), filter composes,
    empty/stop-word query returns an empty frame."""
    from meilibridge_spark.config import ASCII_TOKEN_PATTERN, AnalyzerConfig, IndexConfig
    from meilibridge_spark.operators.relational import (
        facet_distribution_exhaustive,
    )
    from meilibridge_spark.plans.build import build_index
    from pyspark.sql import functions as F

    rows = [
        (0, "spark join", "en"),
        (1, "spark only", "en"),
        (2, "join order", "de"),
        (3, "nothing here", "fr"),
        (4, "spark spark spark", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cfg = IndexConfig(
        index_name="fx",
        primary_key=("doc_id",),
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
    )
    idx = build_index(df, cfg, doc_id_col="doc_id")
    got = {
        (r["facet"], r["value"]): r["count"]
        for r in facet_distribution_exhaustive(idx, "spark join", ["lang"]).collect()
    }
    # matching docs = {0, 1, 2, 4} regardless of any top-k cap
    assert got == {("lang", "en"): 2, ("lang", "de"): 2}
    filt = df.filter(F.col("lang") == "de").select("doc_id")
    got_f = {
        (r["facet"], r["value"]): r["count"]
        for r in facet_distribution_exhaustive(
            idx, "spark join", ["lang"], filter_docs=filt
        ).collect()
    }
    assert got_f == {("lang", "de"): 2}
    assert (
        facet_distribution_exhaustive(idx, "zzz", ["lang"]).count() == 0
    )
