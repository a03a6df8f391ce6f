"""Config-surface parity: the reference's table-driven config tests
(config/config_test.go) re-expressed for our IndexConfig /
parse_collection, plus prefix-search and facet-extension units."""

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    ConfigError,
    IndexConfig,
    parse_collection,
)


# --- Collection "col:view" parsing (mirrors config/config_test.go:375-442;
# deviations from the reference's silent-quirk behavior are intentional
# and documented on parse_collection)
@pytest.mark.parametrize(
    "spec,want",
    [
        ("users", ("users", None)),
        ("users:user_books", ("users", "user_books")),
        ("u", ("u", None)),
    ],
)
def test_parse_collection_ok(spec, want):
    assert parse_collection(spec) == want


@pytest.mark.parametrize(
    "spec",
    ["", "   ", ":", "users:", ":view", "a:b:c", "a::b"],
)
def test_parse_collection_rejects(spec):
    with pytest.raises(ConfigError):
        parse_collection(spec)


# --- IndexConfig validation matrix (config/config.go:26-115 semantics)
def test_validate_matrix():
    IndexConfig(index_name="ok", primary_key=("doc_id",)).validate()
    with pytest.raises(ConfigError, match="name"):
        IndexConfig(index_name="").validate()
    with pytest.raises(ConfigError, match="primary key"):
        IndexConfig(index_name="x", primary_key=()).validate()
    with pytest.raises(ConfigError, match="searchable"):
        IndexConfig(
            index_name="x", primary_key=("a",), searchable_attributes=()
        ).validate()
    with pytest.raises(ConfigError, match="dropped"):
        IndexConfig(
            index_name="x",
            primary_key=("doc_id",),
            fields=(("text", "body"),),
            searchable_attributes=("body",),
        ).validate()
    assert IndexConfig(index_name=" a b ").normalized_name() == "a-b"


# --- prefix expansion (Meilisearch last-word-prefix semantics)
DOCS = [
    (0, "joint venture agreement"),
    (1, "join the tables quickly"),
    (2, "joined forces yesterday"),
    (3, "journey to the west"),
    (4, "unrelated content here"),
]


@pytest.fixture(scope="module")
def idx(spark):
    from meilibridge_spark.plans.build import build_index

    cfg = IndexConfig(
        index_name="prefix",
        primary_key=("doc_id",),
        searchable_attributes=("text",),
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
    )
    return build_index(
        spark.createDataFrame(DOCS, "doc_id long, text string"),
        cfg,
        doc_id_col="doc_id",
    )


def test_prefix_expand(idx):
    from meilibridge_spark.operators.search import prefix_expand_terms

    got = prefix_expand_terms(idx, ["venture", "jo"])
    # lexicographic dictionary terms prefixed by 'jo'
    assert got == ["venture", "jo", "join", "joined", "joint", "journey"]
    # bounded
    got2 = prefix_expand_terms(idx, ["jo"], max_expansions=2)
    assert got2 == ["jo", "join", "joined"]
    # exact last word that IS a term: expansion still adds longer terms
    got3 = prefix_expand_terms(idx, ["join"])
    assert got3 == ["join", "joined", "joint"]


def test_search_prefix_hits(idx):
    from meilibridge_spark.operators.search import search_prefix

    hits = {r["doc_id"] for r in search_prefix(idx, "jo", 10).collect()}
    assert hits == {0, 1, 2, 3}
    assert search_prefix(idx, "zz", 10).count() == 0


def test_facet_distribution_and_stats(spark, idx):
    from pyspark.sql import functions as F

    from meilibridge_spark.operators.relational import (
        facet_distribution,
        facet_stats,
    )
    from meilibridge_spark.operators.search import search

    docs = idx.docs.withColumn("nlen", F.length("text"))
    hits = search(idx, "join joined joint journey", 10**6)
    dist = {
        (r["facet"], r["value"]): r["count"]
        for r in facet_distribution(hits, docs, ["doc_id"]).collect()
    }
    assert all(v == 1 for v in dist.values()) and len(dist) == 4
    stats = facet_stats(hits, docs, "nlen").collect()[0]
    assert stats["n_docs"] == 4
    assert stats["facet_min"] <= stats["facet_max"]
    # per-facet value cap
    capped = facet_distribution(hits, docs, ["doc_id"], max_values=2).collect()
    assert len(capped) == 2


def test_prefix_expand_with_colliding_query_terms(idx):
    from meilibridge_spark.operators.search import prefix_expand_terms

    # 'join' is both a query term and a prefix candidate of 'jo':
    # it must not consume an expansion slot
    got = prefix_expand_terms(idx, ["join", "jo"], max_expansions=3)
    assert got == ["join", "jo", "joined", "joint", "journey"]


def test_search_many_prefix_matches_single(idx):
    """search_many(prefix=True) is rank-identical to the single-path
    search_prefix per query; one prefix lookup job covers the batch."""
    from meilibridge_spark.operators.search import search_many, search_prefix

    batch = [("a", "venture jo"), ("b", "jo"), ("c", "join"), ("d", "zz")]
    rows = search_many(idx, batch, k=10, prefix=True).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    for qid, text in batch:
        single = [
            (i + 1, r["doc_id"], round(r["score"], 9))
            for i, r in enumerate(search_prefix(idx, text, 10).collect())
        ]
        assert sorted(by_q.get(qid, [])) == single, qid
    assert "d" not in by_q  # unindexed prefix -> no hits


def test_search_many_prefix_bounded_and_strategy(idx):
    from meilibridge_spark.operators.search import search_many

    # bounded expansions trim identically to the single path
    rows = search_many(
        idx, [("a", "jo")], k=10, prefix=True, prefix_max_expansions=2
    ).collect()
    # join(1), joined(2) only — journey(3) is beyond the bound
    assert {r["doc_id"] for r in rows} == {1, 2}
    # matching_strategy='all': the prefix candidates SATISFY the last
    # word's group, so 'venture jo' requires venture AND any jo*-term
    rows = search_many(
        idx, [("a", "venture jo")], k=10, prefix=True,
        matching_strategy="all",
    ).collect()
    assert {r["doc_id"] for r in rows} == {0}


# --- v1.12 index settings: prefixSearch / facetSearch ---------------

def test_prefix_search_disabled_is_exact_words(idx):
    """prefixSearch='disabled' (Meilisearch v1.12): prefix requests
    silently match exact words only — single and batch paths agree."""
    import dataclasses

    from meilibridge_spark.operators.search import (
        search,
        search_many,
        search_prefix,
    )

    off = dataclasses.replace(
        idx, cfg=dataclasses.replace(idx.cfg, prefix_search="disabled")
    )
    # 'jo' is not an indexed word: expansion off -> no hits
    assert search_prefix(off, "jo", 10).count() == 0
    assert search_many(off, [("a", "jo")], k=10, prefix=True).count() == 0
    # 'join' IS a word: exact matches only (no joined/joint riders)
    exact = [(r["doc_id"], round(r["score"], 9))
             for r in search(off, "join", 10).collect()]
    via_prefix = [(r["doc_id"], round(r["score"], 9))
                  for r in search_prefix(off, "join", 10).collect()]
    assert via_prefix == exact and {d for d, _ in exact} == {1}


def test_facet_search_disabled_raises(spark, idx):
    import dataclasses

    from meilibridge_spark.config import ConfigError
    from meilibridge_spark.operators.relational import facet_search

    docs = idx.docs.withColumn("lang", F.lit("EN"))
    # enabled (default) and cfg=None both serve
    assert facet_search(None, docs, "lang", cfg=idx.cfg).count() == 1
    assert facet_search(None, docs, "lang").count() == 1
    off = dataclasses.replace(idx.cfg, facet_search=False)
    with pytest.raises(ConfigError, match="facet search is disabled"):
        facet_search(None, docs, "lang", cfg=off)


def test_facet_search_sort_rule_from_settings_map(spark, idx):
    """facet_search resolves sortFacetValuesBy from the index settings'
    per-facet map when no explicit sort_by is passed: a facet with a
    'count' override orders facetHits count-desc; an unlisted facet
    uses the '*' default (alpha); an explicit sort_by always wins."""
    import dataclasses

    from meilibridge_spark.operators.relational import facet_search

    # 3 docs tagged B, 1 tagged A: alpha order = [A, B]; count = [B, A]
    docs = idx.docs.withColumn(
        "tag", F.when(F.col("doc_id") == 0, F.lit("A")).otherwise(F.lit("B"))
    )
    cfg = dataclasses.replace(
        idx.cfg,
        faceting_sort_by="alpha",
        faceting_sort_by_rules=(("tag", "count"),),
    )
    by_map = [r["value"] for r in facet_search(None, docs, "tag", cfg=cfg).collect()]
    assert by_map[0] == "B"  # count rule from the per-facet override
    # unlisted facet -> '*' default (alpha)
    docs2 = docs.withColumn("other", F.col("tag"))
    default = [
        r["value"] for r in facet_search(None, docs2, "other", cfg=cfg).collect()
    ]
    assert default == sorted(default)
    # explicit arg wins over the map
    explicit = [
        r["value"]
        for r in facet_search(None, docs, "tag", sort_by="alpha", cfg=cfg).collect()
    ]
    assert explicit == sorted(explicit)


def test_prefix_search_setting_validated_and_in_settings(spark, tmp_index_dir):
    from meilibridge_spark.config import ConfigError
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import get_settings

    with pytest.raises(ConfigError, match="prefix_search"):
        IndexConfig(index_name="x", prefix_search="never").validate()

    cfg = IndexConfig(
        index_name="s12", prefix_search="disabled", facet_search=False
    )
    sdf = spark.createDataFrame(
        [("c", 0, "hello world")], "conv_id string, turn_idx int, text string"
    )
    build_and_save(spark, sdf, cfg, tmp_index_dir)
    st = get_settings(tmp_index_dir)
    assert st["prefixSearch"] == "disabled"
    assert st["facetSearch"] is False


def test_faceting_settings(spark, idx):
    """faceting.sortFacetValuesBy='count' + maxValuesPerFacet cap in
    facet_distribution; validation; settings shape."""
    from meilibridge_spark.config import ConfigError
    from meilibridge_spark.operators.relational import facet_distribution

    docs = idx.docs.withColumn(
        "cat",
        F.when(F.col("doc_id") < 3, "hot").otherwise(
            F.concat(F.lit("v"), F.col("doc_id"))
        ),
    )
    hits = docs.select("doc_id")
    rows = facet_distribution(hits, docs, ["cat"], sort_by="count").collect()
    assert (rows[0]["value"], rows[0]["count"]) == ("hot", 3)
    assert [r["value"] for r in rows[1:]] == ["v3", "v4"]  # count ties: alpha
    capped = facet_distribution(
        hits, docs, ["cat"], sort_by="count", max_values=2
    ).collect()
    assert [(r["value"], r["count"]) for r in capped] == [
        ("hot", 3), ("v3", 1),
    ]
    with pytest.raises(ValueError, match="sort_by"):
        facet_distribution(hits, docs, ["cat"], sort_by="size")
    with pytest.raises(ConfigError, match="faceting_sort_by"):
        IndexConfig(index_name="x", faceting_sort_by="size").validate()
    with pytest.raises(ConfigError, match="faceting_max_values"):
        IndexConfig(index_name="x", faceting_max_values=0).validate()


def test_faceting_settings_in_get_settings(spark, tmp_index_dir):
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import get_settings

    cfg = IndexConfig(
        index_name="fct", faceting_max_values=7, faceting_sort_by="count"
    )
    sdf = spark.createDataFrame(
        [("c", 0, "hello world")], "conv_id string, turn_idx int, text string"
    )
    build_and_save(spark, sdf, cfg, tmp_index_dir)
    st = get_settings(tmp_index_dir)
    assert st["faceting"] == {
        "maxValuesPerFacet": 7, "sortFacetValuesBy": {"*": "count"},
    }


def test_facet_sort_by_rules_validation_and_map():
    import dataclasses

    from meilibridge_spark.config import ConfigError, IndexConfig

    base = IndexConfig(index_name="fsr")
    ok = dataclasses.replace(
        base, faceting_sort_by_rules=(("genres", "count"),)
    )
    ok.validate()
    assert ok.facet_sort_map() == {"*": "alpha", "genres": "count"}
    # JSON round-trip (asdict turns tuples into lists)
    back = IndexConfig.from_json_dict(ok.to_json_dict())
    assert back.faceting_sort_by_rules == (("genres", "count"),)
    with pytest.raises(ConfigError, match="alpha"):
        dataclasses.replace(
            base, faceting_sort_by_rules=(("genres", "size"),)
        ).validate()
    with pytest.raises(ConfigError, match="non-empty"):
        dataclasses.replace(
            base, faceting_sort_by_rules=(("*", "count"),)
        ).validate()
    with pytest.raises(ConfigError, match="duplicate"):
        dataclasses.replace(
            base,
            faceting_sort_by_rules=(("g", "count"), ("g", "alpha")),
        ).validate()


def test_facet_sort_by_rules_per_facet_order(spark, idx):
    """sortFacetValuesBy full map form: {'*': default, facet: rule} —
    one facet count-ordered, the sibling alpha-ordered, in ONE job
    (the rule is encoded in the window sort key)."""
    from pyspark.sql import functions as F

    from meilibridge_spark.operators.relational import facet_distribution
    from meilibridge_spark.operators.search import search

    docs = idx.docs.withColumn(
        "bucket", F.when(F.col("doc_id") < 3, "zz").otherwise("aa")
    ).withColumn("solo", F.col("doc_id").cast("string"))
    hits = search(idx, "join joined joint journey", 10**6)
    rows = facet_distribution(
        hits,
        docs,
        ["bucket", "solo"],
        sort_by={"*": "alpha", "bucket": "count"},
    ).collect()
    bucket = [
        (r["value"], r["count"]) for r in rows if r["facet"] == "bucket"
    ]
    # count-ordered: 'zz' (3 hits: docs 0,1,2) before 'aa' (1 hit)
    assert bucket == [("zz", 3), ("aa", 1)]
    solo = [r["value"] for r in rows if r["facet"] == "solo"]
    assert solo == sorted(solo)  # alpha default for the other facet
    # all-count and all-alpha map forms agree with the str forms
    for rule in ("alpha", "count"):
        a = facet_distribution(
            hits, docs, ["bucket", "solo"], sort_by=rule
        ).collect()
        b = facet_distribution(
            hits, docs, ["bucket", "solo"], sort_by={"*": rule}
        ).collect()
        assert a == b
    with pytest.raises(ValueError, match="alpha"):
        facet_distribution(
            hits, docs, ["bucket"], sort_by={"*": "size"}
        ).collect()


def test_facet_sort_by_rules_in_get_settings(spark, tmp_index_dir):
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import get_settings

    cfg = IndexConfig(
        index_name="fsr2",
        faceting_sort_by="count",
        faceting_sort_by_rules=(("role", "alpha"),),
    )
    sdf = spark.createDataFrame(
        [("c", 0, "hello world")], "conv_id string, turn_idx int, text string"
    )
    build_and_save(spark, sdf, cfg, tmp_index_dir)
    st = get_settings(tmp_index_dir)
    assert st["faceting"]["sortFacetValuesBy"] == {
        "*": "count", "role": "alpha",
    }


# --- embedders index setting (userProvided source) ---


def test_embedders_setting_validation():
    import dataclasses

    from meilibridge_spark.config import ConfigError, IndexConfig

    base = IndexConfig(index_name="emb")
    dataclasses.replace(base, embedders=(("default", 4),)).validate()
    with pytest.raises(ConfigError, match="duplicate embedder"):
        dataclasses.replace(
            base, embedders=(("a", 4), ("a", 8))
        ).validate()
    with pytest.raises(ConfigError, match="dimensions"):
        dataclasses.replace(base, embedders=(("a", 0),)).validate()
    with pytest.raises(ConfigError, match="non-empty"):
        dataclasses.replace(base, embedders=(("", 4),)).validate()


def test_embedders_json_round_trip():
    import dataclasses
    import json

    from meilibridge_spark.config import IndexConfig

    cfg = dataclasses.replace(
        IndexConfig(index_name="emb"),
        embedders=(("default", 3), ("other", 8)),
    )
    d = json.loads(json.dumps(cfg.to_json_dict()))
    assert IndexConfig.from_json_dict(d) == cfg


def test_validate_embedder_dims(spark):
    import dataclasses

    from meilibridge_spark.config import ConfigError, IndexConfig
    from meilibridge_spark.operators.similarity import (
        validate_embedder_dims,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [4.0, 5.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    base = IndexConfig(index_name="emb")
    # no declaration -> no-op
    assert validate_embedder_dims(emb, base) is None
    ok = dataclasses.replace(base, embedders=(("default", 3),))
    assert validate_embedder_dims(emb, ok) == 3
    bad = dataclasses.replace(base, embedders=(("default", 8),))
    with pytest.raises(ConfigError, match="dimensions mismatch"):
        validate_embedder_dims(emb, bad)
    with pytest.raises(ConfigError, match="unknown embedder"):
        validate_embedder_dims(emb, ok, embedder="nope")
    # ragged vectors contradict any declaration
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [4.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ConfigError, match="dimensions mismatch"):
        validate_embedder_dims(ragged, ok)


def test_embedders_in_get_settings(spark, tmp_index_dir):
    import dataclasses

    from meilibridge_spark.config import IndexConfig
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import get_settings
    from meilibridge_spark.sources.transcripts import generate_transcripts

    cfg = dataclasses.replace(
        IndexConfig(index_name="embset"),
        embedders=(("default", 3), ("bq", 3)),
        binary_quantized_embedders=("bq",),
    )
    src = generate_transcripts(spark, n_convs=4, seed=5)
    build_and_save(spark, src, cfg, tmp_index_dir)
    s = get_settings(tmp_index_dir)
    assert s["embedders"] == {
        "default": {
            "source": "userProvided",
            "dimensions": 3,
            "binaryQuantized": False,
        },
        "bq": {
            "source": "userProvided",
            "dimensions": 3,
            "binaryQuantized": True,
        },
    }


def test_search_cutoff_setting(spark, tmp_index_dir):
    """v1.10 searchCutoffMs: validated (positive int), stored per
    snapshot, reported by GET /settings (null default)."""
    from meilibridge_spark.config import ConfigError
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import get_settings

    with pytest.raises(ConfigError, match="search_cutoff_ms"):
        IndexConfig(index_name="x", search_cutoff_ms=0).validate()
    with pytest.raises(ConfigError, match="search_cutoff_ms"):
        IndexConfig(index_name="x", search_cutoff_ms=-5).validate()

    cfg = IndexConfig(index_name="cut", search_cutoff_ms=150)
    sdf = spark.createDataFrame(
        [("c", 0, "hello world")], "conv_id string, turn_idx int, text string"
    )
    build_and_save(spark, sdf, cfg, tmp_index_dir)
    assert get_settings(tmp_index_dir)["searchCutoffMs"] == 150
