"""Meilisearch v1.12 granular ``filterableAttributes``
(``IndexConfig.filterable_attribute_rules``): attributePatterns with
trailing-``*`` wildcards, per-attribute feature flags gating filter
operator families (equality vs comparison) and the facet-search
endpoint, the endpoint's mixed-list parsing with its defaults, the
settings surface, and end-to-end enforcement through filter_doc_ids."""

import dataclasses

import pytest

from meilibridge_spark.config import ConfigError, IndexConfig
from meilibridge_spark.functions.filters import parse_filter

FILTERABLE = ("lang",)
RULES = (
    # stars: comparison only (ranges fine, equality banned)
    (("stars",), False, False, True),
    # tag* wildcard: equality only, facet-searchable
    (("tag*",), True, True, False),
)


def _cfg(**kw):
    base = dict(
        index_name="t",
        filterable_attributes=FILTERABLE,
        filterable_attribute_rules=RULES,
    )
    base.update(kw)
    return IndexConfig(**base)


# --- config: validation, resolution, round-trip ---------------------

def test_rules_validation():
    _cfg().validate()
    with pytest.raises(ConfigError, match="4-tuples"):
        _cfg(filterable_attribute_rules=((("a",), True, True),)).validate()
    with pytest.raises(ConfigError, match="non-empty tuple"):
        _cfg(filterable_attribute_rules=(("a", True, True, True),)).validate()
    with pytest.raises(ConfigError, match="trailing wildcard"):
        _cfg(
            filterable_attribute_rules=((("a*b",), True, True, True),)
        ).validate()
    with pytest.raises(ConfigError, match="must be a bool"):
        _cfg(
            filterable_attribute_rules=((("a",), True, "yes", True),)
        ).validate()


def test_filter_features_resolution():
    cfg = _cfg()
    # plain string form grants everything
    assert cfg.filter_features("lang") == {
        "facet_search": True, "equality": True, "comparison": True,
    }
    assert cfg.filter_features("stars") == {
        "facet_search": False, "equality": False, "comparison": True,
    }
    # wildcard pattern matches any tag-prefixed attribute
    for a in ("tag", "tags", "tag_primary"):
        assert cfg.filter_features(a)["equality"] is True
    assert cfg.filter_features("other") is None
    # first matching rule wins (endpoint order sensitivity)
    dup = _cfg(
        filterable_attribute_rules=(
            (("x*",), False, True, False),
            (("x",), False, False, True),
        )
    )
    assert dup.filter_features("x")["equality"] is True
    # '*' alone matches everything
    star = _cfg(filterable_attribute_rules=((("*",), False, True, True),))
    assert star.filter_features("anything")["comparison"] is True


def test_rules_json_round_trip():
    cfg = _cfg()
    back = IndexConfig.from_json_dict(cfg.to_json_dict())
    assert back.filterable_attribute_rules == RULES
    assert back == cfg


def test_parse_filterable_setting_endpoint_defaults():
    plain, rules = IndexConfig.parse_filterable_setting([
        "author",
        {"attributePatterns": ["genre*"]},
        {
            "attributePatterns": ["year"],
            "features": {
                "facetSearch": True,
                "filter": {"equality": False, "comparison": True},
            },
        },
    ])
    assert plain == ("author",)
    # endpoint defaults: facetSearch=false, equality=true, comparison=false
    assert rules[0] == (("genre*",), False, True, False)
    assert rules[1] == (("year",), True, False, True)
    with pytest.raises(ConfigError, match="attributePatterns"):
        IndexConfig.parse_filterable_setting([{"features": {}}])
    # settings surface reproduces the endpoint's mixed shape
    cfg = _cfg(
        filterable_attributes=plain, filterable_attribute_rules=rules
    )
    surface = cfg.filterable_surface()
    assert surface[0] == "author"
    assert surface[1] == {
        "attributePatterns": ["genre*"],
        "features": {
            "facetSearch": False,
            "filter": {"equality": True, "comparison": False},
        },
    }


# --- parser: operator-family gating ---------------------------------

ROWS = [
    (0, "en", 5, "news"),
    (1, "de", 3, None),
    (2, "en", 1, "blog"),
]
SCHEMA = "doc_id long, lang string, stars int, tag string"


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _ids(df, expr, cfg):
    col = parse_filter(
        expr, tuple(cfg.filterable_attributes),
        features=cfg.filter_features,
    )
    return sorted(r["doc_id"] for r in df.filter(col).collect())


def test_comparison_only_attribute(df):
    cfg = _cfg()
    # stars: ranges and ordered comparisons allowed...
    assert _ids(df, "stars > 2", cfg) == [0, 1]
    assert _ids(df, "stars 1 TO 3", cfg) == [1, 2]
    # ...equality family banned
    for expr in ("stars = 3", "stars != 3", "stars IN [3, 5]",
                 "stars EXISTS", "stars IS NULL"):
        with pytest.raises(ConfigError, match="filter.equality=false"):
            _ids(df, expr, cfg)


def test_equality_only_attribute(df):
    cfg = _cfg()
    assert _ids(df, "tag = 'news'", cfg) == [0]
    assert _ids(df, "tag IN [news, blog]", cfg) == [0, 2]
    assert _ids(df, "tag NOT EXISTS", cfg) == [1]
    for expr in ("tag > 'a'", "tag 'a' TO 'z'"):
        with pytest.raises(ConfigError, match="filter.comparison=false"):
            _ids(df, expr, cfg)


def test_membership_via_features(df):
    cfg = _cfg()
    # plain-form attribute: every operator family still works
    assert _ids(df, "lang = 'en' AND lang > 'a'", cfg) == [0, 2]
    with pytest.raises(ConfigError, match="not filterable"):
        _ids(df, "missing = 1", cfg)


# --- facet-search per-attribute feature -----------------------------

def test_facet_search_feature_gate(spark):
    from pyspark.sql import functions as F

    from meilibridge_spark.operators.relational import facet_search

    docs = spark.range(4).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("tag"),
        F.lit(1).alias("stars"),
    )
    cfg = _cfg()
    # tag*: facetSearch=true -> serves
    assert facet_search(None, docs, "tag", cfg=cfg).count() == 1
    # stars: facetSearch=false -> loud endpoint error
    with pytest.raises(ConfigError, match="facetSearch=false"):
        facet_search(None, docs, "stars", cfg=cfg)
    # undeclared attribute stays usable as a bare primitive
    assert facet_search(None, docs.withColumn("z", F.lit("a")), "z",
                        cfg=cfg).count() == 1


# --- end-to-end: filter_doc_ids + settings surface ------------------

def test_filter_doc_ids_and_settings(spark, tmp_index_dir):
    from meilibridge_spark.functions.filters import filter_doc_ids
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import get_settings
    from meilibridge_spark.sources.transcripts import generate_transcripts

    cfg = IndexConfig(
        index_name="rules-e2e",
        filterable_attributes=("role",),
        filterable_attribute_rules=((("turn_idx",), False, False, True),),
    )
    src = generate_transcripts(spark, n_convs=6, seed=7)
    idx = build_and_save(spark, src, cfg, tmp_index_dir)
    # comparison-only turn_idx: range works, equality raises
    assert filter_doc_ids(idx, "turn_idx 0 TO 1").count() > 0
    with pytest.raises(ConfigError, match="filter.equality=false"):
        filter_doc_ids(idx, "turn_idx = 0")
    # plain-form role unaffected
    assert filter_doc_ids(idx, "role = 'user'").count() > 0
    s = get_settings(tmp_index_dir)
    assert {
        "attributePatterns": ["turn_idx"],
        "features": {
            "facetSearch": False,
            "filter": {"equality": False, "comparison": True},
        },
    } in s["filterableAttributes"]
    assert "role" in s["filterableAttributes"]
