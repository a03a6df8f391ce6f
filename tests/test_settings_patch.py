"""PATCH /settings analog (config.apply_settings_patch): partial
camelCase patches, null resets, reindex-required classification, and
unknown-key rejection. Pure config — no Spark."""

import pytest

from meilibridge_spark.config import (
    ConfigError,
    IndexConfig,
    apply_settings_patch,
)


def _cfg(**kw):
    base = dict(index_name="p", filterable_attributes=("lang",))
    base.update(kw)
    return IndexConfig(**base)


def test_query_time_patch_no_reindex():
    cfg = _cfg()
    new, reindex, changed = apply_settings_patch(cfg, {
        "rankingRules": ["words", "typo", "turn_idx:desc"],
        "sortableAttributes": ["turn_idx"],
        "distinctAttribute": "role",
        "synonyms": {"car": ["auto", "vehicle"]},
        "faceting": {
            "maxValuesPerFacet": 7,
            "sortFacetValuesBy": {"*": "alpha", "lang": "count"},
        },
        "pagination": {"maxTotalHits": 250},
        "typoTolerance": {
            "minWordSizeForTypos": {"oneTypo": 4},
            "disableOnNumbers": True,
        },
        "searchCutoffMs": 1500,
        "facetSearch": False,
    })
    assert reindex is False
    assert set(changed) == {
        "rankingRules", "sortableAttributes", "distinctAttribute",
        "synonyms", "faceting", "pagination", "typoTolerance",
        "searchCutoffMs", "facetSearch",
    }
    assert new.ranking_rules == ("words", "typo", "turn_idx:desc")
    assert new.analyzer.synonyms == (("car", ("auto", "vehicle")),)
    assert new.faceting_max_values == 7
    assert new.faceting_sort_by_rules == (("lang", "count"),)
    assert new.max_total_hits == 250
    assert new.typo.one_typo == 4 and new.typo.two_typos == 9
    assert new.typo.disable_on_numbers is True
    assert new.search_cutoff_ms == 1500 and new.facet_search is False
    # untouched settings preserved
    assert new.filterable_attributes == ("lang",)


def test_reindex_settings_flagged():
    cfg = _cfg()
    for patch in (
        {"searchableAttributes": ["role", "text"]},
        {"stopWords": ["the", "a"]},
        {"dictionary": ["new york"]},
        {"separatorTokens": ["||"]},
        {"nonSeparatorTokens": ["-"]},
    ):
        new, reindex, changed = apply_settings_patch(cfg, patch)
        assert reindex is True and len(changed) == 1
    # a no-op value does not flag a reindex
    new, reindex, changed = apply_settings_patch(cfg, {
        "searchableAttributes": ["text"],
    })
    assert reindex is False and changed == []


def test_null_resets_to_default():
    cfg = _cfg(
        ranking_rules=("words",),
        search_cutoff_ms=100,
        faceting_max_values=5,
    )
    new, reindex, changed = apply_settings_patch(cfg, {
        "rankingRules": None,
        "searchCutoffMs": None,
        "faceting": None,
        "filterableAttributes": None,
    })
    assert new.ranking_rules is None
    assert new.search_cutoff_ms is None
    assert new.faceting_max_values == 100
    assert new.filterable_attributes == ()
    assert reindex is False
    assert set(changed) == {
        "rankingRules", "searchCutoffMs", "faceting",
        "filterableAttributes",
    }


def test_filterable_mixed_and_embedders():
    cfg = _cfg()
    new, reindex, changed = apply_settings_patch(cfg, {
        "filterableAttributes": [
            "role",
            {"attributePatterns": ["turn*"],
             "features": {"filter": {"comparison": True}}},
        ],
        "embedders": {"default": {"dimensions": 16}},
    })
    assert reindex is False
    assert new.filterable_attributes == ("role",)
    assert new.filterable_attribute_rules == ((("turn*",), False, True, True),)
    assert new.embedders == (("default", 16),)
    # flipping binaryQuantized is one-way per build -> reindex
    new2, reindex2, _ = apply_settings_patch(new, {
        "embedders": {"default": {"dimensions": 16, "binaryQuantized": True}},
    })
    assert reindex2 is True
    assert new2.binary_quantized_embedders == ("default",)
    with pytest.raises(ConfigError, match="userProvided"):
        apply_settings_patch(cfg, {
            "embedders": {"e": {"source": "openAi", "dimensions": 2}},
        })


def test_unknown_key_and_validation():
    cfg = _cfg()
    with pytest.raises(ConfigError, match="unknown setting"):
        apply_settings_patch(cfg, {"vectorStore": True})
    with pytest.raises(ConfigError):
        apply_settings_patch(cfg, {"prefixSearch": "sometimes"})
    # patches validate as a whole (invalid combined state raises)
    with pytest.raises(ConfigError):
        apply_settings_patch(cfg, {
            "separatorTokens": ["-"], "nonSeparatorTokens": ["-"],
        })
