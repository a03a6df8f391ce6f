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


# --- end-to-end: settings-only snapshot commit ----------------------

def test_update_settings_commit(spark, tmp_index_dir):
    """update_settings writes a settings-only delta entry: query-time
    settings change at manifest speed, the parent's data bytes serve
    unchanged (search results identical), per-snapshot settings stay
    independent, and the reindex-required settings refuse the patch."""
    from meilibridge_spark.operators.search import search
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import (
        get_settings,
        index_stats,
        load_snapshot,
        update_settings,
    )
    from meilibridge_spark.sources.tasks import get_tasks
    from meilibridge_spark.sources.transcripts import generate_transcripts

    d = tmp_index_dir
    cfg = IndexConfig(index_name="su")
    idx = build_and_save(
        spark, generate_transcripts(spark, n_convs=8, seed=51), cfg, d
    )
    before = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(idx, "baba cedi", 5).collect()
    ]
    entry = update_settings(d, {
        "filterableAttributes": ["role"],
        "searchCutoffMs": 800,
    })
    assert entry["settings_only"] is True and entry["snapshot_id"] == 2
    assert entry["tables"] == {}
    # new entry answers the patched surface; snapshot 1 keeps its own
    s2 = get_settings(d)
    assert s2["filterableAttributes"] == ["role"]
    assert s2["searchCutoffMs"] == 800
    assert get_settings(d, snapshot_id=1)["filterableAttributes"] == []
    # the loaded index adopts the new settings, data identical
    idx2 = load_snapshot(spark, d, IndexConfig(index_name="su"))
    assert idx2.cfg.search_cutoff_ms == 800
    assert idx2.cfg.filterable_attributes == ("role",)
    after = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(idx2, "baba cedi", 5).collect()
    ]
    assert after == before
    # stats carry the parent's sizes; the task journal records it
    st = index_stats(d)
    assert st["numberOfDocuments"] == idx.n_docs
    assert st["rawDocumentDbSize"] > 0
    tasks = get_tasks(d, types=["settingsUpdate"])["results"]
    assert tasks and tasks[0]["status"] == "succeeded"
    assert tasks[0]["details"]["changed"] == [
        "filterableAttributes", "searchCutoffMs",
    ]
    # reindex-required settings refuse the in-place patch
    with pytest.raises(ConfigError, match="stored index bytes"):
        update_settings(d, {"stopWords": ["the"]})
    # a second patch chains on the first — rankingRules now change the
    # served ORDER (query-time semantics applied by the loaded index)
    update_settings(d, {
        "searchCutoffMs": None,
        "rankingRules": ["words", "sort", "turn_idx:desc"],
    })
    s3 = get_settings(d)
    assert s3["searchCutoffMs"] is None
    assert s3["filterableAttributes"] == ["role"]
    assert s3["rankingRules"] == ["words", "sort", "turn_idx:desc"]
    idx3 = load_snapshot(spark, d, IndexConfig(index_name="su"))
    assert idx3.cfg.search_cutoff_ms is None
    assert idx3.cfg.ranking_rules == ("words", "sort", "turn_idx:desc")
    # same doc set, rules-list order (turn_idx desc within word groups)
    ruled = search(idx3, "baba cedi", 5).collect()
    assert len(ruled) == len(before)
