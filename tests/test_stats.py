"""GET /stats analogs (sources/tables.index_stats / instance_stats):
zero-Spark per-index + instance aggregates from manifest metrics and
the tasks journal."""

import os

import pytest

from meilibridge_spark.config import IndexConfig
from meilibridge_spark.plans.build import build_and_save
from meilibridge_spark.sources.tables import index_stats, instance_stats
from meilibridge_spark.sources.tasks import submit_task
from meilibridge_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stats_root")
    src = generate_transcripts(spark, n_convs=6, seed=21)
    a = build_and_save(
        spark, src, IndexConfig(index_name="alpha"), str(d / "alpha")
    )
    build_and_save(
        spark,
        generate_transcripts(spark, n_convs=3, seed=22),
        IndexConfig(index_name="beta"),
        str(d / "beta"),
    )
    os.makedirs(d / "not_an_index")
    return str(d), a.n_docs


def test_index_stats(root):
    d, n_docs = root
    s = index_stats(os.path.join(d, "alpha"))
    assert s["numberOfDocuments"] == n_docs
    assert s["isIndexing"] is False
    assert s["rawDocumentDbSize"] > 0
    assert s["avgDocumentSize"] == s["rawDocumentDbSize"] // n_docs
    assert s["snapshotId"] == 1
    # an enqueued task flips isIndexing until it terminates
    submit_task(os.path.join(d, "alpha"), "settingsUpdate", index_uid="alpha")
    assert index_stats(os.path.join(d, "alpha"))["isIndexing"] is True
    with pytest.raises(FileNotFoundError):
        index_stats(os.path.join(d, "not_an_index"))


def test_instance_stats(root):
    d, n_docs = root
    s = instance_stats(d)
    assert set(s["indexes"]) == {"alpha", "beta"}
    assert s["indexes"]["alpha"]["numberOfDocuments"] == n_docs
    assert s["databaseSize"] >= s["usedDatabaseSize"] > 0
    assert s["lastUpdate"] == max(
        v["updatedAt"] for v in s["indexes"].values()
    )
    assert instance_stats(os.path.join(d, "missing")) == {
        "databaseSize": 0,
        "usedDatabaseSize": 0,
        "lastUpdate": None,
        "indexes": {},
    }
