"""jobs/admin.py CLI (stats / webhooks / network analogs): argument
wiring and JSON output — pure metadata, no SparkSession."""

import json
import sys

from meilibridge_spark.jobs.admin import main


def _run(monkeypatch, capsys, argv):
    monkeypatch.setattr(sys, "argv", ["admin", *argv])
    main()
    return json.loads(capsys.readouterr().out.strip())


def test_webhooks_cli_round_trip(monkeypatch, capsys, tmp_index_dir):
    d = tmp_index_dir
    rec = _run(monkeypatch, capsys, [
        "webhooks", "create", "--index-dir", d,
        "--url", "https://x.test/h", "--header", "authorization=Bearer q",
    ])
    assert rec["headers"] == {"authorization": "Bearer q"}
    listed = _run(monkeypatch, capsys, ["webhooks", "list", "--index-dir", d])
    assert [h["uuid"] for h in listed["results"]] == [rec["uuid"]]
    upd = _run(monkeypatch, capsys, [
        "webhooks", "update", "--index-dir", d,
        "--uuid", rec["uuid"], "--url", "https://x.test/h2",
    ])
    assert upd["url"].endswith("/h2")
    _run(monkeypatch, capsys, [
        "webhooks", "delete", "--index-dir", d, "--uuid", rec["uuid"],
    ])
    assert _run(
        monkeypatch, capsys, ["webhooks", "list", "--index-dir", d]
    )["results"] == []
    assert _run(
        monkeypatch, capsys, ["webhooks", "deliveries", "--index-dir", d]
    )["results"] == []


def test_network_cli(monkeypatch, capsys, tmp_index_dir):
    d = tmp_index_dir
    net = _run(monkeypatch, capsys, [
        "network", "set", "--root", d, "--self", "ms-0",
        "--remote", f"ms-1={d}/other",
    ])
    assert net["self"] == "ms-0" and "ms-1" in net["remotes"]
    net = _run(monkeypatch, capsys, [
        "network", "set", "--root", d, "--remove-remote", "ms-1",
    ])
    assert net["remotes"] == {}
    assert _run(monkeypatch, capsys, ["network", "get", "--root", d]) == net


def test_stats_cli(monkeypatch, capsys, spark, tmp_index_dir):
    from meilibridge_spark.config import IndexConfig
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.transcripts import generate_transcripts
    import os

    d = tmp_index_dir
    idx = build_and_save(
        spark,
        generate_transcripts(spark, n_convs=3, seed=41),
        IndexConfig(index_name="s"),
        os.path.join(d, "s"),
    )
    one = _run(monkeypatch, capsys, [
        "stats", "--index-dir", os.path.join(d, "s"),
    ])
    assert one["numberOfDocuments"] == idx.n_docs
    allstats = _run(monkeypatch, capsys, ["stats", "--root", d])
    assert allstats["indexes"]["s"]["numberOfDocuments"] == idx.n_docs


def test_settings_cli(monkeypatch, capsys, spark, tmp_index_dir):
    from meilibridge_spark.config import IndexConfig
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.transcripts import generate_transcripts

    d = tmp_index_dir
    build_and_save(
        spark,
        generate_transcripts(spark, n_convs=3, seed=42),
        IndexConfig(index_name="sc"),
        d,
    )
    entry = _run(monkeypatch, capsys, [
        "settings", "patch", "--index-dir", d,
        "--json", '{"searchCutoffMs": 800, "facetSearch": false}',
    ])
    assert entry["settings_only"] is True
    got = _run(monkeypatch, capsys, ["settings", "get", "--index-dir", d])
    assert got["searchCutoffMs"] == 800 and got["facetSearch"] is False
