"""Webhook registry + delivery journal (sources/webhooks.py — the
Meilisearch v1.12 /webhooks analog): CRUD round trip, immutable
config-defined hooks, and per-terminal-task delivery fan-out riding
the tasks journal."""

import pytest

from meilibridge_spark.sources import webhooks as wh
from meilibridge_spark.sources.tasks import (
    cancel_tasks,
    get_task,
    submit_task,
    task_scope,
)


def test_registry_crud(tmp_index_dir):
    d = tmp_index_dir
    assert wh.list_webhooks(d) == []
    a = wh.create_webhook(d, "https://example.test/hook-a")
    b = wh.create_webhook(
        d, "https://example.test/hook-b", headers={"authorization": "Bearer x"}
    )
    assert len(wh.list_webhooks(d)) == 2
    assert wh.get_webhook(d, a["uuid"])["url"].endswith("hook-a")
    upd = wh.update_webhook(d, b["uuid"], url="https://example.test/b2")
    assert upd["url"].endswith("/b2")
    assert upd["headers"] == {"authorization": "Bearer x"}
    wh.delete_webhook(d, a["uuid"])
    assert [h["uuid"] for h in wh.list_webhooks(d)] == [b["uuid"]]
    with pytest.raises(KeyError):
        wh.get_webhook(d, a["uuid"])
    with pytest.raises(ValueError, match="non-empty string"):
        wh.create_webhook(d, "")
    with pytest.raises(ValueError, match="strings to strings"):
        wh.create_webhook(d, "https://x.test", headers={"k": 1})


def test_registry_survives_index_recreate(spark, tmp_index_dir):
    """Webhooks are instance-level config in Meilisearch: recreating
    or deleting the index must not unregister them (delete_index
    exempts the registry + delivery journal from the wipe), and the
    build task's terminal transition delivers to hooks registered
    BEFORE the recreate."""
    from meilibridge_spark.config import IndexConfig
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.tables import delete_index
    from meilibridge_spark.sources.transcripts import generate_transcripts

    d = tmp_index_dir
    hook = wh.create_webhook(d, "https://ops.test/tasks")
    src = generate_transcripts(spark, n_convs=4, seed=11)
    build_and_save(spark, src, IndexConfig(index_name="w"), d)  # recreate=True
    assert [h["uuid"] for h in wh.list_webhooks(d)] == [hook["uuid"]]
    dels = wh.get_deliveries(d, hook["uuid"])
    assert [r["task"]["type"] for r in dels] == ["documentAdditionOrUpdate"]
    assert dels[0]["task"]["status"] == "succeeded"
    delete_index(d)
    assert [h["uuid"] for h in wh.list_webhooks(d)] == [hook["uuid"]]
    delete_index(d, keep_instance_files=False)
    assert wh.list_webhooks(d) == []


def test_config_webhook_immutable(tmp_index_dir):
    d = tmp_index_dir
    cfg_hook = wh.register_config_webhook(d, "https://ops.test/tasks")
    assert cfg_hook["isEditable"] is False
    with pytest.raises(ValueError, match="not editable"):
        wh.update_webhook(d, cfg_hook["uuid"], url="https://x.test")
    with pytest.raises(ValueError, match="not editable"):
        wh.delete_webhook(d, cfg_hook["uuid"])


def test_terminal_tasks_fan_out_deliveries(tmp_index_dir):
    d = tmp_index_dir
    # no registry -> no deliveries written at all
    with task_scope(d, "indexCreation", index_uid="t"):
        pass
    assert wh.get_deliveries(d) == []

    h1 = wh.create_webhook(d, "https://example.test/1")
    h2 = wh.create_webhook(d, "https://example.test/2")
    with task_scope(d, "settingsUpdate", index_uid="t") as scope:
        scope["details"]["changed"] = ["rankingRules"]
    ok_uid = scope["uid"]
    with pytest.raises(RuntimeError):
        with task_scope(d, "documentDeletion", index_uid="t"):
            raise RuntimeError("boom")

    dels = wh.get_deliveries(d)
    # 2 hooks x 2 terminal transitions, in journal order
    assert len(dels) == 4
    assert [r["task"]["status"] for r in dels] == [
        "succeeded", "succeeded", "failed", "failed",
    ]
    assert dels[0]["task"]["uid"] == ok_uid
    assert dels[0]["task"]["details"] == {"changed": ["rankingRules"]}
    assert dels[2]["task"]["error"]["message"].startswith("RuntimeError")
    assert {r["webhookUuid"] for r in dels[:2]} == {h1["uuid"], h2["uuid"]}
    # per-hook filter
    assert len(wh.get_deliveries(d, h1["uuid"])) == 2

    # canceled tasks deliver too (both the canceled task and the
    # taskCancelation task itself reach terminal states)
    pending = submit_task(d, "documentAdditionOrUpdate", index_uid="t")
    cancel_tasks(d, [pending["uid"]])
    assert get_task(d, pending["uid"])["status"] == "canceled"
    statuses = [r["task"]["status"] for r in wh.get_deliveries(d)]
    assert statuses.count("canceled") == 2  # 2 hooks x 1 canceled task
    cancelation = [
        r for r in wh.get_deliveries(d)
        if r["task"]["type"] == "taskCancelation"
    ]
    assert len(cancelation) == 2 and all(
        r["task"]["status"] == "succeeded" for r in cancelation
    )
