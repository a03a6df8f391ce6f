"""Task journal (/tasks API analog, sources/tasks.py): lifecycle
transitions, Meilisearch-shaped records, filtered/keyset listing,
cancelation rules, the WaitForTask barrier (the reference waits on a
task after every write: pkg/meilisearch/meilisearch.go:30), and the
engine integration (build/compact/dump/swap each journal one task)."""

import concurrent.futures
import os

import pytest

from meilibridge_spark.sources import tasks as T


def test_lifecycle_shape(tmp_index_dir):
    rec = T.submit_task(
        tmp_index_dir, "documentAdditionOrUpdate", index_uid="idx",
        details={"receivedDocuments": 3},
    )
    assert rec["uid"] == 0 and rec["status"] == "enqueued"
    assert set(rec) == {
        "uid", "batchUid", "indexUid", "status", "type", "details",
        "error", "duration", "enqueuedAt", "startedAt", "finishedAt",
    }
    T._transition(tmp_index_dir, 0, "processing")
    got = T.get_task(tmp_index_dir, 0)
    assert got["status"] == "processing" and got["startedAt"] is not None
    T._transition(tmp_index_dir, 0, "succeeded",
                  details={"indexedDocuments": 3}, started_monotonic=0.0)
    got = T.get_task(tmp_index_dir, 0)
    assert got["status"] == "succeeded"
    assert got["details"] == {"receivedDocuments": 3, "indexedDocuments": 3}
    assert got["finishedAt"] is not None
    assert got["duration"].startswith("PT") and got["duration"].endswith("S")


def test_terminal_is_final(tmp_index_dir):
    rec = T.submit_task(tmp_index_dir, "settingsUpdate")
    T._transition(tmp_index_dir, rec["uid"], "succeeded")
    with pytest.raises(ValueError, match="terminal"):
        T._transition(tmp_index_dir, rec["uid"], "processing")


def test_unknown_type_and_uid(tmp_index_dir):
    with pytest.raises(ValueError, match="unknown task type"):
        T.submit_task(tmp_index_dir, "nonsense")
    with pytest.raises(KeyError):
        T.get_task(tmp_index_dir, 99)


def test_task_scope_success_and_failure(tmp_index_dir):
    with T.task_scope(tmp_index_dir, "dumpCreation", index_uid="i") as t:
        t["details"] = {"dumpUid": "d1"}
    ok = T.get_task(tmp_index_dir, t["uid"])
    assert ok["status"] == "succeeded" and ok["details"] == {"dumpUid": "d1"}

    with pytest.raises(RuntimeError):
        with T.task_scope(tmp_index_dir, "indexSwap") as t2:
            raise RuntimeError("boom")
    bad = T.get_task(tmp_index_dir, t2["uid"])
    assert bad["status"] == "failed"
    assert bad["error"] == {"message": "RuntimeError: boom"}


def test_get_tasks_filters_and_keyset_pagination(tmp_index_dir):
    for i in range(7):
        rec = T.submit_task(
            tmp_index_dir, "documentAdditionOrUpdate",
            index_uid=f"idx{i % 2}",
        )
        if i % 2 == 0:
            T._transition(tmp_index_dir, rec["uid"], "succeeded")
    page1 = T.get_tasks(tmp_index_dir, limit=3)
    assert [r["uid"] for r in page1["results"]] == [6, 5, 4]  # newest first
    assert page1["total"] == 7 and page1["from"] == 6 and page1["next"] == 3
    page2 = T.get_tasks(tmp_index_dir, from_uid=page1["next"], limit=3)
    assert [r["uid"] for r in page2["results"]] == [3, 2, 1]
    page3 = T.get_tasks(tmp_index_dir, from_uid=page2["next"], limit=3)
    assert [r["uid"] for r in page3["results"]] == [0]
    assert page3["next"] is None

    done = T.get_tasks(tmp_index_dir, statuses=["succeeded"])
    assert [r["uid"] for r in done["results"]] == [6, 4, 2, 0]
    by_idx = T.get_tasks(tmp_index_dir, index_uids=["idx1"])
    assert [r["uid"] for r in by_idx["results"]] == [5, 3, 1]
    assert T.get_tasks(tmp_index_dir, types=["indexSwap"])["total"] == 0


def test_cancel_only_enqueued(tmp_index_dir):
    a = T.submit_task(tmp_index_dir, "documentAdditionOrUpdate")
    b = T.submit_task(tmp_index_dir, "documentAdditionOrUpdate")
    T._transition(tmp_index_dir, b["uid"], "processing")
    out = T.cancel_tasks(tmp_index_dir, [a["uid"], b["uid"], 42])
    assert out["canceled_uids"] == [a["uid"]]
    assert T.get_task(tmp_index_dir, a["uid"])["status"] == "canceled"
    assert T.get_task(tmp_index_dir, b["uid"])["status"] == "processing"
    assert out["task"]["type"] == "taskCancelation"
    assert out["task"]["details"]["matchedTasks"] == 3
    assert out["task"]["details"]["canceledTasks"] == 1


def test_wait_for_task(tmp_index_dir):
    rec = T.submit_task(tmp_index_dir, "settingsUpdate")
    with pytest.raises(TimeoutError):
        T.wait_for_task(tmp_index_dir, rec["uid"], timeout=0.15)
    T._transition(tmp_index_dir, rec["uid"], "succeeded")
    assert T.wait_for_task(tmp_index_dir, rec["uid"])["status"] == "succeeded"


def test_concurrent_submits_get_unique_uids(tmp_index_dir):
    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        uids = [
            f.result()["uid"]
            for f in [
                ex.submit(T.submit_task, tmp_index_dir, "settingsUpdate")
                for _ in range(24)
            ]
        ]
    assert sorted(uids) == list(range(24))


def test_batches_grouping_and_stats(tmp_index_dir):
    """GET /batches analog: singleton batches by default; task_batch
    groups tasks submitted in its context; stats aggregate per batch."""
    a = T.submit_task(tmp_index_dir, "settingsUpdate", index_uid="i1")
    with T.task_batch(tmp_index_dir) as b:
        t1 = T.submit_task(tmp_index_dir, "documentAdditionOrUpdate",
                           index_uid="i1")
        t2 = T.submit_task(tmp_index_dir, "dumpImport", index_uid="i1")
    c = T.submit_task(tmp_index_dir, "settingsUpdate", index_uid="i2")
    assert a["batchUid"] == 0
    assert t1["batchUid"] == t2["batchUid"] == b["uid"] == 1
    assert c["batchUid"] == 2

    out = T.get_batches(tmp_index_dir)
    assert out["total"] == 3
    assert [x["uid"] for x in out["results"]] == [2, 1, 0]
    grouped = out["results"][1]
    assert grouped["stats"]["totalNbTasks"] == 2
    assert grouped["stats"]["types"] == {
        "documentAdditionOrUpdate": 1, "dumpImport": 1,
    }
    assert grouped["stats"]["indexUids"] == {"i1": 2}
    assert grouped["progress"] == {"finished": 0, "total": 2}
    assert grouped["finishedAt"] is None  # non-terminal tasks

    T._transition(tmp_index_dir, t1["uid"], "succeeded")
    T._transition(tmp_index_dir, t2["uid"], "failed", error="x")
    done = next(
        x for x in T.get_batches(tmp_index_dir)["results"] if x["uid"] == 1
    )
    assert done["progress"] is None and done["finishedAt"] is not None
    assert done["stats"]["status"] == {"succeeded": 1, "failed": 1}

    page = T.get_batches(tmp_index_dir, limit=2)
    assert page["next"] == 0
    assert [x["uid"] for x in T.get_batches(
        tmp_index_dir, from_uid=page["next"], limit=2)["results"]] == [0]


def test_build_and_dump_journal_tasks(spark, tmp_index_dir):
    """Engine integration: a full build journals one succeeded
    documentAdditionOrUpdate; dump export journals dumpCreation on the
    source; import journals dumpImport (after its own build task) on
    the target."""
    from meilibridge_spark.config import IndexConfig
    from meilibridge_spark.plans.build import build_and_save
    from meilibridge_spark.sources.dumps import create_dump_from_dir, import_dump
    from meilibridge_spark.sources.transcripts import generate_transcripts

    src_dir = os.path.join(tmp_index_dir, "src")
    dump_dir = os.path.join(tmp_index_dir, "dump")
    dst_dir = os.path.join(tmp_index_dir, "dst")
    sdf = generate_transcripts(spark, n_convs=6, seed=3)
    idx = build_and_save(spark, sdf, IndexConfig(index_name="t"), src_dir)

    built = T.get_tasks(src_dir, types=["documentAdditionOrUpdate"])
    assert built["total"] == 1
    rec = built["results"][0]
    assert rec["status"] == "succeeded" and rec["indexUid"] == "t"
    assert rec["details"]["indexedDocuments"] == idx.n_docs
    assert rec["details"]["snapshotId"] == 1

    create_dump_from_dir(spark, src_dir, dump_dir)
    dc = T.get_tasks(src_dir, types=["dumpCreation"])
    assert dc["total"] == 1 and dc["results"][0]["status"] == "succeeded"
    assert dc["results"][0]["details"]["dumpUid"] == "dump"

    import_dump(spark, dump_dir, dst_dir)
    di = T.get_tasks(dst_dir)
    assert [r["type"] for r in di["results"]] == [
        "dumpImport", "documentAdditionOrUpdate",
    ]
    assert all(r["status"] == "succeeded" for r in di["results"])
    # the import's two tasks are ONE batch (/batches analog)
    assert di["results"][0]["batchUid"] == di["results"][1]["batchUid"]
    ib = T.get_batches(dst_dir)
    assert ib["total"] == 1
    assert ib["results"][0]["stats"]["totalNbTasks"] == 2


def test_delete_only_finished(tmp_index_dir):
    """POST /tasks/delete analog: finished tasks delete (folded out of
    get_task / get_tasks / get_batches), enqueued+processing refuse,
    the operation journals a taskDeletion with endpoint-shaped
    details, and a second delete of the same uid is a no-op."""
    a = T.submit_task(tmp_index_dir, "documentAdditionOrUpdate")
    T._transition(tmp_index_dir, a["uid"], "processing")
    T._transition(tmp_index_dir, a["uid"], "succeeded")
    b = T.submit_task(tmp_index_dir, "settingsUpdate")  # enqueued
    c = T.submit_task(tmp_index_dir, "documentDeletion")
    T._transition(tmp_index_dir, c["uid"], "processing")  # processing
    out = T.delete_tasks(tmp_index_dir, [a["uid"], b["uid"], c["uid"], 42])
    assert out["deleted_uids"] == [a["uid"]]
    assert out["task"]["type"] == "taskDeletion"
    assert out["task"]["details"]["matchedTasks"] == 4
    assert out["task"]["details"]["deletedTasks"] == 1
    with pytest.raises(KeyError):
        T.get_task(tmp_index_dir, a["uid"])
    listed = {r["uid"] for r in T.get_tasks(tmp_index_dir, limit=50)["results"]}
    assert a["uid"] not in listed
    assert {b["uid"], c["uid"], out["task"]["uid"]} <= listed
    # batches fold the deleted task out of their stats: the only
    # documentAdditionOrUpdate task was a, so no batch counts that type
    batches = T.get_batches(tmp_index_dir, limit=50)["results"]
    assert all(
        "documentAdditionOrUpdate" not in bt["stats"]["types"]
        for bt in batches
    )
    assert sum(bt["stats"]["totalNbTasks"] for bt in batches) == len(listed)
    # idempotent: already-deleted uid no longer matches
    again = T.delete_tasks(tmp_index_dir, [a["uid"]])
    assert again["deleted_uids"] == []
