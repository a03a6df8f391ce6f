"""Task journal — the Meilisearch ``/tasks`` API analog.

Every index mutation in Meilisearch is an async task the client polls
(the reference waits on one after every write:
/root/reference/pkg/meilisearch/meilisearch.go:30 ``WaitForTask``, used
by CreateIndex/DeleteIndex/UpdateIndexSettings/document ops). This
engine's builds are Spark jobs, but the SAME observability surface
matters operationally: which build/CDC-commit/compaction/dump ran,
when, how long, did it fail and why — queryable across processes
(a monitor polls the journal while a spark-submit build writes it).

Design: an append-only JSONL journal ``{index_dir}/tasks.jsonl``.
Status transitions append a NEW record for the same uid; readers fold
by uid keeping the last record — no rewrite races, and the history of
every transition is preserved. Appends take an ``fcntl`` lock only to
allocate the next uid + append atomically (driver-side metadata, like
the manifest commit; never on the query path). Records use
Meilisearch's camelCase task shape: uid, indexUid, status, type,
details, error, duration, enqueuedAt, startedAt, finishedAt.

Statuses: enqueued -> processing -> succeeded | failed, plus canceled
(only an enqueued task can be canceled, matching Meilisearch's
``taskCancelation`` rules for non-processing tasks).
"""

from __future__ import annotations

import contextlib
import contextvars
import json
import os
import time

try:
    import fcntl
except ImportError:  # non-POSIX fallback: best-effort, no locking
    fcntl = None  # type: ignore[assignment]

TASKS_FILE = "tasks.jsonl"

#: Meilisearch task types this engine emits (plus documented custom
#: ones for engine-specific maintenance)
TASK_TYPES = (
    "indexCreation",
    "documentAdditionOrUpdate",
    "documentDeletion",
    "settingsUpdate",
    "dumpCreation",
    "dumpImport",  # custom: --import-dump has no task in Meilisearch
    "snapshotCompaction",  # custom: OPTIMIZE-style compaction
    "indexSwap",
    "taskCancelation",
    "taskDeletion",
)

_TERMINAL = frozenset({"succeeded", "failed", "canceled"})


def _path(index_dir: str) -> str:
    return os.path.join(index_dir, TASKS_FILE)


def _now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


@contextlib.contextmanager
def _locked(index_dir: str):
    os.makedirs(index_dir, exist_ok=True)
    lock_path = os.path.join(index_dir, ".tasks.lock")
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    try:
        if fcntl is not None:
            fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        if fcntl is not None:
            fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _read_raw(index_dir: str) -> "list[dict]":
    path = _path(index_dir)
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _fold(records: "list[dict]") -> "dict[int, dict]":
    """Last record per uid wins (journal order IS transition order)."""
    by_uid: "dict[int, dict]" = {}
    for r in records:
        by_uid[r["uid"]] = r
    return by_uid


def _live(index_dir: str) -> "dict[int, dict]":
    """Folded tasks minus the delete-marked ones (POST /tasks/delete
    analog: the journal is append-only, deletion is a folded marker)."""
    return {
        uid: rec
        for uid, rec in _fold(_read_raw(index_dir)).items()
        if not rec.get("deleted")
    }


def _append(index_dir: str, rec: dict) -> None:
    with open(_path(index_dir), "a") as f:
        f.write(json.dumps(rec, sort_keys=True) + "\n")


#: ambient batch grouping (``/batches`` analog): tasks submitted under
#: ``with task_batch(index_dir):`` share one batchUid — e.g. a dump
#: import's build task + dumpImport task are one batch. Outside a
#: batch every task is its own singleton batch, which is also what
#: Meilisearch does for tasks it processes alone.
_BATCH_CTX: "contextvars.ContextVar[dict | None]" = contextvars.ContextVar(
    "meilibridge_task_batch", default=None
)


@contextlib.contextmanager
def task_batch(index_dir: str):
    """Group every task submitted in this context (same ``index_dir``)
    into one batch. The batch uid is allocated lazily by the first
    task; yields the state dict whose ``"uid"`` carries it."""
    state: dict = {"dir": index_dir, "uid": None}
    tok = _BATCH_CTX.set(state)
    try:
        yield state
    finally:
        _BATCH_CTX.reset(tok)


def submit_task(
    index_dir: str,
    task_type: str,
    index_uid: "str | None" = None,
    details: "dict | None" = None,
) -> dict:
    """Append an ``enqueued`` task -> the task record (with its uid)."""
    if task_type not in TASK_TYPES:
        raise ValueError(
            f"unknown task type {task_type!r}; known: {TASK_TYPES}"
        )
    with _locked(index_dir):
        raw = _read_raw(index_dir)
        uid = max((r["uid"] for r in raw), default=-1) + 1
        ctx = _BATCH_CTX.get()
        if ctx is not None and ctx["dir"] == index_dir:
            if ctx["uid"] is None:
                ctx["uid"] = (
                    max((r.get("batchUid", -1) for r in raw), default=-1) + 1
                )
            batch_uid = ctx["uid"]
        else:
            batch_uid = (
                max((r.get("batchUid", -1) for r in raw), default=-1) + 1
            )
        rec = {
            "uid": uid,
            "batchUid": batch_uid,
            "indexUid": index_uid,
            "status": "enqueued",
            "type": task_type,
            "details": details or {},
            "error": None,
            "duration": None,
            "enqueuedAt": _now(),
            "startedAt": None,
            "finishedAt": None,
        }
        _append(index_dir, rec)
    return rec


def _transition(
    index_dir: str,
    uid: int,
    status: str,
    details: "dict | None" = None,
    error: "str | None" = None,
    started_monotonic: "float | None" = None,
) -> dict:
    with _locked(index_dir):
        cur = _fold(_read_raw(index_dir)).get(uid)
        if cur is None:
            raise KeyError(f"task uid {uid} not in {_path(index_dir)}")
        if cur["status"] in _TERMINAL:
            raise ValueError(
                f"task {uid} is already terminal ({cur['status']})"
            )
        rec = dict(cur)
        rec["status"] = status
        if details:
            rec["details"] = {**(rec["details"] or {}), **details}
        if status == "processing":
            rec["startedAt"] = _now()
        elif status in _TERMINAL:
            rec["finishedAt"] = _now()
            if started_monotonic is not None:
                rec["duration"] = f"PT{time.monotonic() - started_monotonic:.3f}S"
            if error is not None:
                rec["error"] = {"message": error}
        _append(index_dir, rec)
        if status in _TERMINAL:
            # /webhooks analog: every terminal task fans out one
            # delivery record per registered webhook, in journal order
            # (sources/webhooks.py; no-op without a registry)
            from meilibridge_spark.sources.webhooks import (
                deliver_terminal_task,
            )

            deliver_terminal_task(index_dir, rec)
    return rec


@contextlib.contextmanager
def task_scope(
    index_dir: str,
    task_type: str,
    index_uid: "str | None" = None,
    details: "dict | None" = None,
):
    """Record one synchronous engine operation as a full task
    lifecycle: enqueued+processing on entry; succeeded on clean exit
    (fold in any details the body set on the yielded dict under
    ``"details"``); failed (+re-raise) on exception."""
    rec = submit_task(index_dir, task_type, index_uid, details)
    t0 = time.monotonic()
    _transition(index_dir, rec["uid"], "processing")
    out: dict = {"uid": rec["uid"], "details": {}}
    try:
        yield out
    except BaseException as e:
        _transition(
            index_dir, rec["uid"], "failed",
            details=out["details"], error=f"{type(e).__name__}: {e}",
            started_monotonic=t0,
        )
        raise
    _transition(
        index_dir, rec["uid"], "succeeded",
        details=out["details"], started_monotonic=t0,
    )


def get_task(index_dir: str, uid: int) -> dict:
    rec = _live(index_dir).get(uid)
    if rec is None:
        raise KeyError(f"task uid {uid} not in {_path(index_dir)}")
    return rec


def get_tasks(
    index_dir: str,
    statuses: "list[str] | None" = None,
    types: "list[str] | None" = None,
    index_uids: "list[str] | None" = None,
    from_uid: "int | None" = None,
    limit: int = 20,
) -> dict:
    """``GET /tasks`` analog: newest-first folded tasks with
    Meilisearch's filter + keyset pagination semantics -> {results,
    total, limit, from, next} (``from`` = first uid returned, ``next``
    = pass as ``from_uid`` for the following page, None when done)."""
    folded = sorted(
        _live(index_dir).values(),
        key=lambda r: r["uid"],
        reverse=True,
    )
    if statuses:
        folded = [r for r in folded if r["status"] in statuses]
    if types:
        folded = [r for r in folded if r["type"] in types]
    if index_uids:
        folded = [r for r in folded if r["indexUid"] in index_uids]
    total = len(folded)
    if from_uid is not None:
        folded = [r for r in folded if r["uid"] <= from_uid]
    page = folded[:limit]
    nxt = folded[limit]["uid"] if len(folded) > limit else None
    return {
        "results": page,
        "total": total,
        "limit": limit,
        "from": page[0]["uid"] if page else None,
        "next": nxt,
    }


def _batch_of(tasks: "list[dict]") -> dict:
    """Aggregate one batch's folded tasks into the GET /batches shape."""
    statuses: "dict[str, int]" = {}
    types: "dict[str, int]" = {}
    index_uids: "dict[str, int]" = {}
    for t in tasks:
        statuses[t["status"]] = statuses.get(t["status"], 0) + 1
        types[t["type"]] = types.get(t["type"], 0) + 1
        if t["indexUid"]:
            index_uids[t["indexUid"]] = index_uids.get(t["indexUid"], 0) + 1
    started = [t["startedAt"] for t in tasks if t["startedAt"]]
    finished = [t["finishedAt"] for t in tasks if t["finishedAt"]]
    done = all(t["status"] in _TERMINAL for t in tasks)
    return {
        "uid": tasks[0]["batchUid"],
        "details": {k: v for t in tasks for k, v in (t["details"] or {}).items()},
        "stats": {
            "totalNbTasks": len(tasks),
            "status": statuses,
            "types": types,
            "indexUids": index_uids,
        },
        "startedAt": min(started) if started else None,
        "finishedAt": max(finished) if done and finished else None,
        "progress": None if done else {
            "finished": sum(
                1 for t in tasks if t["status"] in _TERMINAL
            ),
            "total": len(tasks),
        },
    }


def get_batches(
    index_dir: str, from_uid: "int | None" = None, limit: int = 20
) -> dict:
    """``GET /batches`` analog (Meilisearch v1.12): folded tasks
    grouped by batchUid, newest-first, keyset-paginated like
    get_tasks. Tasks journaled before the batchUid field existed fold
    into singleton batches keyed by their own uid."""
    folded = _live(index_dir).values()
    groups: "dict[int, list[dict]]" = {}
    for t in folded:
        groups.setdefault(t.get("batchUid", t["uid"]), []).append(t)
    for g in groups.values():
        for t in g:
            t.setdefault("batchUid", t["uid"])
    batches = sorted(
        (_batch_of(g) for g in groups.values()),
        key=lambda b: b["uid"],
        reverse=True,
    )
    total = len(batches)
    if from_uid is not None:
        batches = [b for b in batches if b["uid"] <= from_uid]
    page = batches[:limit]
    nxt = batches[limit]["uid"] if len(batches) > limit else None
    return {
        "results": page,
        "total": total,
        "limit": limit,
        "from": page[0]["uid"] if page else None,
        "next": nxt,
    }


def wait_for_task(
    index_dir: str, uid: int, timeout: float = 60.0, interval: float = 0.05
) -> dict:
    """``WaitForTask`` analog (the reference's post-write barrier):
    poll the journal until the task reaches a terminal status. Works
    across processes — the journal is the coordination point."""
    deadline = time.monotonic() + timeout
    while True:
        rec = get_task(index_dir, uid)
        if rec["status"] in _TERMINAL:
            return rec
        if time.monotonic() >= deadline:
            raise TimeoutError(
                f"task {uid} still {rec['status']} after {timeout}s"
            )
        time.sleep(interval)


def cancel_tasks(index_dir: str, uids: "list[int]") -> dict:
    """``POST /tasks/cancel`` analog: cancel the given tasks where
    still cancelable (enqueued — a processing Spark job can't be
    revoked through a journal), recording a ``taskCancelation`` task
    whose details carry matched/canceled counts like Meilisearch."""
    canceled = []
    with _locked(index_dir):
        folded = _fold(_read_raw(index_dir))
        for uid in uids:
            cur = folded.get(uid)
            if cur is not None and cur["status"] == "enqueued":
                rec = dict(cur)
                rec["status"] = "canceled"
                rec["finishedAt"] = _now()
                _append(index_dir, rec)
                from meilibridge_spark.sources.webhooks import (
                    deliver_terminal_task,
                )

                deliver_terminal_task(index_dir, rec)
                canceled.append(uid)
    cancel_rec = submit_task(
        index_dir,
        "taskCancelation",
        details={
            "matchedTasks": len(uids),
            "canceledTasks": len(canceled),
            "originalFilter": f"uids={','.join(map(str, uids))}",
        },
    )
    _transition(index_dir, cancel_rec["uid"], "processing")
    rec = _transition(index_dir, cancel_rec["uid"], "succeeded")
    return {"task": rec, "canceled_uids": canceled}


def delete_tasks(index_dir: str, uids: "list[int]") -> dict:
    """``POST /tasks/delete`` analog: delete FINISHED tasks (succeeded /
    failed / canceled) — Meilisearch refuses to delete enqueued or
    processing tasks (cancel them first), and so does this. The
    append-only journal gets one delete-marker record per uid (folded
    out of every read path); the operation itself is journaled as a
    ``taskDeletion`` task whose details carry matched/deleted counts
    like the endpoint."""
    finished = {"succeeded", "failed", "canceled"}
    deleted: "list[int]" = []
    with _locked(index_dir):
        folded = _fold(_read_raw(index_dir))
        for uid in uids:
            cur = folded.get(uid)
            if (
                cur is not None
                and not cur.get("deleted")
                and cur["status"] in finished
            ):
                rec = dict(cur)
                rec["deleted"] = True
                _append(index_dir, rec)
                deleted.append(uid)
    del_task = submit_task(
        index_dir,
        "taskDeletion",
        details={
            "matchedTasks": len(uids),
            "deletedTasks": len(deleted),
            "originalFilter": f"uids={','.join(map(str, uids))}",
        },
    )
    _transition(index_dir, del_task["uid"], "processing")
    rec = _transition(index_dir, del_task["uid"], "succeeded")
    return {"task": rec, "deleted_uids": deleted}
