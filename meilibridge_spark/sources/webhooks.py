"""Webhook registry + delivery journal — the Meilisearch v1.12+
``/webhooks`` API analog.

Meilisearch lets clients register webhook URLs; every task that
reaches a terminal status is POSTed (ndjson task payload) to each
registered webhook. The reference's own trigger path is the same
shape one level down: its webhook server enqueues incoming change
events for the bridge to process (S13,
/root/reference/pkg/bridge/queue.go:41-52).

Live HTTP serving is a recorded non-goal (COVERAGE.md) — the analog
keeps the API surface and the DELIVERY CONTRACT, not the socket:

- Registry: ``{index_dir}/webhooks.json`` — fcntl-locked read +
  ``os.replace`` atomic commit (the keys/aliases pattern). Entries use
  the endpoint's camelCase shape: uuid, url, headers, isEditable.
- Deliveries: ``{index_dir}/webhook_deliveries.jsonl`` — on every
  terminal task transition (succeeded/failed/canceled) the tasks
  journal appends ONE record per registered webhook holding the full
  task payload, the webhook uuid/url/headers, and a deliveredAt
  stamp, in journal order (written under the tasks lock). A real
  sender is a tail of this file — exactly how the reference drains
  its queue table; ``get_deliveries`` is the read API.

Webhooks registered here are ``isEditable: true``; ``register_config_
webhook`` creates the non-editable kind Meilisearch derives from
instance config (update/delete refuse them, matching the endpoint's
immutable_webhook errors).
"""

from __future__ import annotations

import json
import os
import uuid as _uuid

from meilibridge_spark.sources.tasks import _locked, _now

WEBHOOKS_FILE = "webhooks.json"
DELIVERIES_FILE = "webhook_deliveries.jsonl"


def _reg_path(index_dir: str) -> str:
    return os.path.join(index_dir, WEBHOOKS_FILE)


def _del_path(index_dir: str) -> str:
    return os.path.join(index_dir, DELIVERIES_FILE)


def _read_registry(index_dir: str) -> "list[dict]":
    path = _reg_path(index_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)["results"]


def _write_registry(index_dir: str, hooks: "list[dict]") -> None:
    path = _reg_path(index_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"results": hooks}, f, sort_keys=True, indent=1)
    os.replace(tmp, path)  # atomic commit point


def _validate(url, headers) -> "dict[str, str]":
    if not isinstance(url, str) or not url:
        # invalid_webhook_url analog
        raise ValueError(f"webhook url must be a non-empty string, got {url!r}")
    headers = dict(headers or {})
    for k, v in headers.items():
        if not isinstance(k, str) or not isinstance(v, str):
            raise ValueError(
                f"webhook headers must map strings to strings, got "
                f"{k!r}: {v!r}"
            )
    return headers


def create_webhook(
    index_dir: str,
    url: str,
    headers: "dict[str, str] | None" = None,
    _editable: bool = True,
) -> dict:
    """``POST /webhooks`` analog -> the created webhook record."""
    headers = _validate(url, headers)
    with _locked(index_dir):
        hooks = _read_registry(index_dir)
        rec = {
            "uuid": str(_uuid.uuid4()),
            "url": url,
            "headers": headers,
            "isEditable": _editable,
            "createdAt": _now(),
        }
        hooks.append(rec)
        _write_registry(index_dir, hooks)
    return rec


def register_config_webhook(
    index_dir: str, url: str, headers: "dict[str, str] | None" = None
) -> dict:
    """The instance-config webhook (Meilisearch's ``--task-webhook-url``
    flag): delivered to like any other but ``isEditable: false`` —
    update/delete through the API refuse it."""
    return create_webhook(index_dir, url, headers, _editable=False)


def list_webhooks(index_dir: str) -> "list[dict]":
    """``GET /webhooks`` analog."""
    return _read_registry(index_dir)


def get_webhook(index_dir: str, uuid: str) -> dict:
    for rec in _read_registry(index_dir):
        if rec["uuid"] == uuid:
            return rec
    raise KeyError(f"webhook {uuid} not in {_reg_path(index_dir)}")


def update_webhook(
    index_dir: str,
    uuid: str,
    url: "str | None" = None,
    headers: "dict[str, str] | None" = None,
) -> dict:
    """``PATCH /webhooks/{uuid}`` analog; refuses non-editable hooks
    (immutable_webhook)."""
    with _locked(index_dir):
        hooks = _read_registry(index_dir)
        for rec in hooks:
            if rec["uuid"] != uuid:
                continue
            if not rec["isEditable"]:
                raise ValueError(
                    f"webhook {uuid} is not editable (config-defined)"
                )
            if url is not None:
                _validate(url, None)
                rec["url"] = url
            if headers is not None:
                rec["headers"] = _validate(rec["url"], headers)
            _write_registry(index_dir, hooks)
            return rec
    raise KeyError(f"webhook {uuid} not in {_reg_path(index_dir)}")


def delete_webhook(index_dir: str, uuid: str) -> None:
    """``DELETE /webhooks/{uuid}`` analog; refuses non-editable hooks."""
    with _locked(index_dir):
        hooks = _read_registry(index_dir)
        for rec in hooks:
            if rec["uuid"] == uuid:
                if not rec["isEditable"]:
                    raise ValueError(
                        f"webhook {uuid} is not editable (config-defined)"
                    )
                hooks.remove(rec)
                _write_registry(index_dir, hooks)
                return
    raise KeyError(f"webhook {uuid} not in {_reg_path(index_dir)}")


def deliver_terminal_task(index_dir: str, task_rec: dict) -> int:
    """Append one delivery record per registered webhook for a task
    that just reached a terminal status -> number of deliveries.
    Called by the tasks journal UNDER ITS LOCK so delivery order
    matches journal order; a no-op with an empty registry (the common
    case costs one stat)."""
    hooks = _read_registry(index_dir)
    if not hooks:
        return 0
    with open(_del_path(index_dir), "a") as f:
        for h in hooks:
            f.write(json.dumps({
                "webhookUuid": h["uuid"],
                "url": h["url"],
                "headers": h["headers"],
                "task": task_rec,
                "deliveredAt": _now(),
            }, sort_keys=True) + "\n")
    return len(hooks)


def get_deliveries(
    index_dir: str, uuid: "str | None" = None
) -> "list[dict]":
    """Read the delivery journal (optionally one webhook's), in
    delivery order — what a real sender would have POSTed."""
    path = _del_path(index_dir)
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if uuid is None or rec["webhookUuid"] == uuid:
                out.append(rec)
    return out
