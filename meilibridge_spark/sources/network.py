"""Instance network registry — the Meilisearch v1.13 ``/network``
analog (experimental "sharding"/remote federated search).

Meilisearch's network object names this instance (``self``) and its
peers (``remotes: {name: {url, searchApiKey}}``); federated searches
can then target ``{indexUid, federationOptions: {remote}}`` and the
instance fans out, merging hits by weighted ranking score and
reporting per-remote failures in ``remoteErrors`` instead of failing
the whole request.

The analog replaces the HTTP remote with SHARED STORAGE — each remote
is an instance ROOT directory (the ``list_indexes`` layout) on a
filesystem every Spark executor can read (S3/HDFS in production;
that's how a Spark deployment actually shares indexes — the socket is
the part this engine records as a non-goal, the fan-out/merge/error
semantics are the part that matters and they are implemented in
``operators/federation.network_federated_search``).

Registry file: ``{root}/network.json`` — fcntl-locked read-modify-
write with an ``os.replace`` commit (the keys/webhooks pattern).
``set_network`` has PATCH semantics like the endpoint: ``self`` and
individual remotes merge; a remote mapped to ``None`` is removed
(Meilisearch's ``null`` delete form).
"""

from __future__ import annotations

import json
import os

from meilibridge_spark.sources.tasks import _locked

NETWORK_FILE = "network.json"


def _path(root: str) -> str:
    return os.path.join(root, NETWORK_FILE)


def get_network(root: str) -> dict:
    """``GET /network`` analog -> {"self": name | None, "remotes":
    {name: {"root": path}}} (empty defaults when never set)."""
    path = _path(root)
    if not os.path.exists(path):
        return {"self": None, "remotes": {}}
    with open(path) as f:
        return json.load(f)


def set_network(
    root: str,
    self_name: "str | None" = None,
    remotes: "dict[str, dict | None] | None" = None,
) -> dict:
    """``PATCH /network`` analog: merge ``self_name`` and ``remotes``
    into the stored network. Remote values are ``{"root": path}``
    (path = that instance's index root on shared storage); ``None``
    removes the named remote. Returns the updated network."""
    with _locked(root):
        net = get_network(root)
        if self_name is not None:
            if not isinstance(self_name, str) or not self_name:
                raise ValueError(
                    f"self must be a non-empty string, got {self_name!r}"
                )
            net["self"] = self_name
        for name, spec in (remotes or {}).items():
            if not isinstance(name, str) or not name or "/" in name:
                # '/' is the hit-label separator (remote/indexUid in
                # network_federated_search) — like Meilisearch uids,
                # remote names are slash-free identifiers
                raise ValueError(
                    f"remote names must be non-empty and slash-free, "
                    f"got {name!r}"
                )
            if spec is None:
                net["remotes"].pop(name, None)
                continue
            if (
                not isinstance(spec, dict)
                or not isinstance(spec.get("root"), str)
                or not spec["root"]
            ):
                raise ValueError(
                    f"remote {name!r} must be {{'root': <instance root "
                    f"path>}}, got {spec!r}"
                )
            net["remotes"][name] = {"root": spec["root"]}
        tmp = _path(root) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(net, f, sort_keys=True, indent=1)
        os.replace(tmp, _path(root))  # atomic commit point
    return net
