"""API keys + tenant tokens (Meilisearch ``/keys`` endpoint and
multitenancy tenant-token analogs).

The reference only EVER authenticates with a single configured key
(``APIKey`` in config/type.go:35, passed via ``WithAPIKey`` in
pkg/meilisearch/meilisearch.go:37) — key management and tenant tokens
live in the engine it talks to. This module implements that engine
surface natively, faithful to the documented Meilisearch mechanics
and pure stdlib (hmac/hashlib/base64/json):

- **Key store** (``KeyStore``): CRUD over API keys with the endpoint's
  shape — ``actions`` (e.g. ``["search"]`` or ``["*"]``), ``indexes``
  (uids or ``["*"]``, trailing-``*`` patterns supported like
  Meilisearch), ``expiresAt``. The key VALUE is derived
  ``HMAC-SHA256(master_key, uid)`` so regenerating from the stored uid
  is possible and the store never persists secrets — the same
  derivation Meilisearch uses to rebuild keys from the master key.
  Commits are atomic (``os.replace``, the manifest pattern).

- **Tenant tokens**: real HS256 JWTs (Meilisearch tenant tokens ARE
  HS256 JWTs signed with an API key): header/payload base64url,
  payload ``{apiKeyUid, searchRules, exp}``. ``searchRules`` maps
  index uids (or ``"*"``) to ``{"filter": <Meilisearch filter
  string>}`` — the filter is FORCED onto every search made with the
  token, the multitenancy row-security mechanism.

- **Enforcement** (``token_search_filter``): verify signature against
  the stored key (constant-time compare), check token and key expiry,
  check the key allows the index and the ``search`` action, resolve
  the index's rule, and return the forced filter — callers AND it
  with the user filter (``compose_filters``) before
  ``functions/filters.filter_doc_ids``.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import time
import uuid


class AuthError(Exception):
    """invalid_api_key / tenant-token verification failures."""


#: the endpoint's action identifiers we recognize (engine-relevant
#: subset; '*' matches all)
KNOWN_ACTIONS = frozenset(
    {
        "*",
        "search",
        "documents.add",
        "documents.get",
        "documents.delete",
        "indexes.create",
        "indexes.get",
        "indexes.update",
        "indexes.delete",
        "indexes.swap",
        "tasks.get",
        "tasks.cancel",
        "tasks.delete",
        "settings.get",
        "settings.update",
        "stats.get",
        "dumps.create",
        "snapshots.create",
        "version",
        "keys.get",
        "keys.create",
        "keys.update",
        "keys.delete",
    }
)


def derive_key(master_key: str, uid: str) -> str:
    """Key value = HMAC-SHA256(master_key, uid), hex — recoverable
    from the stored uid + the master key, never persisted."""
    return hmac.new(
        master_key.encode(), uid.encode(), hashlib.sha256
    ).hexdigest()


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_dec(s: str) -> bytes:
    pad = -len(s) % 4
    return base64.urlsafe_b64decode(s + "=" * pad)


def _now() -> float:
    return time.time()


class KeyStore:
    """``/keys`` endpoint analog over one JSON file (atomic commits).

    The file stores key METADATA only (uid, scopes, timestamps); the
    key values derive from the master key on demand."""

    def __init__(self, path: str, master_key: str):
        if not master_key or len(master_key) < 16:
            # Meilisearch refuses master keys under 16 bytes
            raise AuthError("master_key must be at least 16 characters")
        self.path = path
        self.master_key = master_key

    # -- storage ------------------------------------------------------
    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {"keys": []}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, data: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)  # atomic commit point

    # -- CRUD ---------------------------------------------------------
    def create_key(
        self,
        actions: "list[str]",
        indexes: "list[str]",
        expires_at: "float | None" = None,
        name: "str | None" = None,
        description: "str | None" = None,
        uid: "str | None" = None,
    ) -> dict:
        """POST /keys analog -> the key object (with its derived
        ``key`` value). ``expires_at``: unix seconds or None (never —
        the endpoint's ``"expiresAt": null``)."""
        if not actions:
            raise AuthError("actions must be a non-empty list")
        unknown = [a for a in actions if a not in KNOWN_ACTIONS]
        if unknown:
            raise AuthError(f"unknown actions: {unknown}")
        if not indexes:
            raise AuthError("indexes must be a non-empty list")
        for pat in indexes:
            if pat != "*" and pat.count("*") > (
                1 if pat.endswith("*") else 0
            ):
                raise AuthError(
                    f"index pattern {pat!r} invalid: '*' is only allowed "
                    "alone or trailing (Meilisearch key index patterns)"
                )
        uid = uid or str(uuid.uuid4())
        data = self._read()
        if any(k["uid"] == uid for k in data["keys"]):
            raise AuthError(f"key uid {uid!r} already exists")
        entry = {
            "uid": uid,
            "actions": list(actions),
            "indexes": list(indexes),
            "expiresAt": expires_at,
            "name": name,
            "description": description,
            "createdAt": _now(),
        }
        data["keys"].append(entry)
        self._write(data)
        return {**entry, "key": derive_key(self.master_key, uid)}

    def get_key(self, uid: str) -> dict:
        for k in self._read()["keys"]:
            if k["uid"] == uid:
                return {**k, "key": derive_key(self.master_key, uid)}
        raise AuthError(f"no API key with uid {uid!r}")  # api_key_not_found

    def list_keys(self) -> "list[dict]":
        return [
            {**k, "key": derive_key(self.master_key, k["uid"])}
            for k in self._read()["keys"]
        ]

    def delete_key(self, uid: str) -> None:
        data = self._read()
        kept = [k for k in data["keys"] if k["uid"] != uid]
        if len(kept) == len(data["keys"]):
            raise AuthError(f"no API key with uid {uid!r}")
        data["keys"] = kept
        self._write(data)

    # -- checks -------------------------------------------------------
    def check_key(self, uid: str, action: str, index_uid: str) -> dict:
        """The per-request authorization Meilisearch applies: the key
        exists, is not expired, allows ``action`` and ``index_uid``."""
        k = self.get_key(uid)
        if k["expiresAt"] is not None and _now() >= k["expiresAt"]:
            raise AuthError(f"API key {uid!r} is expired")
        if "*" not in k["actions"] and action not in k["actions"]:
            raise AuthError(
                f"API key {uid!r} does not allow action {action!r}"
            )
        if not any(_index_match(pat, index_uid) for pat in k["indexes"]):
            raise AuthError(
                f"API key {uid!r} does not allow index {index_uid!r}"
            )
        return k


def _index_match(pattern: str, uid: str) -> bool:
    if pattern == "*":
        return True
    if pattern.endswith("*"):
        return uid.startswith(pattern[:-1])
    return uid == pattern


# -- tenant tokens (HS256 JWT) ---------------------------------------

_JWT_HEADER = {"alg": "HS256", "typ": "JWT"}


def _sign(msg: bytes, key: str) -> str:
    return _b64url(hmac.new(key.encode(), msg, hashlib.sha256).digest())


def generate_tenant_token(
    api_key_uid: str,
    api_key: str,
    search_rules: dict,
    expires_at: "float | None" = None,
) -> str:
    """Sign a tenant token exactly as a Meilisearch SDK does: an HS256
    JWT over ``{apiKeyUid, searchRules[, exp]}`` with the API key as
    the secret. ``search_rules``: {index_uid_or_"*": {"filter": str}
    or None} — None/{} means unrestricted access to that index."""
    if not isinstance(search_rules, dict) or not search_rules:
        raise AuthError("searchRules must be a non-empty dict")
    for uid, rule in search_rules.items():
        if rule is not None and not isinstance(rule, dict):
            raise AuthError(
                f"searchRules[{uid!r}] must be a dict or None"
            )
    payload = {"apiKeyUid": api_key_uid, "searchRules": search_rules}
    if expires_at is not None:
        payload["exp"] = int(expires_at)
    head = _b64url(
        json.dumps(_JWT_HEADER, separators=(",", ":")).encode()
    )
    body = _b64url(
        json.dumps(payload, separators=(",", ":"), sort_keys=True).encode()
    )
    msg = f"{head}.{body}".encode()
    return f"{head}.{body}.{_sign(msg, api_key)}"


def verify_tenant_token(token: str, store: KeyStore) -> dict:
    """Verify signature (constant-time), token expiry, and the signing
    key's own validity -> the payload dict. Every failure raises
    AuthError (the endpoint's 403 invalid_api_key /
    tenant-token errors)."""
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthError("malformed tenant token (not a JWT)")
    head, body, sig = parts
    try:
        payload = json.loads(_b64url_dec(body))
        header = json.loads(_b64url_dec(head))
    except Exception as e:  # noqa: BLE001 — any decode failure is a 403
        raise AuthError(f"malformed tenant token: {e}") from e
    if header.get("alg") != "HS256":
        raise AuthError(f"unsupported JWT alg {header.get('alg')!r}")
    uid = payload.get("apiKeyUid")
    if not uid:
        raise AuthError("tenant token payload lacks apiKeyUid")
    k = store.get_key(uid)  # raises if the key was deleted
    expect = _sign(f"{head}.{body}".encode(), k["key"])
    if not hmac.compare_digest(expect, sig):
        raise AuthError("tenant token signature mismatch")
    if "exp" in payload and _now() >= payload["exp"]:
        raise AuthError("tenant token is expired")
    if k["expiresAt"] is not None and _now() >= k["expiresAt"]:
        raise AuthError(f"signing API key {uid!r} is expired")
    return payload


def token_search_filter(
    token: str, store: KeyStore, index_uid: str
) -> "str | None":
    """Full per-search enforcement: verify the token, authorize the
    signing key for (``search``, ``index_uid``), resolve the index's
    search rule -> the FORCED filter string (None = rule without a
    filter). Raises AuthError when the rules grant no access to the
    index."""
    payload = verify_tenant_token(token, store)
    store.check_key(payload["apiKeyUid"], "search", index_uid)
    rules = payload.get("searchRules") or {}
    rule = None
    if index_uid in rules:
        rule = rules[index_uid]
    elif "*" in rules:
        rule = rules["*"]
    else:
        matched = [
            p for p in rules
            if p.endswith("*") and _index_match(p, index_uid)
        ]
        if matched:
            rule = rules[max(matched, key=len)]
        else:
            raise AuthError(
                f"tenant token grants no access to index {index_uid!r}"
            )
    return (rule or {}).get("filter")


def compose_filters(
    forced: "str | None", user: "str | None"
) -> "str | None":
    """AND the tenant token's forced filter with the request's own —
    the token filter can only ever NARROW results."""
    if forced and user:
        return f"({forced}) AND ({user})"
    return forced or user
