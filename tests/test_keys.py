"""API keys + tenant tokens (sources/keys.py): the Meilisearch /keys
and multitenancy tenant-token analogs.

Covers: key derivation/CRUD/expiry/scopes, index patterns, HS256 JWT
sign/verify (tamper, wrong key, expiry, deleted key), search-rule
resolution (exact uid, '*', trailing-'*', no-access), and the forced
filter composing with the user filter end-to-end in a real search.
"""

import os

import pytest

from meilibridge_spark.sources.keys import (
    AuthError,
    KeyStore,
    compose_filters,
    derive_key,
    generate_tenant_token,
    token_search_filter,
    verify_tenant_token,
)

MASTER = "correct-horse-battery-staple"


@pytest.fixture()
def store(tmp_path):
    return KeyStore(os.path.join(str(tmp_path), "keys.json"), MASTER)


def _mk(store, **kw):
    kw.setdefault("actions", ["search"])
    kw.setdefault("indexes", ["*"])
    return store.create_key(**kw)


def test_master_key_minimum_length(tmp_path):
    with pytest.raises(AuthError, match="16"):
        KeyStore(os.path.join(str(tmp_path), "k.json"), "short")


def test_key_crud_and_derivation(store):
    k = _mk(store, name="search key", uid="abc-123")
    assert k["key"] == derive_key(MASTER, "abc-123")
    got = store.get_key("abc-123")
    assert got["key"] == k["key"] and got["name"] == "search key"
    assert [x["uid"] for x in store.list_keys()] == ["abc-123"]
    with pytest.raises(AuthError, match="already exists"):
        _mk(store, uid="abc-123")
    store.delete_key("abc-123")
    with pytest.raises(AuthError, match="no API key"):
        store.get_key("abc-123")
    with pytest.raises(AuthError, match="no API key"):
        store.delete_key("abc-123")


def test_key_validation(store):
    with pytest.raises(AuthError, match="unknown actions"):
        _mk(store, actions=["launch.rockets"])
    with pytest.raises(AuthError, match="non-empty"):
        _mk(store, actions=[])
    with pytest.raises(AuthError, match="non-empty"):
        _mk(store, indexes=[])
    with pytest.raises(AuthError, match="pattern"):
        _mk(store, indexes=["a*b"])
    _mk(store, indexes=["movies-*"], uid="ok")  # trailing-* is fine


def test_check_key_scopes(store):
    _mk(store, actions=["search"], indexes=["movies-*", "books"], uid="k1")
    store.check_key("k1", "search", "movies-fr")
    store.check_key("k1", "search", "books")
    with pytest.raises(AuthError, match="does not allow index"):
        store.check_key("k1", "search", "music")
    with pytest.raises(AuthError, match="does not allow action"):
        store.check_key("k1", "documents.add", "books")
    _mk(store, actions=["*"], indexes=["*"], uid="admin")
    store.check_key("admin", "keys.create", "anything")
    _mk(store, uid="dead", expires_at=1.0)  # long past
    with pytest.raises(AuthError, match="expired"):
        store.check_key("dead", "search", "x")


def test_token_roundtrip_and_tamper(store):
    k = _mk(store, uid="t1")
    tok = generate_tenant_token(
        "t1", k["key"], {"docs": {"filter": "lang = 'en'"}}
    )
    payload = verify_tenant_token(tok, store)
    assert payload["searchRules"]["docs"]["filter"] == "lang = 'en'"
    # tamper with the payload -> signature mismatch
    h, b, s = tok.split(".")
    bad = ".".join([h, b[:-2] + ("AA" if b[-2:] != "AA" else "BB"), s])
    with pytest.raises(AuthError):
        verify_tenant_token(bad, store)
    # signed with the wrong key value
    tok2 = generate_tenant_token("t1", "not-the-key", {"docs": None})
    with pytest.raises(AuthError, match="signature"):
        verify_tenant_token(tok2, store)
    # deleted signing key invalidates every token it signed
    store.delete_key("t1")
    with pytest.raises(AuthError, match="no API key"):
        verify_tenant_token(tok, store)


def test_token_expiry(store):
    k = _mk(store, uid="t2")
    tok = generate_tenant_token("t2", k["key"], {"*": None}, expires_at=1.0)
    with pytest.raises(AuthError, match="expired"):
        verify_tenant_token(tok, store)
    # unexpired token but expired signing key
    k3 = _mk(store, uid="t3", expires_at=1.0)
    tok3 = generate_tenant_token("t3", k3["key"], {"*": None})
    with pytest.raises(AuthError, match="expired"):
        verify_tenant_token(tok3, store)


def test_search_rule_resolution(store):
    k = _mk(store, uid="r1")
    mk = lambda rules: generate_tenant_token("r1", k["key"], rules)  # noqa: E731
    assert (
        token_search_filter(
            mk({"docs": {"filter": "lang = 'en'"}}), store, "docs"
        )
        == "lang = 'en'"
    )
    assert token_search_filter(mk({"docs": None}), store, "docs") is None
    assert (
        token_search_filter(
            mk({"*": {"filter": "tenant = 42"}}), store, "docs"
        )
        == "tenant = 42"
    )
    # longest trailing-* pattern wins
    assert (
        token_search_filter(
            mk({"d*": {"filter": "a = 1"}, "doc*": {"filter": "b = 2"}}),
            store,
            "docs",
        )
        == "b = 2"
    )
    with pytest.raises(AuthError, match="no access"):
        token_search_filter(mk({"other": None}), store, "docs")
    # key scope still applies even when the rules would allow it
    k2 = _mk(store, uid="r2", indexes=["other"])
    tok = generate_tenant_token("r2", k2["key"], {"*": None})
    with pytest.raises(AuthError, match="does not allow index"):
        token_search_filter(tok, store, "docs")


def test_compose_filters():
    assert compose_filters("a = 1", "b = 2") == "(a = 1) AND (b = 2)"
    assert compose_filters("a = 1", None) == "a = 1"
    assert compose_filters(None, "b = 2") == "b = 2"
    assert compose_filters(None, None) is None


def test_keys_cli_roundtrip(tmp_path, capsys, monkeypatch):
    """jobs/keys.py: create -> token -> verify resolves the forced
    filter; delete -> verify rejects. Pure metadata, no Spark."""
    import json

    from meilibridge_spark.jobs import keys as keys_cli

    kf = os.path.join(str(tmp_path), "keys.json")

    def run(*argv):
        monkeypatch.setattr(
            "sys.argv", ["keys", *argv, "--keys-file", kf,
                         "--master-key", MASTER]
        )
        keys_cli.main()
        return json.loads(capsys.readouterr().out)

    created = run(
        "create", "--actions", "search", "--indexes", "doc*",
        "--uid", "cli-1", "--name", "cli key",
    )
    assert created["uid"] == "cli-1" and created["key"]
    assert [k["uid"] for k in run("list")] == ["cli-1"]
    tok = run(
        "token", "--uid", "cli-1", "--rules",
        '{"docs": {"filter": "lang = \'en\'"}}',
    )["token"]
    ver = run("verify", "--token", tok, "--index-uid", "docs")
    assert ver["forcedFilter"] == "lang = 'en'"
    assert ver["payload"]["apiKeyUid"] == "cli-1"
    run("delete", "--uid", "cli-1")
    with pytest.raises(SystemExit):
        run("verify", "--token", tok)
    with pytest.raises(SystemExit):  # bad rules JSON -> loud ap.error
        run("token", "--uid", "cli-1", "--rules", "{not json")


def test_forced_filter_search_end_to_end(spark, tmp_path, store):
    """A tenant token scoped to lang='en' narrows a real search exactly
    like writing the conjunction by hand — the multitenancy contract."""
    from meilibridge_spark.config import (
        ASCII_TOKEN_PATTERN,
        AnalyzerConfig,
        IndexConfig,
    )
    from meilibridge_spark.functions.filters import filter_doc_ids
    from meilibridge_spark.operators.search import search
    from meilibridge_spark.plans.build import build_index

    cfg = IndexConfig(
        index_name="docs",
        primary_key=("doc_id",),
        searchable_attributes=("text",),
        filterable_attributes=("lang", "stars"),
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
    )
    rows = [
        (0, "alpha beta", "en", 5),
        (1, "alpha beta", "de", 5),
        (2, "alpha beta", "en", 1),
        (3, "alpha beta", "fr", 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, stars int")
    idx = build_index(df, cfg, doc_id_col="doc_id")
    k = _mk(store, uid="s1")
    tok = generate_tenant_token(
        "s1", k["key"], {"docs": {"filter": "lang = 'en'"}}
    )
    forced = token_search_filter(tok, store, "docs")
    combined = compose_filters(forced, "stars >= 4")
    filt = filter_doc_ids(idx, combined)
    got = {r["doc_id"] for r in search(idx, "alpha", 10, filter_docs=filt).collect()}
    assert got == {0}  # en AND stars>=4
    # token alone (no user filter) -> all en docs
    filt2 = filter_doc_ids(idx, compose_filters(forced, None))
    got2 = {r["doc_id"] for r in search(idx, "alpha", 10, filter_docs=filt2).collect()}
    assert got2 == {0, 2}
