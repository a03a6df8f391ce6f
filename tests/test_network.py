"""v1.13 network analog: sources/network.py registry (PATCH /network
semantics) + operators/federation.network_federated_search fan-out
over shared-storage instance roots with per-remote error capture."""

import pytest

from meilibridge_spark.config import IndexConfig
from meilibridge_spark.operators.federation import (
    federated_search,
    network_federated_search,
)
from meilibridge_spark.plans.build import build_and_save
from meilibridge_spark.sources.network import get_network, set_network
from meilibridge_spark.sources.transcripts import generate_transcripts


def test_registry_patch_semantics(tmp_index_dir):
    d = tmp_index_dir
    assert get_network(d) == {"self": None, "remotes": {}}
    set_network(d, self_name="ms-0", remotes={"ms-1": {"root": "/data/ms1"}})
    set_network(d, remotes={"ms-2": {"root": "/data/ms2"}})
    net = get_network(d)
    assert net["self"] == "ms-0"
    assert set(net["remotes"]) == {"ms-1", "ms-2"}
    # null-delete form + self preserved
    set_network(d, remotes={"ms-1": None})
    assert set(get_network(d)["remotes"]) == {"ms-2"}
    assert get_network(d)["self"] == "ms-0"
    with pytest.raises(ValueError, match="non-empty string"):
        set_network(d, self_name="")
    with pytest.raises(ValueError, match="instance root"):
        set_network(d, remotes={"bad": {"url": "http://x"}})
    with pytest.raises(ValueError, match="slash-free"):
        set_network(d, remotes={"a/b": {"root": "/data/x"}})


@pytest.fixture(scope="module")
def roots(spark, tmp_path_factory):
    local = str(tmp_path_factory.mktemp("net_local"))
    remote = str(tmp_path_factory.mktemp("net_remote"))
    a = build_and_save(
        spark,
        generate_transcripts(spark, n_convs=8, seed=31),
        IndexConfig(index_name="alpha"),
        f"{local}/alpha",
    )
    b = build_and_save(
        spark,
        generate_transcripts(spark, n_convs=8, seed=32),
        IndexConfig(index_name="beta"),
        f"{remote}/beta",
    )
    set_network(local, self_name="ms-0", remotes={"ms-1": {"root": remote}})
    return local, remote, a, b


def test_network_search_matches_local_federation(spark, roots):
    local, _remote, a, b = roots
    hits, errs = network_federated_search(
        spark,
        local,
        "baba cedi",
        [
            {"indexUid": "alpha"},  # remote omitted = self
            {"indexUid": "beta", "remote": "ms-1", "weight": 2.0},
        ],
        k=10,
    )
    assert errs == {}
    rows = hits.collect()
    assert rows and {r["remote"] for r in rows} <= {"ms-0", "ms-1"}
    # parity with the in-memory federation over the same indexes
    want = federated_search(
        [("ms-0/alpha", a, 1.0), ("ms-1/beta", b, 2.0)], "baba cedi", 10
    ).collect()
    got = [
        (r["remote"] + "/" + r["index_uid"], r["doc_id"],
         round(r["weighted_ranking_score"], 9))
        for r in rows
    ]
    assert got == [
        (r["index_uid"], r["doc_id"], round(r["weighted_ranking_score"], 9))
        for r in want
    ]


def test_network_search_partial_failure(spark, roots):
    local, _remote, _a, _b = roots
    hits, errs = network_federated_search(
        spark,
        local,
        "baba",
        [
            {"indexUid": "alpha", "remote": "ms-0"},  # self by name
            {"indexUid": "missing", "remote": "ms-1"},
            {"indexUid": "beta", "remote": "ghost"},
        ],
        k=5,
    )
    # the resolvable target still answers; both failures are reported
    assert hits.count() > 0
    assert set(errs) == {"ms-1/missing", "ghost/beta"}
    assert "not in the network" in errs["ghost/beta"]["message"]
    # all-fail: empty hits with the full schema, errors per target
    empty, errs2 = network_federated_search(
        spark, local, "baba", [{"indexUid": "nope", "remote": "ms-1"}]
    )
    assert empty.count() == 0 and len(empty.columns) == 6
    assert set(errs2) == {"ms-1/nope"}
