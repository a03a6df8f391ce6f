"""Dumps: portable export/import (Meilisearch POST /dumps and
--import-dump). A dump carries original documents + the full build
config and importing RE-INDEXES — the upgrade / cross-cluster
migration path, vs snapshots which carry engine-internal bytes.

Invariants tested:
- config JSON round-trip is lossless (every IndexConfig field);
- import(dump(index)) serves rank-identical results for every query
  class the source index served (typo, phrase, attrs, facets);
- per-turn text equality of the dumped documents vs the source table;
- vectors round-trip: the imported IVF layout probes identically;
- commit-marker semantics (no dump.json -> not a dump; import refuses
  a non-empty index_dir).
"""

import json
import os
import shutil
import tempfile

import pytest

from meilibridge_spark.config import AnalyzerConfig, IndexConfig, TypoToleranceConfig
from meilibridge_spark.operators.search import search
from meilibridge_spark.plans.build import build_and_save
from meilibridge_spark.sources.dumps import (
    create_dump,
    create_dump_from_dir,
    import_dump,
    read_dump_meta,
)
from meilibridge_spark.sources.tables import load_snapshot, save_vector_index
from meilibridge_spark.sources.transcripts import generate_transcripts

CFG = IndexConfig(
    index_name="dump src",
    analyzer=AnalyzerConfig.make(
        stop_words=["ba"], synonyms={"difo": ["digu"]}, dictionary=["babace"]
    ),
    typo=TypoToleranceConfig(one_typo=4, disable_on_numbers=True),
    filterable_attributes=("role",),
    sortable_attributes=("ts",),
    displayed_attributes=("conv_id", "turn_idx", "text"),
    filter_fold_case=True,
    words_ranking=True,
    k1=1.3,
    b=0.8,
)

QUERIES = ["baba", "baba cedi", "difo", "haki loba mune"]


def _hits(index, q):
    return [
        (r["doc_id"], r["score"])
        for r in search(index, q, 10).orderBy("doc_id").collect()
    ]


@pytest.fixture(scope="module")
def dirs():
    d = tempfile.mkdtemp(prefix="mbdump_")
    yield {
        "src": os.path.join(d, "src_index"),
        "dump": os.path.join(d, "dump"),
        "dst": os.path.join(d, "dst_index"),
    }
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def src_index(spark, dirs):
    sdf = generate_transcripts(spark, n_convs=30, seed=11)
    return build_and_save(
        spark, sdf, CFG, dirs["src"],
        with_positions=True, with_attributes=True, with_typos=True,
    )


def test_config_json_round_trip():
    d = json.loads(json.dumps(CFG.to_json_dict()))
    assert IndexConfig.from_json_dict(d) == CFG


def test_config_round_trip_defaults():
    cfg = IndexConfig(index_name="plain")
    d = json.loads(json.dumps(cfg.to_json_dict()))
    assert IndexConfig.from_json_dict(d) == cfg


def test_config_round_trip_separator_tokens():
    import dataclasses

    from meilibridge_spark.config import AnalyzerConfig

    cfg = dataclasses.replace(
        IndexConfig(index_name="sep"),
        analyzer=AnalyzerConfig.make(
            separator_tokens=("||", "-br-"), non_separator_tokens=("-", "@")
        ),
    )
    d = json.loads(json.dumps(cfg.to_json_dict()))
    assert IndexConfig.from_json_dict(d) == cfg


def test_dump_import_rank_identical(spark, dirs, src_index):
    meta = create_dump(src_index, dirs["dump"])
    assert meta["n_docs"] == src_index.n_docs
    assert meta["features"]["positions"] and meta["features"]["typos"]

    imported = import_dump(spark, dirs["dump"], dirs["dst"])
    assert imported.n_docs == src_index.n_docs
    assert imported.cfg == src_index.cfg
    for q in QUERIES:
        assert _hits(imported, q) == _hits(src_index, q), q


def test_dump_documents_text_equality(spark, dirs, src_index):
    """Per-turn text equality under stable (conv_id, turn_idx) order —
    the dump carries the ORIGINAL rows, no engine columns."""
    dumped = spark.read.parquet(os.path.join(dirs["dump"], "documents"))
    assert "doc_id" not in dumped.columns and "dl" not in dumped.columns
    src = generate_transcripts(spark, n_convs=30, seed=11)
    a = dumped.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
    b = src.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_imported_snapshot_reloads_and_serves(spark, dirs, src_index):
    """The import is a REAL committed index: a fresh load_snapshot of
    the target dir (new session-side state) serves the same results."""
    re = load_snapshot(spark, dirs["dst"], CFG)
    assert re.typos is not None and re.positions is not None
    for q in QUERIES:
        assert _hits(re, q) == _hits(src_index, q), q


def test_dump_from_dir_matches_live_dump(spark, dirs, src_index, tmp_index_dir):
    """POST /dumps analog dumps the STORED snapshot's own settings."""
    d2 = os.path.join(tmp_index_dir, "dump2")
    meta = create_dump_from_dir(spark, dirs["src"], d2)
    assert meta["config"] == src_index.cfg.to_json_dict()
    assert meta["n_docs"] == src_index.n_docs


def test_vectors_round_trip(spark, tmp_index_dir):
    from meilibridge_spark.operators.similarity import build_vector_index

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float((i * 7) % 5), 1.0]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    src_dir = os.path.join(tmp_index_dir, "v_src")
    dump_dir = os.path.join(tmp_index_dir, "v_dump")
    dst_dir = os.path.join(tmp_index_dir, "v_dst")

    sdf = generate_transcripts(spark, n_convs=8, seed=5)
    cfg = IndexConfig(index_name="vec dump")
    idx = build_and_save(spark, sdf, cfg, src_dir)
    vec = build_vector_index(emb, n_centroids=3, n_probe=2, train_iters=2)
    save_vector_index(vec, src_dir)

    meta = create_dump_from_dir(spark, src_dir, dump_dir)
    assert meta["features"]["vectors"] == {
        "id_col": "vec_id", "vec_col": "embedding",
        "n_centroids": 3, "n_probe": 2,
    }
    imported = import_dump(spark, dump_dir, dst_dir)
    iv = imported.vectors
    assert iv is not None
    assert (iv.n_centroids, iv.n_probe) == (3, 2)
    # every dumped embedding survives into the retrained layout
    # (assignment labels may differ in float-sum order across the
    # re-partitioned retrain; membership and serving quality may not)
    assert sorted(
        r["vec_id"] for r in iv.assigned.select("vec_id").collect()
    ) == list(range(24))
    # the imported layout at full probe serves EXACT top-k — the
    # recall contract the quantizer exists to trade against
    from meilibridge_spark.operators.similarity import cosine_topk, ivf_topk

    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.5]), (1, [0.0, 2.0, 1.0])],
        "query_id long, query_vec array<double>",
    )
    exact = cosine_topk(emb, queries, k=3)
    probed = ivf_topk(
        emb, queries, k=3, n_centroids=3, n_probe=3,
        centroids=iv.centroids, assigned=iv.assigned,
    )
    key = ["query_id", "vec_id", "cos"]
    assert sorted(map(tuple, probed.select(*key).collect())) == sorted(
        map(tuple, exact.select(*key).collect())
    )


def test_import_refuses_existing_index(spark, dirs, src_index):
    with pytest.raises(FileExistsError):
        import_dump(spark, dirs["dump"], dirs["src"])


def test_uncommitted_dump_is_not_a_dump(spark, tmp_index_dir):
    d = os.path.join(tmp_index_dir, "half_dump")
    os.makedirs(os.path.join(d, "documents"))
    with pytest.raises(FileNotFoundError):
        read_dump_meta(d)


def test_keys_ride_the_dump(spark, tmp_index_dir):
    """Meilisearch dumps carry the instance API keys: export with a
    KeyStore -> keys.json metadata in the dump (no secrets) -> import
    restores a fresh store whose key VALUES derive from the NEW
    instance's master key (regenerate-on-import)."""
    from meilibridge_spark.sources.keys import (
        AuthError,
        KeyStore,
        derive_key,
        generate_tenant_token,
        verify_tenant_token,
    )

    base = tempfile.mkdtemp(prefix="mbdumpkeys_")
    src_dir = os.path.join(base, "src")
    dump_dir = os.path.join(base, "dump")
    dst_dir = os.path.join(base, "dst")
    old_keys = os.path.join(base, "keys_old.json")
    new_keys = os.path.join(base, "keys_new.json")
    sdf = generate_transcripts(spark, n_convs=8, seed=11)
    cfg = IndexConfig(index_name="dumpkeys")
    idx = build_and_save(spark, sdf, cfg, src_dir)
    store = KeyStore(old_keys, "old-master-key-0123456")
    store.create_key(["search"], ["*"], uid="k1", name="search key")
    meta = create_dump(idx, dump_dir, keys_path=old_keys)
    assert meta["features"]["keys"] == 1
    assert os.path.exists(os.path.join(dump_dir, "keys.json"))
    # no secrets in the dump: the raw file carries metadata only
    dumped = json.load(open(os.path.join(dump_dir, "keys.json")))
    assert all("key" not in k for k in dumped["keys"])
    import_dump(spark, dump_dir, dst_dir, keys_path=new_keys)
    new_store = KeyStore(new_keys, "new-master-key-6543210")
    got = new_store.get_key("k1")
    assert got["name"] == "search key"
    assert got["key"] == derive_key("new-master-key-6543210", "k1")
    assert got["key"] != derive_key("old-master-key-0123456", "k1")
    # tokens signed against the NEW instance verify; OLD-instance
    # tokens do not (the key value rotated with the master key)
    tok = generate_tenant_token("k1", got["key"], {"*": None})
    assert verify_tenant_token(tok, new_store)["apiKeyUid"] == "k1"
    old_tok = generate_tenant_token(
        "k1", derive_key("old-master-key-0123456", "k1"), {"*": None}
    )
    with pytest.raises(AuthError, match="signature"):
        verify_tenant_token(old_tok, new_store)
    # refusal paths
    with pytest.raises(FileExistsError, match="fresh file"):
        import_dump(spark, dump_dir, dst_dir + "2", keys_path=new_keys)
    shutil.rmtree(base, ignore_errors=True)


def test_import_keys_from_keyless_dump_raises(spark, tmp_index_dir):
    from meilibridge_spark.sources.dumps import import_dump as _imp

    base = tempfile.mkdtemp(prefix="mbdumpnokeys_")
    src_dir, dump_dir = os.path.join(base, "s"), os.path.join(base, "d")
    sdf = generate_transcripts(spark, n_convs=5, seed=3)
    idx = build_and_save(spark, sdf, IndexConfig(index_name="nk"), src_dir)
    create_dump(idx, dump_dir)
    with pytest.raises(FileNotFoundError, match="no keys.json"):
        _imp(spark, dump_dir, os.path.join(base, "x"),
             keys_path=os.path.join(base, "k.json"))
    shutil.rmtree(base, ignore_errors=True)


def test_config_round_trip_every_field():
    """from_json_dict must not silently drop ANY field (the
    search_cutoff_ms regression: to_json_dict carried it, the rebuild
    defaulted it to None, so snapshot adoption and dump import lost
    the setting). Flip every field to a non-default value in one
    config and round-trip; a NEW field without a sample here fails
    loudly instead of slipping through."""
    import dataclasses

    from meilibridge_spark.config import AnalyzerConfig, TypoToleranceConfig

    samples = {
        "index_name": "rt-full",
        "primary_key": ("doc",),
        "fields": (
            ("doc", "doc"), ("role", "role"), ("text", "text"),
            ("lang", "lang"), ("turn_idx", "turn_idx"),
            ("lat", "lat"), ("lng", "lng"),
        ),
        "searchable_attributes": ("role", "text"),
        "displayed_attributes": ("text",),
        "filterable_attributes": ("role", "lang"),
        "filter_fold_case": True,
        "sortable_attributes": ("turn_idx",),
        "distinct_attribute": "role",
        "geo_attributes": ("lat", "lng"),
        "analyzer": AnalyzerConfig.make(
            stop_words=("the",),
            synonyms={"car": ["auto"]},
            dictionary=("newyork",),
            separator_tokens=("||",),
            non_separator_tokens=("-",),
            lowercase=False,
        ),
        "typo": TypoToleranceConfig(
            enabled=False,
            one_typo=4,
            two_typos=8,
            disable_on_words=("spark",),
            disable_on_attributes=("role",),
            disable_on_numbers=True,
        ),
        "words_ranking": True,
        "ranking_rules": ("words", "typo", "turn_idx:desc"),
        "prefix_search": "disabled",
        "facet_search": False,
        "proximity_precision": "byAttribute",
        "faceting_max_values": 7,
        "faceting_sort_by": "count",
        "faceting_sort_by_rules": (("lang", "count"),),
        "filterable_attribute_rules": ((("turn*",), False, False, True),),
        "embedders": (("default", 16),),
        "binary_quantized_embedders": ("default",),
        "search_cutoff_ms": 1500,
        "k1": 1.4,
        "b": 0.6,
        "max_total_hits": 250,
        "n_salts": 4,
        "block_size": 64,
        "shard_range": 4096,
    }
    field_names = {f.name for f in dataclasses.fields(IndexConfig)}
    assert field_names == set(samples), (
        "new IndexConfig field needs a non-default sample here: "
        f"{sorted(field_names ^ set(samples))}"
    )
    cfg = IndexConfig(**samples)
    for f in dataclasses.fields(IndexConfig):
        made_default = getattr(IndexConfig(index_name="x"), f.name, None)
        if f.name != "index_name":
            assert getattr(cfg, f.name) != made_default, (
                f"sample for {f.name} is not non-default"
            )
    d = json.loads(json.dumps(cfg.to_json_dict()))
    assert IndexConfig.from_json_dict(d) == cfg
