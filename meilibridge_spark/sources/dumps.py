"""Dumps — portable index export/import (Meilisearch ``POST /dumps``
and ``meilisearch --import-dump``).

A dump is NOT a snapshot: snapshots (sources/tables.py) carry
engine-internal postings bytes tied to layout constants
(shard_range/block_size) and load only into the same engine version; a
dump carries the ORIGINAL documents plus the full build configuration
(analyzer, typo, facet/sort/geo settings — config.IndexConfig), and
importing RE-INDEXES from them, exactly Meilisearch's
snapshot-vs-dump distinction (docs.meilisearch.com/learn/advanced/
snapshots_vs_dumps). That makes dumps the upgrade / cross-cluster
migration path: any engine that can run build_and_save can ingest one.

Layout (one directory per dump, commit-marked like the manifest):

    {dump_dir}/documents/          original-shaped doc rows (parquet)
    {dump_dir}/vectors/            (optional) raw (id, embedding) rows
    {dump_dir}/keys.json           (optional) API-key METADATA — a
                                   Meilisearch dump carries the
                                   instance keys; key VALUES are never
                                   stored (they derive from the
                                   importing instance's master key,
                                   sources/keys.derive_key — exactly
                                   Meilisearch's regenerate-on-import)
    {dump_dir}/dump.json           config + features + counts marker

``dump.json`` is written last via os.replace — a reader either sees a
complete dump or none. Scale shape: the export is two column-pruned
parquet-to-parquet copies (no shuffle beyond the write partitioning);
the import is a normal distributed build.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from meilibridge_spark.config import IndexConfig
from meilibridge_spark.sources.tables import (
    InvertedIndex,
    _n_write_parts,
    load_snapshot,
    save_vector_index,
    stored_index_config,
)

DUMP_META = "dump.json"
#: engine-internal docs columns a dump must not carry (doc_id is the
#: dense internal id — import re-assigns it; dl is derived)
_INTERNAL_DOC_COLS = ("doc_id", "dl", "terms", "_shard")


def create_dump(
    index: InvertedIndex, dump_dir: str, keys_path: "str | None" = None
) -> dict:
    """Export ``index`` as a portable dump -> the committed meta dict.

    Documents are written in primary-key order (deterministic bytes for
    identical corpora); the stored IVF layout, when present, dumps as
    raw (id, embedding) rows — import RETRAINS the quantizer
    (operators/similarity.ivf_train_kmeans; same init, float-sum order
    may differ across partitionings) rather than shipping centroid
    bytes that a different engine version may lay out differently.

    ``keys_path``: a KeyStore file (sources/keys.py) whose key METADATA
    rides the dump — the Meilisearch-dumps-carry-keys behavior. No
    secrets move: values re-derive from the importing instance's
    master key.
    """
    docs_out = index.docs.drop(
        *[c for c in _INTERNAL_DOC_COLS if c in index.docs.columns]
    )
    parts = _n_write_parts(index.n_docs)
    pk = list(index.cfg.primary_key)
    docs_out.repartitionByRange(parts, *pk).sortWithinPartitions(
        *pk
    ).write.mode("overwrite").parquet(os.path.join(dump_dir, "documents"))

    vectors_meta = None
    if index.vectors is not None:
        vec = index.vectors
        vec.assigned.select(vec.id_col, vec.vec_col).repartitionByRange(
            max(1, parts), vec.id_col
        ).sortWithinPartitions(vec.id_col).write.mode("overwrite").parquet(
            os.path.join(dump_dir, "vectors")
        )
        vectors_meta = {
            "id_col": vec.id_col,
            "vec_col": vec.vec_col,
            "n_centroids": vec.n_centroids,
            "n_probe": vec.n_probe,
        }

    n_keys = None
    if keys_path is not None:
        if not os.path.exists(keys_path):
            raise FileNotFoundError(f"no key store at {keys_path}")
        with open(keys_path) as f:
            keys_data = json.load(f)
        n_keys = len(keys_data.get("keys", []))
        ktmp = os.path.join(dump_dir, "keys.json.tmp")
        with open(ktmp, "w") as f:
            json.dump(keys_data, f, indent=1, sort_keys=True)
        os.replace(ktmp, os.path.join(dump_dir, "keys.json"))

    meta = {
        "dump_version": 1,
        "config": index.cfg.to_json_dict(),
        "features": {
            "positions": index.positions is not None,
            "attributes": index.attrs is not None,
            "typos": index.typos is not None,
            "vectors": vectors_meta,
            "keys": n_keys,
        },
        "n_docs": index.n_docs,
        "source_snapshot_id": index.snapshot_id,
    }
    tmp = os.path.join(dump_dir, DUMP_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(dump_dir, DUMP_META))  # commit point
    if index.index_dir is not None:  # journal on STORED indexes only
        from meilibridge_spark.sources.tasks import task_scope

        with task_scope(
            index.index_dir, "dumpCreation",
            index_uid=index.cfg.normalized_name(),
        ) as task:
            task["details"] = {"dumpUid": os.path.basename(
                os.path.abspath(dump_dir)
            )}
    return meta


def create_dump_from_dir(
    spark: SparkSession,
    index_dir: str,
    dump_dir: str,
    cfg: "IndexConfig | None" = None,
    snapshot_id: "int | None" = None,
    keys_path: "str | None" = None,
) -> dict:
    """``POST /dumps`` analog: dump a STORED index by directory. The
    dump records the snapshot's own stored configuration (full-config
    manifests); ``cfg`` is only needed for legacy manifests that
    predate the stored full config."""
    idx = load_snapshot(
        spark,
        index_dir,
        cfg
        or stored_index_config(index_dir, snapshot_id)
        or IndexConfig(index_name="dump"),
        snapshot_id=snapshot_id,
    )
    return create_dump(idx, dump_dir, keys_path=keys_path)


def read_dump_meta(dump_dir: str) -> dict:
    path = os.path.join(dump_dir, DUMP_META)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{dump_dir} has no committed {DUMP_META} — not a dump "
            "(or an export died mid-write)"
        )
    with open(path) as f:
        return json.load(f)


def import_dump(
    spark: SparkSession,
    dump_dir: str,
    index_dir: str,
    keys_path: "str | None" = None,
) -> InvertedIndex:
    """``--import-dump`` analog: re-index the dumped documents with the
    dumped configuration into ``index_dir`` (a fresh index — refuses to
    clobber an existing one, like Meilisearch refusing to import into a
    non-empty instance), rebuilding every dumped feature table
    (positions/attrs/typos, and the IVF vector layout when the dump
    carries vectors).

    ``keys_path``: restore the dump's API-key metadata to a NEW key
    store file there (refuses to clobber an existing store); key
    values re-derive from whatever master key the new instance's
    KeyStore is opened with — Meilisearch's regenerate-on-import."""
    from meilibridge_spark.sources.tables import index_exists
    from meilibridge_spark.sources.tasks import task_batch

    meta = read_dump_meta(dump_dir)
    if index_exists(index_dir):
        raise FileExistsError(
            f"{index_dir} already holds an index; import targets a "
            "fresh directory"
        )
    if keys_path is not None:
        dumped = os.path.join(dump_dir, "keys.json")
        if not os.path.exists(dumped):
            raise FileNotFoundError(
                f"dump at {dump_dir} carries no keys.json "
                "(exported without keys_path)"
            )
        if os.path.exists(keys_path):
            raise FileExistsError(
                f"{keys_path} already holds a key store; key import "
                "targets a fresh file"
            )
        with open(dumped) as f:
            keys_data = json.load(f)
        ktmp = keys_path + ".tmp"
        with open(ktmp, "w") as f:
            json.dump(keys_data, f, indent=1, sort_keys=True)
        os.replace(ktmp, keys_path)
    cfg = IndexConfig.from_json_dict(meta["config"])
    # the import's build task + dumpImport task are ONE batch
    # (/batches analog)
    with task_batch(index_dir):
        return _import_dump(spark, dump_dir, index_dir, meta, cfg)


def _import_dump(
    spark: SparkSession, dump_dir: str, index_dir: str, meta: dict,
    cfg: IndexConfig,
) -> InvertedIndex:
    from meilibridge_spark.operators.similarity import build_vector_index
    from meilibridge_spark.plans.build import build_and_save

    feats = meta["features"]
    docs = spark.read.parquet(os.path.join(dump_dir, "documents"))
    idx = build_and_save(
        spark,
        docs,
        cfg,
        index_dir,
        with_positions=bool(feats.get("positions")),
        with_attributes=bool(feats.get("attributes")),
        with_typos=bool(feats.get("typos")),
    )
    vmeta = feats.get("vectors")
    if vmeta:
        emb = spark.read.parquet(os.path.join(dump_dir, "vectors"))
        vec = build_vector_index(
            emb,
            n_centroids=int(vmeta["n_centroids"]),
            n_probe=int(vmeta["n_probe"]),
            id_col=vmeta["id_col"],
            vec_col=vmeta["vec_col"],
        )
        save_vector_index(vec, index_dir)
        idx.vectors = vec
    from meilibridge_spark.sources.tasks import task_scope

    with task_scope(
        index_dir, "dumpImport", index_uid=cfg.normalized_name()
    ) as task:
        task["details"] = {
            "dumpUid": os.path.basename(os.path.abspath(dump_dir)),
            "indexedDocuments": idx.n_docs,
        }
    return idx
