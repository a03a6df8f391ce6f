"""Index storage: parquet tables + JSON snapshot manifest.

Iceberg-style snapshot semantics without the Iceberg runtime (the
sandbox has no iceberg-spark-runtime jar — SURVEY.md §7 stage 1): the
manifest records snapshot_id, parent_snapshot_id, per-table paths,
corpus stats, per-partition lineage and build metrics. Swapping in real
Iceberg later is a config-only change (same commit points).

The reference analog: index lifecycle create/recreate/exists
(pkg/meilisearch/meilisearch.go:82-119, pkg/bridge/helper.go:43-67,
S16) and the stat stream (pkg/bridge/type.go:22-26, S28) — here a
manifest + metrics dict instead of HTTP calls.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meilibridge_spark.config import ConfigError, IndexConfig
from meilibridge_spark.operators.ranking import DEFAULT_RANKING_RULES

MANIFEST = "manifest.json"


@dataclass
class InvertedIndex:
    """An index snapshot bound to a SparkSession: lazy DataFrames over
    the snapshot's tables plus scalar corpus stats."""

    cfg: IndexConfig
    docs: DataFrame  # doc_id, source cols..., dl
    postings: DataFrame  # POSTINGS_SCHEMA (operators/postings.py)
    terms: DataFrame  # term, df, cf
    n_docs: int
    avgdl: float
    snapshot_id: "int | None" = None
    index_dir: "str | None" = None
    metrics: dict = field(default_factory=dict)
    #: serving-mode layout: postings re-partitioned by doc-shard and
    #: cached (prepare_serving). Batch queries then run shuffle-free —
    #: the scatter-gather stage reads resident partitions directly.
    serving: "DataFrame | None" = None
    #: optional positional postings (term, doc_id, positions[]) for
    #: phrase search — present when the snapshot was built with
    #: with_positions=True (operators/positions.py)
    positions: "DataFrame | None" = None
    #: optional attribute-mask blocks (POSTINGS_SCHEMA with tf = attr
    #: bitmask) for the Q11 'attribute' criterion + attributesToSearchOn
    #: — present when built with with_attributes=True (operators/attrs.py)
    attrs: "DataFrame | None" = None
    #: optional stored SymSpell deletion-neighborhood table
    #: (delkey, term) over the full vocabulary for Q12 typo candidate
    #: lookup — present when built with with_typos=True; maintained
    #: through apply_cdc; serving needs zero neighborhood-build jobs
    typos: "DataFrame | None" = None
    #: optional stored IVF vector layout (save_vector_index) attached
    #: at load time — hybrid/similar-docs serving then defaults to the
    #: probed IVF path with zero training/assignment jobs
    vectors: "VectorIndex | None" = None
    #: CDC delta components attached by apply_cdc (affected terms,
    #: merged postings rows, touched keys, upserted docs, ...) — what
    #: save_snapshot_delta persists so a micro-batch commit writes
    #: O(touched), not a full-corpus rewrite (merge-on-read)
    delta: "dict | None" = None


@dataclass
class VectorIndex:
    """A stored IVF vector layout: the trained coarse quantizer plus
    the embeddings co-partitioned by their inverted list. Serving
    (hybrid fusion, similar-docs) probes ``n_probe`` lists via a
    centroid_id equi-join instead of scanning every embedding — and
    never recomputes training or assignment (the 100 TB shape)."""

    centroids: DataFrame  # centroid_id, centroid_vec
    assigned: DataFrame  # embeddings cols + centroid_id (list-partitioned)
    n_centroids: int
    n_probe: int  # stored serving default (n_probe == n_centroids ≡ exact)
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    #: stored base version this layout was loaded from/saved to
    #: (``vectors/base-{k}``; None = legacy flat layout or unsaved).
    #: The vector store is INDEX-GLOBAL (like Meilisearch's vector DB
    #: living beside the index): snapshot time travel does not apply
    #: to it, and delta folding at load guards on this name.
    base: "str | None" = None
    #: True when ``assigned`` has in-memory CDC folds not yet written
    #: to a stored base (apply_cdc upserts/deletes, or delta-chain
    #: folding at load). save_snapshot then rewrites the base.
    dirty: bool = False


def _read_manifest(index_dir: str) -> dict:
    path = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(path):
        return {"snapshots": [], "current": None, "index": None}
    with open(path) as f:
        return json.load(f)


def _write_manifest(index_dir: str, manifest: dict) -> None:
    path = os.path.join(index_dir, MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, path)  # atomic commit point


def index_exists(index_dir: str) -> bool:
    """S16 IsExistsIndex analog."""
    return _read_manifest(index_dir)["current"] is not None


def list_indexes(root_dir: str, limit: int = 20, offset: int = 0) -> dict:
    """``GET /indexes`` analog: every immediate child of ``root_dir``
    holding a committed manifest, uid-sorted, offset/limit paginated ->
    {results: [{uid, primaryKey, createdAt, updatedAt}], offset,
    limit, total}. ``createdAt`` is the oldest surviving snapshot's
    commit time, ``updatedAt`` the current one's — the closest honest
    analog a snapshot store has (expiry can advance createdAt; the
    endpoint's values are instance metadata we deliberately don't
    duplicate)."""
    results = []
    for name in sorted(os.listdir(root_dir)) if os.path.isdir(root_dir) else []:
        child = os.path.join(root_dir, name)
        if not os.path.isdir(child):
            continue
        manifest = _read_manifest(child)
        if manifest["current"] is None:
            continue
        snaps = sorted(manifest["snapshots"], key=lambda s: s["snapshot_id"])
        cur = next(
            s for s in snaps if s["snapshot_id"] == manifest["current"]
        )
        meta = cur.get("index") or manifest.get("index") or {}
        pk = meta.get("primary_key") or []
        results.append(
            {
                "uid": meta.get("name", name),
                "primaryKey": pk[0] if len(pk) == 1 else list(pk),
                "createdAt": snaps[0]["created_at"],
                "updatedAt": cur["created_at"],
            }
        )
    total = len(results)
    return {
        "results": results[offset : offset + limit],
        "offset": offset,
        "limit": limit,
        "total": total,
    }


def index_stats(index_dir: str) -> dict:
    """``GET /indexes/{uid}/stats`` analog, ZERO Spark jobs: everything
    answers from the manifest's current snapshot entry + the tasks
    journal. ``numberOfDocuments`` and the size fields are snapshot
    metrics recorded at commit time (Meilisearch precomputes its stats
    the same way — stats read its LMDB metadata, not the documents);
    ``isIndexing`` is true while any journaled task is enqueued or
    processing. ``fieldDistribution`` stays the Spark-side
    ``operators.docs.field_distribution`` (a column scan by nature) —
    this endpoint analog reports per-field presence only when the
    caller merges it in."""
    manifest = _read_manifest(index_dir)
    if manifest["current"] is None:
        raise FileNotFoundError(f"no snapshot in {index_dir}")
    cur = next(
        s for s in manifest["snapshots"]
        if s["snapshot_id"] == manifest["current"]
    )
    metrics = cur.get("metrics", {})
    n_docs = int(cur.get("n_docs", metrics.get("n_docs", 0)))
    docs_bytes = int(metrics.get("docs_bytes", 0) or 0)
    from meilibridge_spark.sources.tasks import get_tasks

    active = get_tasks(
        index_dir, statuses=("enqueued", "processing"), limit=1
    )["results"]
    return {
        "numberOfDocuments": n_docs,
        "isIndexing": bool(active),
        # rawDocumentDbSize / avgDocumentSize analogs from the stored
        # docs table (what Meilisearch's documents DB size reports)
        "rawDocumentDbSize": docs_bytes,
        "avgDocumentSize": (docs_bytes // n_docs) if n_docs else 0,
        "numberOfEmbeddedDocuments": int(
            metrics.get("n_vectors", 0) or 0
        ),
        "snapshotId": cur["snapshot_id"],
        "updatedAt": cur["created_at"],
    }


def instance_stats(root_dir: str) -> dict:
    """``GET /stats`` analog over every index under ``root_dir`` (the
    ``list_indexes`` layout): per-index stats keyed by uid plus the
    instance aggregates — ``databaseSize`` (all bytes on disk,
    historical snapshots included), ``usedDatabaseSize`` (current
    snapshots only, the live analog) and ``lastUpdate``. Driver-side
    metadata reads only; no Spark session required."""
    indexes: "dict[str, dict]" = {}
    database_size = 0
    used_size = 0
    last_update: "str | None" = None
    for name in sorted(os.listdir(root_dir)) if os.path.isdir(root_dir) else []:
        child = os.path.join(root_dir, name)
        if not os.path.isdir(child):
            continue
        manifest = _read_manifest(child)
        database_size += _dir_bytes(child)
        if manifest["current"] is None:
            continue
        cur = next(
            s for s in manifest["snapshots"]
            if s["snapshot_id"] == manifest["current"]
        )
        meta = cur.get("index") or manifest.get("index") or {}
        stats = index_stats(child)
        metrics = cur.get("metrics", {})
        used_size += int(metrics.get("docs_bytes", 0) or 0) + int(
            metrics.get("postings_bytes", 0) or 0
        )
        if last_update is None or stats["updatedAt"] > last_update:
            last_update = stats["updatedAt"]
        indexes[meta.get("name", name)] = stats
    return {
        "databaseSize": database_size,
        "usedDatabaseSize": used_size,
        "lastUpdate": last_update,
        "indexes": indexes,
    }


def stored_index_config(
    index_dir: str, snapshot_id: "int | None" = None
) -> "IndexConfig | None":
    """The FULL IndexConfig a stored snapshot was built with, or None
    for pre-full-config manifests. Loading with this cfg reproduces the
    build's analyzer/typo/BM25 behavior exactly — the GET /settings and
    dump-export entry point."""
    manifest = _read_manifest(index_dir)
    sid = snapshot_id or manifest["current"]
    entry = next(
        (s for s in manifest["snapshots"] if s["snapshot_id"] == sid), None
    )
    meta = (entry or {}).get("index") or manifest.get("index") or {}
    cj = meta.get("config")
    return IndexConfig.from_json_dict(cj) if cj else None


def delete_index(index_dir: str, keep_instance_files: bool = True) -> None:
    """S16 DeleteIndex analog. ``keep_instance_files`` preserves the
    webhook registry + delivery journal through the wipe: Meilisearch
    webhooks are INSTANCE-level configuration, so deleting (or
    recreating) an index never unregisters them — this engine keeps
    both files in the index dir, so the wipe must exempt them. Pass
    False for a full teardown."""
    if not os.path.isdir(index_dir):
        return
    if not keep_instance_files:
        shutil.rmtree(index_dir)
        return
    from meilibridge_spark.sources.webhooks import (
        DELIVERIES_FILE,
        WEBHOOKS_FILE,
    )

    keep = {WEBHOOKS_FILE, DELIVERIES_FILE}
    for name in os.listdir(index_dir):
        if name in keep:
            continue
        path = os.path.join(index_dir, name)
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)


def partition_lineage(df: DataFrame) -> "list[dict]":
    """Per-partition row counts — the per-partition lineage record the
    north_star asks for (and the reference's pagination invariant:
    sum(partition counts) == total, integration/sql/mysql_test.go:115)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [{"partition": int(r["pid"]), "rows": int(r["count"])} for r in rows]


def _index_meta(index: InvertedIndex) -> dict:
    return {
        "name": index.cfg.normalized_name(),
        "primary_key": list(index.cfg.primary_key),
        # the FULL build configuration (analyzer, typo, BM25 params —
        # everything, not just the adoptable surface below): settings
        # live with the index, exactly Meilisearch's model. Loaders
        # adopt any field the caller left at its default; dumps
        # (sources/dumps.py) record this verbatim so an import
        # re-indexes with the original analyzer.
        "config": index.cfg.to_json_dict(),
        # layout constants baked into the stored postings bytes: block
        # segmentation and shard-aligned block ids depend on them, and
        # the query-side scatter-add derives dense-array offsets from
        # shard_range — loading with a different value mis-indexes
        # silently, so load_snapshot validates these loudly.
        "shard_range": index.cfg.shard_range,
        "block_size": index.cfg.block_size,
        # the settings surface the index was BUILT with (S17 analog):
        # loaders adopt these so e.g. --filter enforcement is defined by
        # the index, not by whatever cfg a CLI happens to construct
        "searchable_attributes": list(index.cfg.searchable_attributes),
        "filterable_attributes": list(index.cfg.filterable_attributes),
        "sortable_attributes": list(index.cfg.sortable_attributes),
        "distinct_attribute": index.cfg.distinct_attribute,
        "geo_attributes": (
            list(index.cfg.geo_attributes)
            if index.cfg.geo_attributes is not None
            else None
        ),
        # attrs tf-slot encoding version: "mask" = attribute bitmask
        # (operators/attrs.py). Older snapshots wrote min_attr_rank+1
        # and carry no marker; load_snapshot refuses those — reading a
        # rank as a mask mis-ranks silently.
        **({"attrs_tf_encoding": "mask"} if index.attrs is not None else {}),
    }


def save_snapshot(
    index: InvertedIndex,
    index_dir: str,
    parent_id: "int | None" = None,
    extra_metrics: "dict | None" = None,
    max_ts: "str | None" = None,
    n_parts: "int | None" = None,
) -> int:
    """Write all index tables + commit a new manifest snapshot.

    Layout per snapshot: snap-{id:06d}/{docs,postings,terms}/ parquet.
    postings are range-partitioned + sorted by (term, block_id) so
    term-filtered queries prune parquet row groups; docs sorted by
    doc_id for the hits join. ``index.positions`` (optional) is written
    as a positions table in the same term-sorted pruning layout.
    """
    manifest = _read_manifest(index_dir)
    parts = n_parts or _n_write_parts(index.n_docs)
    snap_id = (manifest["current"] or 0) + 1
    snap = f"snap-{snap_id:06d}"
    base = os.path.join(index_dir, snap)
    t0 = time.time()

    postings_sorted = index.postings.repartitionByRange(
        parts, "term"
    ).sortWithinPartitions("term", "block_id")
    postings_sorted.write.mode("overwrite").parquet(os.path.join(base, "postings"))

    docs_out = index.docs.drop("terms")
    docs_out.repartitionByRange(
        parts, "doc_id"
    ).sortWithinPartitions("doc_id").write.mode("overwrite").parquet(
        os.path.join(base, "docs")
    )
    index.terms.write.mode("overwrite").parquet(os.path.join(base, "terms"))
    if index.attrs is not None:
        index.attrs.repartitionByRange(
            parts, "term"
        ).sortWithinPartitions("term", "block_id").write.mode(
            "overwrite"
        ).parquet(os.path.join(base, "attrs"))
    if index.positions is not None:
        index.positions.repartitionByRange(
            parts, "term"
        ).sortWithinPartitions("term", "doc_id").write.mode("overwrite").parquet(
            os.path.join(base, "positions")
        )
    if index.typos is not None:
        # delkey-range layout: the query-time candidate lookup is a
        # delkey IN (...) filter, so range partitioning + sorting by
        # delkey prunes both files and parquet row groups
        index.typos.repartitionByRange(
            parts, "delkey"
        ).sortWithinPartitions("delkey", "term").write.mode(
            "overwrite"
        ).parquet(os.path.join(base, "typos"))

    # a CDC-folded (or delta-chain-folded) vector layout rewrites its
    # stored base BEFORE the manifest commit: save_vector_index writes
    # a NEW versioned base dir (never the files the fold is reading)
    # and resets the dirty flag — full snapshots (and compaction, which
    # routes here) are then self-contained for vectors too
    if index.vectors is not None and index.vectors.dirty:
        save_vector_index(index.vectors, index_dir)

    spark = index.postings.sparkSession
    postings_persisted = spark.read.parquet(os.path.join(base, "postings"))
    metrics = {
        "n_docs": index.n_docs,
        "avgdl": index.avgdl,
        "n_terms": index.terms.count(),
        "n_blocks": postings_persisted.count(),
        "postings_bytes": _dir_bytes(os.path.join(base, "postings")),
        "docs_bytes": _dir_bytes(os.path.join(base, "docs")),
        "save_seconds": round(time.time() - t0, 3),
        **(extra_metrics or {}),
    }
    index_meta = _index_meta(index)
    entry = {
        "snapshot_id": snap_id,
        "parent_snapshot_id": parent_id,
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_docs": index.n_docs,
        "avgdl": index.avgdl,
        "max_ts": max_ts,
        # the built-settings surface + encoding markers are stored PER
        # SNAPSHOT: a later save from a differently-configured index
        # must not retroactively change what an earlier snapshot means
        # (load_snapshot validates/adopts from the entry being loaded;
        # the top-level copy below remains for legacy snapshots only)
        "index": index_meta,
        "tables": {
            "docs": f"{snap}/docs",
            "postings": f"{snap}/postings",
            "terms": f"{snap}/terms",
            **(
                {"positions": f"{snap}/positions"}
                if index.positions is not None
                else {}
            ),
            **({"attrs": f"{snap}/attrs"} if index.attrs is not None else {}),
            **({"typos": f"{snap}/typos"} if index.typos is not None else {}),
        },
        "lineage": {"postings": partition_lineage(postings_persisted)},
        "metrics": metrics,
        **(
            {"vec_base": index.vectors.base}
            if index.vectors is not None and index.vectors.base
            else {}
        ),
    }
    manifest["snapshots"].append(entry)
    manifest["current"] = snap_id
    manifest["index"] = index_meta
    _write_manifest(index_dir, manifest)
    index.snapshot_id = snap_id
    index.index_dir = index_dir
    index.metrics = metrics
    return snap_id


#: delta tables written per delta snapshot: (delta-dict key, stored
#: table name, sort columns for the write)
_DELTA_TABLES = (
    ("affected_terms", "affected_terms", ("term",)),
    ("postings", "postings_delta", ("term", "block_id")),
    ("terms", "terms_delta", ("term",)),
    ("touched_keys", "touched_keys", ()),
    ("docs", "docs_delta", ("doc_id",)),
    ("touched_doc_ids", "touched_doc_ids", ("doc_id",)),
    ("positions", "positions_delta", ("term", "doc_id")),
    ("affected_attr_terms", "affected_attr_terms", ("term",)),
    ("attrs", "attrs_delta", ("term", "block_id")),
    ("typos", "typos_delta", ("delkey", "term")),
    # stored-IVF vector maintenance (apply_cdc_vector_index): tiny
    # per-batch frames, no range layout needed
    ("vec_touched_ids", "vec_touched_ids", ()),
    ("vec_assigned", "vec_assigned_delta", ()),
)


def save_snapshot_delta(
    index: InvertedIndex,
    index_dir: str,
    extra_metrics: "dict | None" = None,
    max_ts: "str | None" = None,
) -> int:
    """Commit a CDC merge as a DELTA snapshot (merge-on-read): persist
    only ``index.delta`` — the affected terms' re-encoded postings,
    the touched doc keys + upserted rows, the affected term stats, and
    the matching deltas for positions/attrs/typos when present — so the
    write costs O(touched docs + affected-term postings), never a
    full-corpus rewrite. At 10^12 turns a micro-batch full save is a
    non-starter; this is the streaming commit path
    (``start_cdc_sync(delta_commits=True)``).

    load_snapshot folds delta entries over their parent chain
    (anti-join each table on the delta's keys, union the delta rows) —
    byte-identical to a full save of the same merge (tested). Read
    amplification grows with chain depth (one extra union + broadcast
    anti-join per level), so run ``compact_snapshot`` periodically: it
    collapses the chain into a full snapshot. ``expire_snapshots``
    keeps the ancestor closure of every kept delta alive.
    """
    if index.delta is None:
        raise ValueError(
            "save_snapshot_delta needs an index produced by apply_cdc "
            "(index.delta is None — use save_snapshot for full builds)"
        )
    manifest = _read_manifest(index_dir)
    if manifest["current"] is None:
        raise FileNotFoundError(
            f"no parent snapshot in {index_dir} — a delta commit needs "
            "a base (build_and_save / save_snapshot first)"
        )
    parent_id = manifest["current"]
    base_id = index.delta.get("_base_snapshot_id")
    if base_id is not None and base_id != parent_id:
        # the delta's plans read the base snapshot's parquet files —
        # folding them over a DIFFERENT parent (committed concurrently
        # by another stream or a manual save) would silently lose that
        # parent's changes to the affected terms while keeping the
        # rest, a mixed state no later validation can catch
        raise ValueError(
            f"delta was computed against snapshot {base_id} but the "
            f"manifest's current snapshot is {parent_id} (a concurrent "
            "commit interleaved): reload the current snapshot and "
            "re-apply the CDC batch"
        )
    snap_id = parent_id + 1
    snap = f"snap-{snap_id:06d}"
    base = os.path.join(index_dir, snap)
    t0 = time.time()
    # the postings delta is the expensive cogrouped decode-merge-reencode
    # plan, and BOTH the terms delta (term_stats over it) and the typo
    # delta (built from terms_new = (terms minus affected) + terms_delta)
    # recompute it from scratch if nothing is pinned — the streaming
    # micro-batch commit paid the merge ~3x. Pin it (and the cheap
    # term stats) for the duration of the commit.
    pinned = [
        df
        for df in (index.delta.get("postings"), index.delta.get("terms"))
        if df is not None
    ]
    for df in pinned:
        df.persist()
    try:
        tables = {}
        for key, name, sort_cols in _DELTA_TABLES:
            df = index.delta.get(key)
            if df is None:
                continue
            out = df
            if sort_cols:
                out = out.repartitionByRange(
                    4, sort_cols[0]
                ).sortWithinPartitions(*sort_cols)
            else:
                out = out.coalesce(4)
            out.write.mode("overwrite").parquet(os.path.join(base, name))
            tables[name] = f"{snap}/{name}"
    finally:
        for df in pinned:
            df.unpersist()
    if (
        index.delta.get("vec_list_delta") is not None
        and index.vectors is not None
        and index.vectors.base
    ):
        # keep the IVF drift signal current through delta commits
        _update_vector_drift(
            index_dir, index.vectors, index.delta["vec_list_delta"]
        )
    parent_entry = next(
        s for s in manifest["snapshots"] if s["snapshot_id"] == parent_id
    )
    levels = int(parent_entry.get("metrics", {}).get("delta_levels", 0)) + 1
    metrics = {
        "n_docs": index.n_docs,
        "avgdl": index.avgdl,
        "delta_levels": levels,
        "delta_bytes": _dir_bytes(base),
        "save_seconds": round(time.time() - t0, 3),
        **(extra_metrics or {}),
    }
    entry = {
        "snapshot_id": snap_id,
        "parent_snapshot_id": parent_id,
        "delta": True,
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_docs": index.n_docs,
        "avgdl": index.avgdl,
        "max_ts": max_ts,
        "index": _index_meta(index),
        "tables": tables,
        "metrics": metrics,
        # the vector base this delta's vec tables were computed
        # against — load_snapshot folds them ONLY onto that base (a
        # retrain/compaction supersedes pending deltas)
        **(
            {"vec_base": index.vectors.base}
            if index.vectors is not None and index.vectors.base
            else {}
        ),
    }
    manifest["snapshots"].append(entry)
    manifest["current"] = snap_id
    manifest["index"] = entry["index"]
    _write_manifest(index_dir, manifest)
    index.snapshot_id = snap_id
    index.index_dir = index_dir
    index.metrics = metrics
    return snap_id


def load_snapshot(
    spark: SparkSession,
    index_dir: str,
    cfg: IndexConfig,
    snapshot_id: "int | None" = None,
) -> InvertedIndex:
    manifest = _read_manifest(index_dir)
    if manifest["current"] is None:
        raise FileNotFoundError(f"no snapshot in {index_dir}")
    sid = snapshot_id or manifest["current"]
    entry = next(
        (s for s in manifest["snapshots"] if s["snapshot_id"] == sid), None
    )
    if entry is None:
        raise FileNotFoundError(
            f"snapshot {sid} not in {index_dir} (expired or never existed); "
            f"available: {[s['snapshot_id'] for s in manifest['snapshots']]}"
        )
    # validate/adopt from the entry BEING LOADED: a later save from a
    # differently-configured index rewrites the top-level meta, which
    # must not change what an earlier snapshot means (its settings and
    # encoding markers travel with the entry; top-level is the legacy
    # fallback for pre-round-4 manifests that lack entry["index"])
    meta = entry.get("index") or manifest.get("index") or {}
    for knob in ("shard_range", "block_size"):
        stored = meta.get(knob)
        if stored is not None and stored != getattr(cfg, knob):
            raise ConfigError(
                f"snapshot at {index_dir} was built with {knob}={stored} "
                f"but caller cfg has {knob}={getattr(cfg, knob)}; the stored "
                "postings layout is a function of these — load with a "
                "matching IndexConfig"
            )
    if "attrs" in entry.get("tables", {}) and (
        meta.get("attrs_tf_encoding") != "mask"
    ):
        raise ConfigError(
            f"snapshot at {index_dir} stores attr blocks in the legacy "
            "min-rank tf encoding; this engine version reads attribute "
            "bitmasks (attrs_tf_encoding='mask') — rebuild the index"
        )
    # adopt the BUILT settings for any field the caller left at its
    # default — enforcement (filters, sorts, analyzer, typo, BM25
    # params) is then defined by the index (manifest), not by whatever
    # cfg the loading CLI happens to construct; an explicitly-set
    # caller value still wins (tests/overrides). Snapshots written
    # since the full-config entry carry cfg.to_json_dict() verbatim;
    # older ones fall back to the legacy adoptable-surface knobs.
    import dataclasses

    adopted = {}
    stored_cfg_json = meta.get("config")
    if stored_cfg_json is not None:
        stored_cfg = IndexConfig.from_json_dict(stored_cfg_json)
        for f in dataclasses.fields(IndexConfig):
            if f.default is not dataclasses.MISSING:
                default = f.default
            elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
                default = f.default_factory()  # type: ignore[misc]
            else:
                continue  # index_name: required, caller's always wins
            if getattr(cfg, f.name) == default:
                adopted[f.name] = getattr(stored_cfg, f.name)
    else:
        for knob, default in (
            ("searchable_attributes", IndexConfig.__dataclass_fields__[
                "searchable_attributes"].default),
            ("filterable_attributes", ()),
            ("sortable_attributes", ()),
            ("distinct_attribute", None),
            ("geo_attributes", None),
        ):
            stored = meta.get(knob)
            if stored is not None and getattr(cfg, knob) == default:
                adopted[knob] = (
                    tuple(stored) if isinstance(stored, list) else stored
                )
    if adopted:
        cfg = dataclasses.replace(cfg, **adopted)

    # resolve the delta chain back to its base FULL snapshot, then fold
    # each delta forward (merge-on-read): anti-join the table on the
    # delta's keys, union the delta rows. Byte-identical to the full
    # save of the same merge (tested); read amplification = one union +
    # broadcast anti-join per level — compact_snapshot collapses chains.
    by_id = {s["snapshot_id"]: s for s in manifest["snapshots"]}
    chain = [entry]
    while chain[0].get("delta"):
        pid = chain[0].get("parent_snapshot_id")
        parent = by_id.get(pid)
        if parent is None:
            raise FileNotFoundError(
                f"delta snapshot {chain[0]['snapshot_id']} in {index_dir} "
                f"references missing parent {pid} — delta chains need "
                "their ancestor closure (expire_snapshots preserves it)"
            )
        chain.insert(0, parent)

    def rd(rel: str) -> DataFrame:
        return spark.read.parquet(os.path.join(index_dir, rel))

    def fold(base_df: DataFrame, key_df: DataFrame, delta_df: DataFrame,
             on: "list[str]") -> DataFrame:
        cols = base_df.columns
        return (
            base_df.join(F.broadcast(key_df.select(*on)), on, "left_anti")
            .unionByName(delta_df)
            .select(*cols)  # USING-joins move key columns first
        )

    bt = chain[0]["tables"]
    docs = rd(bt["docs"])
    postings = rd(bt["postings"])
    terms = rd(bt["terms"])
    positions = rd(bt["positions"]) if "positions" in bt else None
    attrs = rd(bt["attrs"]) if "attrs" in bt else None
    typos = rd(bt["typos"]) if "typos" in bt else None
    # the stored IVF layout (if any) rides along; delta levels with
    # vector maintenance fold onto it below. The guard on vec_base
    # skips deltas computed against a SUPERSEDED base (a retrain or
    # compaction already folded/replaced them).
    vectors = load_vector_index(spark, index_dir)
    for d in chain[1:]:
        if d.get("settings_only"):
            # a settings-only commit (update_settings) carries NO data
            # tables — the parent's bytes serve unchanged; only the
            # entry's stored config (already adopted above when the
            # loaded entry is in its chain) differs
            continue
        t = d["tables"]
        aff = rd(t["affected_terms"])
        postings = fold(postings, aff, rd(t["postings_delta"]), ["term"])
        terms = fold(terms, aff, rd(t["terms_delta"]), ["term"])
        keys = rd(t["touched_keys"])
        docs = fold(docs, keys, rd(t["docs_delta"]), list(keys.columns))
        if positions is not None and "positions_delta" in t:
            positions = fold(
                positions,
                rd(t["touched_doc_ids"]),
                rd(t["positions_delta"]),
                ["doc_id"],
            )
        if attrs is not None and "attrs_delta" in t:
            attrs = fold(
                attrs,
                rd(t["affected_attr_terms"]),
                rd(t["attrs_delta"]),
                ["term"],
            )
        if typos is not None and "typos_delta" in t:
            typos = fold(typos, aff, rd(t["typos_delta"]), ["term"])
        if (
            vectors is not None
            and "vec_touched_ids" in t
            and d.get("vec_base") == vectors.base
        ):
            import dataclasses as _dc

            vectors = _dc.replace(
                vectors,
                assigned=fold(
                    vectors.assigned,
                    rd(t["vec_touched_ids"]),
                    rd(t["vec_assigned_delta"]),
                    [vectors.id_col],
                ),
                dirty=True,
            )
    return InvertedIndex(
        cfg=cfg,
        docs=docs,
        postings=postings,
        terms=terms,
        n_docs=int(entry["n_docs"]),
        avgdl=float(entry["avgdl"]),
        snapshot_id=sid,
        index_dir=index_dir,
        metrics=entry.get("metrics", {}),
        positions=positions,
        attrs=attrs,
        typos=typos,
        # hybrid / similar-docs serving auto-selects the probed path
        vectors=vectors,
    )


def update_settings(index_dir: str, patch: dict) -> dict:
    """``PATCH /indexes/{uid}/settings`` analog, END TO END: fold a
    partial camelCase settings object into the CURRENT snapshot's
    stored config and commit the result as a SETTINGS-ONLY snapshot
    entry — ``delta: True, settings_only: True`` with an empty tables
    map, so the parent's data bytes serve unchanged and the commit
    costs one manifest write (the endpoint's settingsUpdate task is
    likewise metadata-speed for query-time settings). Journaled as a
    ``settingsUpdate`` task (webhooks fire on completion).

    Settings whose change invalidates stored bytes
    (:data:`~meilibridge_spark.config.REINDEX_SETTINGS`, plus one-way
    binaryQuantized flips) raise instead: at 10^12 turns a reindex is
    an explicit spark-submit decision (``jobs/build_index.py``), never
    a side effect of a settings call. Earlier snapshots keep their own
    settings (the per-entry model); ``get_settings`` on the new entry
    answers with the patched surface. Returns the new manifest entry.
    """
    from meilibridge_spark.config import apply_settings_patch
    from meilibridge_spark.sources.tasks import task_scope

    manifest = _read_manifest(index_dir)
    if manifest["current"] is None:
        raise FileNotFoundError(f"no snapshot in {index_dir}")
    parent_id = manifest["current"]
    parent = next(
        s for s in manifest["snapshots"] if s["snapshot_id"] == parent_id
    )
    meta = parent.get("index") or manifest.get("index") or {}
    if not meta.get("config"):
        raise ConfigError(
            f"snapshot {parent_id} in {index_dir} predates full-config "
            "manifests — rebuild once to enable settings updates"
        )
    stored_cfg = IndexConfig.from_json_dict(meta["config"])
    new_cfg, reindex, changed = apply_settings_patch(stored_cfg, patch)
    if reindex:
        from meilibridge_spark.config import REINDEX_SETTINGS

        culprits = sorted(
            set(changed) & REINDEX_SETTINGS
        ) or sorted(changed)
        raise ConfigError(
            f"settings {culprits} change the stored index bytes — "
            "rebuild with jobs/build_index.py using the new config "
            "instead of patching in place"
        )
    uid = meta.get("name")
    with task_scope(index_dir, "settingsUpdate", index_uid=uid) as task:
        new_meta = dict(meta)
        new_meta["config"] = new_cfg.to_json_dict()
        new_meta["searchable_attributes"] = list(
            new_cfg.searchable_attributes
        )
        new_meta["filterable_attributes"] = list(
            new_cfg.filterable_attributes
        )
        new_meta["sortable_attributes"] = list(new_cfg.sortable_attributes)
        new_meta["distinct_attribute"] = new_cfg.distinct_attribute
        new_meta["geo_attributes"] = (
            list(new_cfg.geo_attributes)
            if new_cfg.geo_attributes is not None
            else None
        )
        entry = {
            "snapshot_id": parent_id + 1,
            "parent_snapshot_id": parent_id,
            "delta": True,
            "settings_only": True,
            "created_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
            "n_docs": parent["n_docs"],
            "avgdl": parent["avgdl"],
            "max_ts": parent.get("max_ts"),
            "index": new_meta,
            "tables": {},
            "metrics": {
                "n_docs": parent["n_docs"],
                "settings_changed": sorted(changed),
                "delta_levels": int(
                    parent.get("metrics", {}).get("delta_levels", 0)
                ),
                # size stats carry over — the data bytes ARE the
                # parent's (index_stats reads them from the current
                # entry)
                **{
                    k: parent["metrics"][k]
                    for k in ("docs_bytes", "postings_bytes", "n_vectors")
                    if k in parent.get("metrics", {})
                },
            },
            **(
                {"vec_base": parent["vec_base"]}
                if "vec_base" in parent
                else {}
            ),
        }
        manifest["snapshots"].append(entry)
        manifest["current"] = entry["snapshot_id"]
        manifest["index"] = new_meta
        _write_manifest(index_dir, manifest)
        task["details"] = {"changed": sorted(changed)}
    return entry


def snapshot_log(index_dir: str) -> "list[dict]":
    """S27 stats/introspection analog."""
    return _read_manifest(index_dir)["snapshots"]


def get_settings(
    index_dir: str, snapshot_id: "int | None" = None
) -> dict:
    """``GET /indexes/{uid}/settings`` analog: the settings surface the
    index was BUILT with, in the endpoint's camelCase response shape,
    read from the snapshot entry's stored settings (per-entry since the
    round-4 ADVICE fix — asking about snapshot N answers with N's
    settings even after later saves). Engine-internal knobs
    (shard_range, block_size) are reported under ``engine`` — the
    endpoint has no slot for them and the distinction matters
    (Meilisearch settings are mutable; these two are baked into the
    stored bytes)."""
    manifest = _read_manifest(index_dir)
    if manifest["current"] is None:
        raise FileNotFoundError(f"no snapshot in {index_dir}")
    sid = snapshot_id if snapshot_id is not None else manifest["current"]
    entry = next(
        (s for s in manifest["snapshots"] if s["snapshot_id"] == sid), None
    )
    if entry is None:
        raise KeyError(f"snapshot {sid} not in {index_dir}")
    meta = entry.get("index") or manifest.get("index") or {}
    geo = meta.get("geo_attributes")
    return {
        "indexUid": meta.get("name"),
        "primaryKey": list(meta.get("primary_key", [])),
        "searchableAttributes": list(meta.get("searchable_attributes", [])),
        # mixed v1.12 shape: plain strings for legacy entries, the
        # {"attributePatterns", "features"} object form for granular
        # rules (feature flags gate filter operator families and the
        # facet-search endpoint per attribute — config.filter_features)
        "filterableAttributes": list(meta.get("filterable_attributes", []))
        + [
            {
                "attributePatterns": list(pats),
                "features": {
                    "facetSearch": bool(fs),
                    "filter": {
                        "equality": bool(eq),
                        "comparison": bool(cmp_),
                    },
                },
            }
            for pats, fs, eq, cmp_ in (meta.get("config") or {}).get(
                "filterable_attribute_rules", ()
            )
        ]
        + (["_geo"] if geo else []),
        "sortableAttributes": list(meta.get("sortable_attributes", []))
        + (["_geo"] if geo else []),
        "distinctAttribute": meta.get("distinct_attribute"),
        "geoAttributes": list(geo) if geo else None,
        # rankingRules (reference config/type.go:56): the stored
        # user-supplied list, or — exactly like the endpoint — the
        # Meilisearch default order when the index never set one
        "rankingRules": list(
            (meta.get("config") or {}).get("ranking_rules")
            or DEFAULT_RANKING_RULES
        ),
        # v1.12 settings, present when the snapshot stores its full
        # config (post-round-4 manifests); endpoint defaults otherwise
        "prefixSearch": (meta.get("config") or {}).get(
            "prefix_search", "indexingTime"
        ),
        "facetSearch": bool(
            (meta.get("config") or {}).get("facet_search", True)
        ),
        # v1.6 proximityPrecision (operators/positions.proximity_costs)
        "proximityPrecision": (meta.get("config") or {}).get(
            "proximity_precision", "byWord"
        ),
        "faceting": {
            "maxValuesPerFacet": int(
                (meta.get("config") or {}).get("faceting_max_values", 100)
            ),
            "sortFacetValuesBy": {
                "*": (meta.get("config") or {}).get(
                    "faceting_sort_by", "alpha"
                ),
                # per-facet overrides (the endpoint's full map form)
                **{
                    f: r
                    for f, r in (meta.get("config") or {}).get(
                        "faceting_sort_by_rules", ()
                    )
                },
            },
        },
        # v1.10 searchCutoffMs (serving-path budget,
        # DriverSearcher.search_cutoff; endpoint default: null)
        "searchCutoffMs": (meta.get("config") or {}).get(
            "search_cutoff_ms"
        ),
        # embedders setting (userProvided source only — vectors are
        # inputs, the engine is embedder-model-agnostic); v1.10
        # binaryQuantized reported per embedder
        "embedders": {
            n: {
                "source": "userProvided",
                "dimensions": int(dim),
                "binaryQuantized": n
                in (
                    (meta.get("config") or {}).get(
                        "binary_quantized_embedders"
                    )
                    or ()
                ),
            }
            for n, dim in (
                (meta.get("config") or {}).get("embedders") or ()
            )
        },
        # v1.4 tokenizer settings (endpoint default: empty lists)
        "separatorTokens": list(
            ((meta.get("config") or {}).get("analyzer") or {}).get(
                "separator_tokens"
            )
            or []
        ),
        "nonSeparatorTokens": list(
            ((meta.get("config") or {}).get("analyzer") or {}).get(
                "non_separator_tokens"
            )
            or []
        ),
        "engine": {
            "shardRange": meta.get("shard_range"),
            "blockSize": meta.get("block_size"),
            "attrsTfEncoding": meta.get("attrs_tf_encoding"),
        },
        "snapshotId": sid,
    }


def expire_snapshots(index_dir: str, keep_last: int = 1) -> "list[int]":
    """Iceberg ``expire_snapshots`` analog: drop all but the newest
    ``keep_last`` snapshots — manifest entries removed first (commit
    point), then their self-contained ``snap-*`` data dirs deleted.
    The current snapshot is always kept. Returns the expired ids.

    A long-running CDC stream commits one snapshot per micro-batch
    (streaming/cdc_stream.py); without expiry the store grows by a full
    index copy per batch — this is the compaction lever.

    Serving-safety contract (same as Iceberg's): expiry removes DATA
    DIRS, so a session still holding lazy DataFrames over an expired
    snapshot (an earlier ``load_snapshot``) will fail on its next
    action. Run expiry only for snapshots no reader is serving — in
    practice: keep_last >= the number of concurrently-served snapshots
    + 1, and roll readers forward before expiring (the manifest rewrite
    is atomic, so a reader that re-loads never sees a dangling entry).
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    manifest = _read_manifest(index_dir)
    snaps = manifest["snapshots"]
    if len(snaps) <= keep_last:
        return []
    snaps_sorted = sorted(snaps, key=lambda s: s["snapshot_id"])
    keep_ids = {s["snapshot_id"] for s in snaps_sorted[-keep_last:]}
    if manifest["current"] is not None:
        keep_ids.add(manifest["current"])
    # ancestor closure: a kept DELTA snapshot reads through its parent
    # chain (merge-on-read), so every ancestor of a kept delta must
    # survive too — compact_snapshot collapses chains when this keeps
    # more than intended
    by_id = {s["snapshot_id"]: s for s in snaps_sorted}
    frontier = list(keep_ids)
    while frontier:
        e = by_id.get(frontier.pop())
        if e is not None and e.get("delta"):
            pid = e.get("parent_snapshot_id")
            if pid is not None and pid not in keep_ids:
                keep_ids.add(pid)
                frontier.append(pid)
    expired = [s for s in snaps_sorted if s["snapshot_id"] not in keep_ids]
    manifest["snapshots"] = [
        s for s in snaps_sorted if s["snapshot_id"] in keep_ids
    ]
    _write_manifest(index_dir, manifest)  # atomic: readers never see
    # a manifest referencing dirs we are about to delete
    for s in expired:
        snap_dir = os.path.join(index_dir, f"snap-{s['snapshot_id']:06d}")
        shutil.rmtree(snap_dir, ignore_errors=True)
    return [s["snapshot_id"] for s in expired]


def compact_snapshot(
    spark: SparkSession,
    index_dir: str,
    cfg: IndexConfig,
    target_file_bytes: int = 128 << 20,
) -> int:
    """OPTIMIZE-style compaction for long CDC chains: rewrite the
    CURRENT snapshot's tables as a NEW snapshot whose file count is
    sized from the actual stored bytes (``ceil(bytes /
    target_file_bytes)`` per table, 128 MiB default) instead of the
    row-count heuristic — many micro-batches of small files become a
    few full files. Block contents are untouched: the CDC merger
    decodes and re-encodes every affected term canonically
    (plans/incremental._make_merger), so post-CDC blocks are already
    byte-identical to a fresh build and compaction is purely a
    FILE-level rewrite (tested). Returns the new snapshot id; the
    entry's metrics carry a ``compaction`` record with per-table
    file/byte counts before and after. Chain with
    ``expire_snapshots(keep_last=1)`` to reclaim the old dirs.
    """
    if target_file_bytes < 1:
        raise ValueError("target_file_bytes must be >= 1")
    from meilibridge_spark.sources.tasks import task_scope

    with task_scope(
        index_dir, "snapshotCompaction", index_uid=cfg.normalized_name()
    ) as _task:
        return _compact_snapshot(
            spark, index_dir, cfg, target_file_bytes, _task
        )


def _compact_snapshot(
    spark: SparkSession,
    index_dir: str,
    cfg: IndexConfig,
    target_file_bytes: int,
    _task: dict,
) -> int:
    index = load_snapshot(spark, index_dir, cfg)
    manifest = _read_manifest(index_dir)
    by_id = {s["snapshot_id"]: s for s in manifest["snapshots"]}
    # a delta tip reads through its ancestor chain — the compaction
    # rewrites the FOLDED state, so 'before' accounts the whole chain
    chain = [by_id[index.snapshot_id]]
    while chain[0].get("delta"):
        chain.insert(0, by_id[chain[0]["parent_snapshot_id"]])
    before: dict = {}
    for e in chain:
        for name, rel in e["tables"].items():
            agg = before.setdefault(name, {"files": 0, "bytes": 0})
            agg["files"] += _dir_data_files(os.path.join(index_dir, rel))
            agg["bytes"] += _dir_bytes(os.path.join(index_dir, rel))
    biggest = max(t["bytes"] for t in before.values())
    n_parts = max(1, -(-biggest // target_file_bytes))
    new_id = save_snapshot(
        index,
        index_dir,
        parent_id=index.snapshot_id,
        n_parts=n_parts,
        extra_metrics={
            "compaction": {
                "before": before,
                "delta_levels_collapsed": len(chain) - 1,
            }
        },
    )
    # the after-counts only exist once the write finished: patch them
    # into the committed entry (manifest rewrite is atomic)
    manifest = _read_manifest(index_dir)
    for s in manifest["snapshots"]:
        if s["snapshot_id"] == new_id:
            s["metrics"]["compaction"]["after"] = {
                name: {
                    "files": _dir_data_files(os.path.join(index_dir, rel)),
                    "bytes": _dir_bytes(os.path.join(index_dir, rel)),
                }
                for name, rel in s["tables"].items()
            }
            s["metrics"]["compaction"]["target_file_bytes"] = (
                target_file_bytes
            )
    _write_manifest(index_dir, manifest)
    _task["details"] = {"snapshotId": new_id,
                        "deltaLevelsCollapsed": len(chain) - 1}
    return new_id


def _dir_data_files(path: str) -> int:
    """Data files under ``path`` (markers and checksums excluded)."""
    total = 0
    for _, _, files in os.walk(path):
        total += sum(
            1
            for fn in files
            if not fn.startswith((".", "_"))
        )
    return total


def _n_write_parts(n_docs: int) -> int:
    # ~1M docs per output partition at scale; >=4 for local parallelism
    return max(4, n_docs // 1_000_000)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


# --- stored IVF vector layout (Q16 embedders serving layout) ---------
#
# Lives beside the snapshots in ``{index_dir}/vectors/`` with its own
# tiny JSON meta committed last (same os.replace pattern as the
# manifest): a reader either sees a complete layout or none. The layout
# is a function of the EMBEDDINGS table, which is versioned separately
# from the text corpus (the reference delegates embedding to the
# configured embedder) — rebuild it when embeddings change.

VECTORS_DIR = "vectors"


def _read_vector_meta(index_dir: str) -> "dict | None":
    meta_path = os.path.join(index_dir, VECTORS_DIR, "meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def save_vector_index(vec: "VectorIndex", index_dir: str) -> None:
    """Persist a trained IVF layout: centroids (tiny), assignment
    DIRECTORY-PARTITIONED by centroid_id (one dir per inverted list) —
    the probe-time literal ``centroid_id IN (...)`` filter then prunes
    whole list directories from the scan (plan-tested
    PartitionFilters), so a query reads n_probe/n_centroids of the
    stored bytes instead of all of them.

    The layout is VERSIONED: each save writes a fresh
    ``vectors/base-{k}/`` dir and commits it by rewriting meta.json
    (os.replace) — so a save whose ``assigned`` plan READS the current
    base (a CDC fold, a compaction) never overwrites the files it is
    reading, and a crashed save leaves the old base live. Old bases
    stay on disk until ``expire_vector_bases``."""
    root = os.path.join(index_dir, VECTORS_DIR)
    old = _read_vector_meta(index_dir) or {}
    prev = old.get("base")
    nxt = int(prev.rsplit("-", 1)[1]) + 1 if prev else 1
    base_name = f"base-{nxt:06d}"
    base = os.path.join(root, base_name)
    vec.centroids.repartition(1).sortWithinPartitions(
        "centroid_id"
    ).write.mode("overwrite").parquet(os.path.join(base, "centroids"))
    vec.assigned.repartition(
        max(4, vec.n_centroids), "centroid_id"
    ).sortWithinPartitions(vec.id_col).write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(os.path.join(base, "assigned"))
    # exact per-list balance stats for the retrain signal, computed
    # from the files just written (one partition-column scan, no fold
    # replay); delta commits keep them current via vec_list_delta
    from meilibridge_spark.operators.similarity import ivf_list_stats

    list_stats = ivf_list_stats(
        vec.assigned.sparkSession.read.parquet(
            os.path.join(base, "assigned")
        ),
        vec.n_centroids,
    )
    meta = {
        "n_centroids": vec.n_centroids,
        "n_probe": vec.n_probe,
        "id_col": vec.id_col,
        "vec_col": vec.vec_col,
        "base": base_name,
        "list_stats": list_stats,
    }
    tmp = os.path.join(root, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, "meta.json"))  # commit point
    vec.base = base_name
    vec.dirty = False


def _update_vector_drift(
    index_dir: str, vec: "VectorIndex", list_delta: "DataFrame"
) -> "dict | None":
    """Fold a CDC batch's per-list count delta
    (apply_cdc_vector_index's ``vec_list_delta``: centroid_id, +/-
    delta, <= 2*n_centroids rows) into the committed vectors meta's
    ``list_stats``, keeping the retrain signal current through delta
    commits without rescanning the assignment. No-op when the meta's
    base doesn't match the index's (a retrain/compaction superseded
    the layout) or when the meta predates the stats (legacy — the next
    full save bootstraps them). Meta rewritten via os.replace."""
    from meilibridge_spark.operators.similarity import _stats_from_counts

    meta = _read_vector_meta(index_dir)
    if meta is None or meta.get("base") != vec.base:
        return None
    stats = meta.get("list_stats")
    if not stats or "counts" not in stats:
        return None
    counts = {int(k): int(v) for k, v in stats["counts"].items()}
    for r in list_delta.collect():
        c = int(r["centroid_id"])
        counts[c] = counts.get(c, 0) + int(r["delta"])
    new_stats = _stats_from_counts(
        counts,
        int(meta["n_centroids"]),
        float(stats.get("retrain_skew", 4.0)),
    )
    meta["list_stats"] = new_stats
    root = os.path.join(index_dir, VECTORS_DIR)
    tmp = os.path.join(root, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, "meta.json"))
    return new_stats


def vector_drift_stats(index_dir: str) -> "dict | None":
    """The committed IVF list-balance stats (monitoring surface):
    per-list counts, skew = max list / ideal uniform size, and
    ``retrain_recommended`` — the documented signal to schedule an
    offline retrain (jobs/build_vectors.py) once long CDC chains have
    drifted the fixed-quantizer layout. None when the index has no
    stored vectors or a legacy meta without stats."""
    meta = _read_vector_meta(index_dir)
    return (meta or {}).get("list_stats")


def expire_vector_bases(index_dir: str) -> "list[str]":
    """Drop every vector base dir except the committed current one
    (plus the legacy flat layout's files if a versioned base has
    superseded them). Same serving-safety contract as
    ``expire_snapshots``: an in-flight reader of an old base may fail
    mid-query after expiry — expire from the writer, after serving
    sessions have reloaded. Returns the removed dir/file names."""
    import shutil

    root = os.path.join(index_dir, VECTORS_DIR)
    meta = _read_vector_meta(index_dir)
    if meta is None or "base" not in meta:
        return []
    removed = []
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if name == meta["base"] or name.startswith("meta.json"):
            continue
        if name.startswith("base-") or name in ("centroids", "assigned"):
            shutil.rmtree(path, ignore_errors=True)
            removed.append(name)
    return removed


def load_vector_index(
    spark: SparkSession, index_dir: str
) -> "VectorIndex | None":
    """Load the stored IVF layout, or None when the index has none
    (the meta.json commit marker is the existence check). Reads the
    committed ``base-{k}`` dir; pre-versioning flat layouts (no
    ``base`` key in meta.json) still load."""
    meta = _read_vector_meta(index_dir)
    if meta is None:
        return None
    base = os.path.join(index_dir, VECTORS_DIR, meta.get("base", ""))
    # partition-column inference types centroid_id as int; restore the
    # long the engine uses everywhere (pruning survives the upcast —
    # Catalyst unwraps the cast around the literal IN, plan-tested)
    assigned = spark.read.parquet(os.path.join(base, "assigned"))
    assigned = assigned.withColumn(
        "centroid_id", F.col("centroid_id").cast("long")
    )
    return VectorIndex(
        centroids=spark.read.parquet(os.path.join(base, "centroids")),
        assigned=assigned,
        n_centroids=int(meta["n_centroids"]),
        n_probe=int(meta["n_probe"]),
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
        base=meta.get("base"),
    )


# --- index aliases (Meilisearch POST /swap-indexes analog) -----------
#
# Meilisearch swaps two indexes atomically so a freshly rebuilt index
# can replace the live one with zero downtime (docs.meilisearch.com
# swap-indexes). The analog here is one JSON file mapping logical
# names -> index_dirs, committed with the same os.replace pattern as
# the snapshot manifest: readers resolve the alias at load time, and a
# swap is a single atomic file replace — a reader either sees the old
# pair or the new pair, never a half-swap.


def _read_aliases(aliases_path: str) -> dict:
    if not os.path.exists(aliases_path):
        return {}
    with open(aliases_path) as f:
        return json.load(f)


def _write_aliases(aliases_path: str, aliases: dict) -> None:
    tmp = aliases_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(aliases, f, indent=1, sort_keys=True)
    os.replace(tmp, aliases_path)  # atomic commit point


def set_alias(aliases_path: str, name: str, index_dir: str) -> None:
    """Point logical index ``name`` at ``index_dir`` (create/update)."""
    aliases = _read_aliases(aliases_path)
    aliases[name] = index_dir
    _write_aliases(aliases_path, aliases)


def resolve_alias(aliases_path: str, name: str) -> str:
    aliases = _read_aliases(aliases_path)
    if name not in aliases:
        raise KeyError(
            f"no alias {name!r} in {aliases_path}; "
            f"have: {sorted(aliases)}"
        )
    return aliases[name]


def swap_aliases(aliases_path: str, a: str, b: str) -> None:
    """Atomically swap what two logical names point at (the
    swap-indexes zero-downtime reindex pattern: build into a scratch
    alias, then swap it with the live one). Both names must exist —
    swapping with an unset name is a loud error, like Meilisearch's
    index_not_found for swaps."""
    from meilibridge_spark.sources.tasks import task_scope

    # indexSwap task journaled beside the alias registry (the registry
    # dir plays the instance role for this instance-level operation)
    with task_scope(
        os.path.dirname(os.path.abspath(aliases_path)) or ".",
        "indexSwap",
        details={"swaps": [{"indexes": sorted((a, b))}]},
    ):
        aliases = _read_aliases(aliases_path)
        for n in (a, b):
            if n not in aliases:
                raise KeyError(
                    f"alias {n!r} not found; have: {sorted(aliases)}"
                )
        aliases[a], aliases[b] = aliases[b], aliases[a]
        _write_aliases(aliases_path, aliases)


def load_aliased(
    spark: SparkSession,
    aliases_path: str,
    name: str,
    cfg: IndexConfig,
    snapshot_id: "int | None" = None,
) -> InvertedIndex:
    """load_snapshot through the alias indirection."""
    return load_snapshot(
        spark, resolve_alias(aliases_path, name), cfg, snapshot_id
    )
