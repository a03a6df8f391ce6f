"""CDC maintenance of the stored IVF vector layout (round 4:
operators/similarity.apply_cdc_vector_index wired through
plans/incremental.apply_cdc and the snapshot delta machinery).

Covers: deleted docs' vectors leave the assignment (no ghost semantic
hits), pk-shaped and id-shaped vector upserts assigned to the FIXED
stored centroids, merge-on-read delta commits + load folding, full
saves rewriting a fresh versioned base (dirty flag), the superseded-
base fold guard, base expiry, and the no-layout error.
"""

import math
import os

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import IndexConfig
from meilibridge_spark.operators.similarity import (
    apply_cdc_vector_index,
    build_vector_index,
    similar_documents,
)
from meilibridge_spark.plans.build import build_and_save
from meilibridge_spark.plans.incremental import apply_cdc
from meilibridge_spark.sources.cdc import generate_cdc_batch
from meilibridge_spark.sources.tables import (
    expire_vector_bases,
    load_snapshot,
    load_vector_index,
    save_snapshot,
    save_snapshot_delta,
    save_vector_index,
    snapshot_log,
)
from meilibridge_spark.sources.transcripts import generate_transcripts

CFG = IndexConfig(index_name="veccdc")


def _emb_rows(doc_ids):
    # deterministic 2-d unit vectors keyed by doc id
    return [
        (int(d), [math.cos(0.1 * d), math.sin(0.1 * d)]) for d in doc_ids
    ]


def _build(spark, tmp_index_dir, n_convs=25):
    src = generate_transcripts(spark, n_convs=n_convs, seed=42).persist()
    idx = build_and_save(spark, src, CFG, tmp_index_dir)
    ids = [r["doc_id"] for r in idx.docs.select("doc_id").collect()]
    emb = spark.createDataFrame(
        _emb_rows(ids), "vec_id long, embedding array<double>"
    )
    vec = build_vector_index(emb, n_centroids=2, n_probe=2, train_iters=2)
    save_vector_index(vec, tmp_index_dir)
    return src, load_snapshot(spark, tmp_index_dir, CFG)


def _assigned_ids(vec):
    return {r["vec_id"] for r in vec.assigned.select("vec_id").collect()}


def test_cdc_deletes_drop_vectors(spark, tmp_index_dir):
    src, idx = _build(spark, tmp_index_dir)
    assert idx.vectors is not None and idx.vectors.base == "base-000001"
    cdc = generate_cdc_batch(spark, src, seed=7)
    deleted_keys = {
        (r["conv_id"], r["turn_idx"])
        for r in cdc.filter(F.col("op") == "delete").collect()
    }
    dead_ids = {
        r["doc_id"]
        for r in idx.docs.select("conv_id", "turn_idx", "doc_id").collect()
        if (r["conv_id"], r["turn_idx"]) in deleted_keys
    }
    assert dead_ids  # fixture produces real deletes of existing docs
    merged = apply_cdc(idx, cdc)
    assert merged.vectors is not None and merged.vectors.dirty
    got = _assigned_ids(merged.vectors)
    assert got == _assigned_ids(idx.vectors) - dead_ids
    # ghost prevention end-to-end: similar-docs off the stored path
    # never surfaces a deleted doc
    target = next(iter(got))
    sim = similar_documents(
        merged.vectors.assigned,
        [target],
        k=len(got),
        vectors=merged.vectors,
    )
    assert not ({r["vec_id"] for r in sim.collect()} & dead_ids)


def test_pk_shaped_vector_upserts(spark, tmp_index_dir):
    src, idx = _build(spark, tmp_index_dir)
    cdc = generate_cdc_batch(
        spark, src, seed=9, n_deletes=0, n_updates=4, n_inserts=3,
        n_replaces=0,
    )
    merged0 = apply_cdc(idx, cdc)
    # vectors for the INSERTED docs, keyed by primary key (the
    # `_vectors` document-field shape — caller never sees doc ids)
    ins = cdc.filter(F.col("op") == "insert").select(
        "conv_id", "turn_idx"
    )
    vcd = ins.withColumn(
        "embedding",
        F.array(F.lit(0.6), F.lit(0.8)).cast("array<double>"),
    )
    merged = apply_cdc(idx, cdc, vectors_cdc=vcd)
    new_ids = (
        merged.docs.join(ins, ["conv_id", "turn_idx"])
        .select("doc_id")
        .collect()
    )
    new_ids = {r["doc_id"] for r in new_ids}
    assert new_ids and new_ids <= _assigned_ids(merged.vectors)
    assert new_ids & (_assigned_ids(merged.vectors) - _assigned_ids(merged0.vectors)) == new_ids
    # assigned against the FIXED stored centroids (no retraining):
    # centroids object is the same frame
    assert merged.vectors.centroids is idx.vectors.centroids
    rows = {
        r["vec_id"]: r["embedding"]
        for r in merged.vectors.assigned.filter(
            F.col("vec_id").isin([int(i) for i in new_ids])
        ).collect()
    }
    assert all(v == [0.6, 0.8] for v in rows.values())


def test_id_shaped_upsert_replaces(spark, tmp_index_dir):
    _, idx = _build(spark, tmp_index_dir)
    some_id = min(_assigned_ids(idx.vectors))
    up = idx.docs.sparkSession.createDataFrame(
        [(int(some_id), [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    vec2, delta = apply_cdc_vector_index(idx.vectors, upserts=up)
    assert _assigned_ids(vec2) == _assigned_ids(idx.vectors)
    got = vec2.assigned.filter(F.col("vec_id") == some_id).collect()
    assert len(got) == 1 and got[0]["embedding"] == [0.0, 1.0]
    assert {r["vec_id"] for r in delta["vec_touched_ids"].collect()} == {
        some_id
    }


def test_delta_commit_folds_at_load(spark, tmp_index_dir):
    src, idx = _build(spark, tmp_index_dir)
    cdc = generate_cdc_batch(spark, src, seed=7)
    merged = apply_cdc(idx, cdc)
    assert "vec_touched_ids" in merged.delta
    save_snapshot_delta(merged, tmp_index_dir)
    entry = snapshot_log(tmp_index_dir)[-1]
    assert entry["vec_base"] == "base-000001"
    assert "vec_touched_ids" in entry["tables"]
    loaded = load_snapshot(spark, tmp_index_dir, CFG)
    assert loaded.vectors.dirty  # folded at load, base not yet rewritten
    assert _assigned_ids(loaded.vectors) == _assigned_ids(merged.vectors)


def test_full_save_rewrites_base(spark, tmp_index_dir):
    src, idx = _build(spark, tmp_index_dir)
    cdc = generate_cdc_batch(spark, src, seed=7)
    merged = apply_cdc(idx, cdc)
    want = _assigned_ids(merged.vectors)
    save_snapshot(merged, tmp_index_dir)
    assert merged.vectors.base == "base-000002"
    assert not merged.vectors.dirty
    assert os.path.isdir(
        os.path.join(tmp_index_dir, "vectors", "base-000002")
    )
    loaded = load_snapshot(spark, tmp_index_dir, CFG)
    assert loaded.vectors.base == "base-000002"
    assert not loaded.vectors.dirty  # self-contained, no fold needed
    assert _assigned_ids(loaded.vectors) == want
    # expiry drops the superseded base only
    removed = expire_vector_bases(tmp_index_dir)
    assert removed == ["base-000001"]
    assert _assigned_ids(load_vector_index(spark, tmp_index_dir)) == want


def test_superseded_base_guard_skips_fold(spark, tmp_index_dir):
    src, idx = _build(spark, tmp_index_dir)
    cdc = generate_cdc_batch(spark, src, seed=7)
    merged = apply_cdc(idx, cdc)
    save_snapshot_delta(merged, tmp_index_dir)
    # a retrain AFTER the delta commit writes base-000002; the pending
    # delta (computed against base-000001) must NOT re-apply onto it
    ids = [r["doc_id"] for r in merged.docs.select("doc_id").collect()]
    emb2 = spark.createDataFrame(
        _emb_rows(ids), "vec_id long, embedding array<double>"
    )
    vec2 = build_vector_index(emb2, n_centroids=2, n_probe=2, train_iters=2)
    save_vector_index(vec2, tmp_index_dir)
    loaded = load_snapshot(spark, tmp_index_dir, CFG)
    assert loaded.vectors.base == "base-000002"
    assert not loaded.vectors.dirty
    assert _assigned_ids(loaded.vectors) == set(ids)


def test_compaction_rewrites_vector_base(spark, tmp_index_dir):
    """compact_snapshot collapses a delta chain THAT CARRIES vector
    deltas: load folds them (dirty), the full save inside compaction
    writes a fresh base, and the compacted snapshot serves the folded
    assignment with zero delta tables."""
    from meilibridge_spark.sources.tables import compact_snapshot

    src, idx = _build(spark, tmp_index_dir)
    cdc = generate_cdc_batch(spark, src, seed=7)
    merged = apply_cdc(idx, cdc)
    want = _assigned_ids(merged.vectors)
    save_snapshot_delta(merged, tmp_index_dir)
    compact_snapshot(spark, tmp_index_dir, CFG)
    loaded = load_snapshot(spark, tmp_index_dir, CFG)
    assert loaded.vectors.base == "base-000002"
    assert not loaded.vectors.dirty
    assert _assigned_ids(loaded.vectors) == want
    entry = snapshot_log(tmp_index_dir)[-1]
    assert not entry.get("delta") and "vec_touched_ids" not in entry["tables"]


def test_ivf_drift_stats_written_and_delta_updated(spark, tmp_index_dir):
    """Every base write records exact per-list balance stats in the
    vectors meta; delta commits keep them current via the
    vec_list_delta counts — incrementally-folded stats equal a fresh
    recount of the folded assignment."""
    from meilibridge_spark.operators.similarity import ivf_list_stats
    from meilibridge_spark.sources.tables import vector_drift_stats

    src, idx = _build(spark, tmp_index_dir)
    stats0 = vector_drift_stats(tmp_index_dir)
    n_emb = idx.vectors.assigned.count()
    assert stats0 is not None
    assert stats0["n_vectors"] == n_emb
    assert stats0["n_centroids"] == 2
    assert sum(stats0["counts"].values()) == n_emb
    # unit vectors wrap the circle: both lists populated, skew <= 2
    assert not stats0["retrain_recommended"]
    cdc = generate_cdc_batch(spark, src, seed=7)
    merged = apply_cdc(idx, cdc)
    assert "vec_list_delta" in merged.delta
    save_snapshot_delta(merged, tmp_index_dir)
    stats1 = vector_drift_stats(tmp_index_dir)
    recount = ivf_list_stats(merged.vectors.assigned, 2)
    assert stats1["counts"] == recount["counts"]
    assert stats1["n_vectors"] == recount["n_vectors"]
    assert stats1["skew"] == recount["skew"]


def test_heavy_skewed_cdc_trips_retrain_signal(spark, tmp_index_dir):
    """The documented retrain threshold: a long skewed upsert chain
    piles vectors into one fixed list; once max list / ideal exceeds
    RETRAIN_SKEW (or a list starves empty) the committed meta says
    retrain_recommended."""
    from meilibridge_spark.operators.similarity import (
        RETRAIN_SKEW,
        build_vector_index,
        ivf_list_stats,
    )
    from meilibridge_spark.sources.tables import vector_drift_stats

    src = generate_transcripts(spark, n_convs=25, seed=42).persist()
    idx0 = build_and_save(spark, src, CFG, tmp_index_dir)
    ids = [r["doc_id"] for r in idx0.docs.select("doc_id").collect()]
    emb = spark.createDataFrame(
        _emb_rows(ids), "vec_id long, embedding array<double>"
    )
    vec = build_vector_index(emb, n_centroids=8, n_probe=2, train_iters=3)
    save_vector_index(vec, tmp_index_dir)
    idx = load_snapshot(spark, tmp_index_dir, CFG)
    assert not vector_drift_stats(tmp_index_dir)["retrain_recommended"]
    # skewed CDC: most docs' vectors rewritten to ONE direction ->
    # that direction's fixed list swells way past the uniform size
    cdc = generate_cdc_batch(
        spark, src, seed=3, n_deletes=0, n_inserts=0,
        n_updates=150, n_replaces=0,
    )
    vcd = cdc.filter(F.col("op") == "update").select(
        "conv_id", "turn_idx"
    ).withColumn(
        "embedding", F.array(F.lit(0.6), F.lit(0.8)).cast("array<double>")
    )
    merged = apply_cdc(idx, cdc, vectors_cdc=vcd)
    save_snapshot_delta(merged, tmp_index_dir)
    stats = vector_drift_stats(tmp_index_dir)
    assert stats["retrain_recommended"]
    assert stats["skew"] > RETRAIN_SKEW or stats["empty_lists"] > 0
    # the incremental fold stays exact under the heavy batch
    recount = ivf_list_stats(merged.vectors.assigned, 8)
    assert stats["counts"] == recount["counts"]
    # an offline retrain (fresh base) resets the signal
    vec2 = build_vector_index(
        merged.vectors.assigned.select("vec_id", "embedding"),
        n_centroids=2, n_probe=2, train_iters=3,
    )
    save_vector_index(vec2, tmp_index_dir)
    stats2 = vector_drift_stats(tmp_index_dir)
    assert stats2["n_centroids"] == 2
    assert not stats2["retrain_recommended"]


def test_vectors_cdc_without_layout_raises(spark, tmp_index_dir):
    src = generate_transcripts(spark, n_convs=10, seed=42)
    idx = build_and_save(spark, src, CFG, tmp_index_dir)
    cdc = generate_cdc_batch(spark, src, seed=7)
    vcd = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no stored vector"):
        apply_cdc(idx, cdc, vectors_cdc=vcd)


def test_upsert_missing_vec_col_raises(spark, tmp_index_dir):
    _, idx = _build(spark, tmp_index_dir, n_convs=10)
    bad = spark.createDataFrame([(0,)], "vec_id long")
    with pytest.raises(ValueError, match="missing"):
        apply_cdc_vector_index(idx.vectors, upserts=bad)
    with pytest.raises(ValueError, match="deletes or upserts"):
        apply_cdc_vector_index(idx.vectors)


def test_streaming_delta_commits_maintain_vectors(spark, tmp_index_dir, tmp_path):
    """start_cdc_sync(delta_commits=True) over an index with a stored
    vector layout: every micro-batch's vector maintenance rides its
    delta commit, and the reloaded tip's assignment has the deleted
    docs' vectors gone."""
    from meilibridge_spark.streaming.cdc_stream import start_cdc_sync

    src, idx = _build(spark, tmp_index_dir)
    before = _assigned_ids(idx.vectors)
    cdc = generate_cdc_batch(spark, src, seed=7)
    cdc_dir = str(tmp_path / "cdc")
    cdc.write.mode("overwrite").parquet(cdc_dir)
    q = start_cdc_sync(
        spark,
        cdc_path=cdc_dir,
        index_dir=tmp_index_dir,
        cfg=CFG,
        checkpoint_dir=str(tmp_path / "ckpt"),
        delta_commits=True,
    )
    q.awaitTermination(120)
    entry = snapshot_log(tmp_index_dir)[-1]
    assert entry["delta"] is True and "vec_touched_ids" in entry["tables"]
    loaded = load_snapshot(spark, tmp_index_dir, CFG)
    want = apply_cdc(
        load_snapshot(spark, tmp_index_dir, CFG, snapshot_id=1),
        spark.read.parquet(cdc_dir),
    )
    got = _assigned_ids(loaded.vectors)
    assert got == _assigned_ids(want.vectors)
    assert got < before  # deletes really dropped vectors


def test_retrain_vector_index_resets_drift(spark, tmp_index_dir):
    """The action end of the drift loop: after a skewed CDC chain trips
    retrain_recommended, retrain_vector_index re-trains on the CURRENT
    (folded) vectors, keeps the layout params by default, lands as a
    NEW versioned base whose committed stats clear the signal, and the
    probed search still answers over the retrained lists."""
    from meilibridge_spark.operators.similarity import (
        retrain_vector_index,
    )
    from meilibridge_spark.sources.tables import vector_drift_stats

    src = generate_transcripts(spark, n_convs=25, seed=42).persist()
    idx0 = build_and_save(spark, src, CFG, tmp_index_dir)
    ids = [r["doc_id"] for r in idx0.docs.select("doc_id").collect()]
    emb = spark.createDataFrame(
        _emb_rows(ids), "vec_id long, embedding array<double>"
    )
    vec = build_vector_index(emb, n_centroids=8, n_probe=2, train_iters=3)
    save_vector_index(vec, tmp_index_dir)
    idx = load_snapshot(spark, tmp_index_dir, CFG)
    # skew: rewrite most vectors to one direction (fixed quantizer)
    cdc = generate_cdc_batch(
        spark, src, seed=3, n_deletes=0, n_inserts=0,
        n_updates=150, n_replaces=0,
    )
    vcd = cdc.filter(F.col("op") == "update").select(
        "conv_id", "turn_idx"
    ).withColumn(
        "embedding", F.array(F.lit(0.6), F.lit(0.8)).cast("array<double>")
    )
    merged = apply_cdc(idx, cdc, vectors_cdc=vcd)
    save_snapshot_delta(merged, tmp_index_dir)
    old_base = merged.vectors.base
    assert vector_drift_stats(tmp_index_dir)["retrain_recommended"]

    # the skewed mass is 150 copies of ONE direction — no 8-centroid
    # layout can balance that, so the maintenance decision here is to
    # retrain AT a coarser n_centroids (the operator takes overrides;
    # n_probe still carries from the drifted layout by default)
    new_vec = retrain_vector_index(
        merged.vectors, n_centroids=2, train_iters=3
    )
    assert new_vec.n_centroids == 2 and new_vec.n_probe == 2
    # same vector population, CDC folds included
    assert _assigned_ids(new_vec) == _assigned_ids(merged.vectors)
    save_vector_index(new_vec, tmp_index_dir)
    assert new_vec.base != old_base  # fresh versioned base
    stats = vector_drift_stats(tmp_index_dir)
    assert stats["n_centroids"] == 2
    assert not stats["retrain_recommended"]
    assert stats["n_vectors"] == len(ids)

    # reload: the retrained base serves; the old-base delta is NOT
    # re-folded onto it (vec_base guard) — the population stays exact
    idx2 = load_snapshot(spark, tmp_index_dir, CFG)
    assert idx2.vectors.base == new_vec.base
    assert _assigned_ids(idx2.vectors) == _assigned_ids(new_vec)
    sim = similar_documents(
        idx2.vectors.assigned.select("vec_id", "embedding"),
        [ids[0]], k=3, method="auto", vectors=idx2.vectors,
    )
    assert sim.count() == 3
