"""S25 view indirection: indexing a JOIN VIEW and maintaining it from
CDC on the base table (reference: Collection "col:view",
config/type.go:115-143; view-aware CDC re-fetch mongo.go:196-205)."""

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import AnalyzerConfig, IndexConfig
from meilibridge_spark.operators.search import search
from meilibridge_spark.operators.views import sync_view_index, view_cdc_events
from meilibridge_spark.plans.build import build_index
from meilibridge_spark.sources.cdc import apply_events, generate_cdc_batch
from meilibridge_spark.sources.transcripts import generate_transcripts

CFG = IndexConfig(
    index_name="view-idx",
    primary_key=("conv_id", "turn_idx"),
    analyzer=AnalyzerConfig.make(stop_words=["ba"]),
)

TOPICS = ["quasar", "nebula", "pulsar"]


def _dim(spark, base):
    convs = sorted(
        r["conv_id"] for r in base.select("conv_id").distinct().collect()
    )
    rows = [(c, TOPICS[i % len(TOPICS)]) for i, c in enumerate(convs)]
    return spark.createDataFrame(rows, "conv_id string, topic string")


def _view(base, dim):
    """The join view: every turn's text is enriched with its conv's dim
    topic — a broadcast join Spark performs where the reference's
    source DB performed it."""
    return base.join(F.broadcast(dim), "conv_id").select(
        "conv_id",
        "turn_idx",
        "role",
        F.concat_ws(" ", "text", "topic").alias("text"),
        "tool",
        "ts",
    )


@pytest.fixture(scope="module")
def setup(spark):
    base = generate_transcripts(spark, n_convs=12, seed=9).persist()
    dim = _dim(spark, base)
    index = build_index(_view(base, dim), CFG)
    index.postings = index.postings.persist()
    index.postings.count()
    return base, dim, index


def test_view_index_searches_join_side_terms(setup):
    base, dim, index = setup
    # a dim-only term matches all turns of its convs
    hits = search(index, "quasar", 10**6)
    topic_convs = {r["conv_id"] for r in dim.filter(F.col("topic") == "quasar").collect()}
    hit_convs = {
        r["conv_id"]
        for r in hits.join(index.docs.select("doc_id", "conv_id"), "doc_id").collect()
    }
    assert hit_convs == topic_convs


def _postings_pdf(postings):
    pdf = postings.toPandas().sort_values(["term", "block_id"]).reset_index(drop=True)
    for col in ("docs_bin", "tfs_bin", "dls_bin"):
        pdf[col] = pdf[col].map(bytes)
    return pdf


def test_cdc_on_base_reindexes_through_view(spark, setup):
    """CDC events on the BASE table maintain the view-backed index:
    the merged index is byte-identical to a fresh build of the final
    view state (same doc_id assignment)."""
    base, dim, index = setup
    cdc = generate_cdc_batch(
        spark, base, seed=5, n_updates=6, n_inserts=4, n_deletes=3, n_replaces=3
    )
    base2 = apply_events(base, cdc).persist()
    view2 = _view(base2, dim)
    new = sync_view_index(index, view2, cdc, CFG)
    new.postings = new.postings.persist()

    final_src = new.docs.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "doc_id"
    )
    fresh = build_index(final_src, CFG, doc_id_col="doc_id")
    a, b = _postings_pdf(new.postings), _postings_pdf(fresh.postings)
    assert len(a) == len(b)
    for col in a.columns:
        assert a[col].tolist() == b[col].tolist(), f"postings column {col} differs"
    assert new.n_docs == fresh.n_docs

    # view semantics survived the merge: replaced/inserted turns carry
    # their conv's topic term (the view re-fetch happened)
    view_rows = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in view2.collect()
    }
    doc_rows = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in new.docs.collect()
    }
    assert doc_rows == view_rows


def test_view_cdc_events_shape(spark, setup):
    base, dim, index = setup
    cdc = generate_cdc_batch(
        spark, base, seed=6, n_updates=2, n_inserts=1, n_deletes=2, n_replaces=0
    )
    base2 = apply_events(base, cdc)
    ev = view_cdc_events(_view(base2, dim), cdc)
    ops = {r["op"] for r in ev.select("op").distinct().collect()}
    assert ops == {"replace", "delete"}
    # every touched key appears exactly once
    assert ev.count() == cdc.select("conv_id", "turn_idx").distinct().count()


def test_base_insert_outside_view_is_noop(spark, setup):
    """A base-table insert for a key the VIEW drops (conv missing from
    the dim join) must produce a delete no-op, not a ghost doc."""
    import datetime as dt

    from meilibridge_spark.sources.cdc import CDC_SCHEMA

    base, dim, index = setup
    ts = dt.datetime(2026, 7, 1)
    ev = spark.createDataFrame(
        [(
            "insert", "conv-not-in-dim", 0,
            ("conv-not-in-dim", 0, "user", "orphan text quasar", None, ts),
            None, None, ts,
        )],
        CDC_SCHEMA,
    )
    base2 = base.unionByName(
        spark.createDataFrame(
            [("conv-not-in-dim", 0, "user", "orphan text quasar", None, ts)],
            base.schema,
        )
    )
    ev_view = view_cdc_events(_view(base2, dim), ev)
    rows = ev_view.collect()
    assert len(rows) == 1 and rows[0]["op"] == "delete"
    from meilibridge_spark.operators.views import sync_view_index

    new = sync_view_index(index, _view(base2, dim), ev, CFG)
    assert new.n_docs == index.n_docs  # nothing added
    assert (
        new.docs.filter(F.col("conv_id") == "conv-not-in-dim").count() == 0
    )
