"""S25 view indirection as real Spark joins.

The reference's ``Collection "collection:view"`` (config/type.go:115-143)
makes the bridge READ a source-side view while WATCHING the base
collection: bulk scans read the view (pkg/database/sql.go:98-102,
pkg/database/mongo.go:147-159) and every CDC event triggers a re-fetch
of the view ROW by id before upserting (pkg/bridge/mongo.go:196-205).
The canonical example is the ``user_books`` join view
(integration/sql/sample.sql:40-58).

In Spark the view itself needs no operator — it is a DataFrame
expression (joins/projections) over base tables, and Catalyst
broadcasts small dims / pushes predicates on its own. What this module
supplies is the CDC leg: turning a CDC batch on the BASE table into a
view-shaped CDC batch — ``replace`` events "re-fetched" from the view
for every touched key still present, ``delete`` for keys that left the
view — so the standard exact incremental MERGE (plans/incremental.py)
maintains a view-backed index. Unlike the reference's per-event
``FindOne``, the re-fetch is ONE semi-join of the view against the
touched keys (cost ∝ touched keys, not corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meilibridge_spark.sources.cdc import CDC_SCHEMA
from meilibridge_spark.sources.transcripts import TRANSCRIPT_SCHEMA

_DOC_T = CDC_SCHEMA["full_document"].dataType


def view_cdc_events(
    view_df: DataFrame,
    base_cdc: DataFrame,
    key_cols: "tuple[str, str]" = ("conv_id", "turn_idx"),
) -> DataFrame:
    """CDC batch on the base table -> CDC batch on the VIEW (CDC_SCHEMA).

    ``view_df`` must already reflect the post-CDC base state (the view
    is a lazy expression over the base tables, so passing the view built
    over the updated base is the natural call). Every key touched by
    ``base_cdc`` becomes either a ``replace`` carrying the re-fetched
    view row, or a ``delete`` when the key no longer appears in the
    view (deleted from base, or dropped by the view's join/filter).
    """
    kc = list(key_cols)
    keys = base_cdc.groupBy(*kc).agg(F.max("ts").alias("_ev_ts"))
    # per-field casts (not a whole-struct cast: TRANSCRIPT_SCHEMA has
    # non-nullable fields and a nullable->non-null struct cast is
    # rejected; union/merge only needs matching field names and types)
    doc_struct = F.struct(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in TRANSCRIPT_SCHEMA.fields
        ]
    )
    refreshed = view_df.join(keys, kc, "inner")
    rep = refreshed.select(
        F.lit("replace").alias("op"),
        *kc,
        doc_struct.alias("full_document"),
        F.lit(None).cast("map<string,string>").alias("updated_fields"),
        F.lit(None).cast("array<string>").alias("removed_fields"),
        F.col("_ev_ts").alias("ts"),
    )
    gone = keys.join(view_df.select(*kc), kc, "left_anti").select(
        F.lit("delete").alias("op"),
        *kc,
        F.lit(None).cast(_DOC_T).alias("full_document"),
        F.lit(None).cast("map<string,string>").alias("updated_fields"),
        F.lit(None).cast("array<string>").alias("removed_fields"),
        F.col("_ev_ts").alias("ts"),
    )
    return rep.unionByName(gone)


def sync_view_index(index, view_df: DataFrame, base_cdc: DataFrame, cfg=None):
    """Maintain a view-backed index from base-table CDC (the Spark shape
    of the reference's view-aware insert/update/replace handlers,
    pkg/bridge/mongo.go:185-306): re-fetch touched view rows, then the
    exact incremental MERGE."""
    from meilibridge_spark.plans.incremental import apply_cdc

    return apply_cdc(index, view_cdc_events(view_df, base_cdc), cfg)
