"""Document-payload ingestion (sources/ingest.py): the Meilisearch
payload formats (NDJSON, CSV with typed headers) as schema-enforced
distributed reads; an index built from any format is byte-identical
to the parquet build of the same rows."""

import json
import os

import pytest

from meilibridge_spark.config import IndexConfig
from meilibridge_spark.operators.search import search
from meilibridge_spark.plans.build import build_index
from meilibridge_spark.sources.ingest import parse_csv_typed_header, read_documents
from meilibridge_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)


def test_csv_typed_header_parsing():
    assert parse_csv_typed_header("title") == ("title", "string")
    assert parse_csv_typed_header("price:number") == ("price", "double")
    assert parse_csv_typed_header("ok:boolean") == ("ok", "boolean")
    assert parse_csv_typed_header("a:b:number") == ("a:b", "double")
    for bad in ("price:float", ":number", "x:"):
        with pytest.raises(ValueError, match="CSV header"):
            parse_csv_typed_header(bad)
    with pytest.raises(ValueError, match="fmt must be"):
        read_documents(None, "p", fmt="xml")


@pytest.fixture(scope="module")
def payloads(spark, tmp_path_factory):
    """The same 3-turn corpus in parquet / ndjson / csv form."""
    d = tmp_path_factory.mktemp("payloads")
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "hello spark world", "tool": None,
         "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "hello again", "tool": "bash",
         "ts": "2026-01-01T00:01:00"},
        {"conv_id": "c2", "turn_idx": 0, "role": "user",
         "text": "unrelated text", "tool": None,
         "ts": "2026-01-01T00:02:00"},
    ]
    with open(d / "docs.ndjson", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(d / "docs.csv", "w") as f:
        f.write("conv_id,turn_idx:number,role,text,tool,ts\n")
        for r in rows:
            f.write(
                f"{r['conv_id']},{r['turn_idx']},{r['role']},"
                f"{r['text']},{r['tool'] or ''},{r['ts']}\n"
            )
    pq = str(d / "docs.parquet")
    spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", __import__("pyspark").sql.functions.to_timestamp("ts")
                 ).write.parquet(pq)
    return {"dir": str(d), "parquet": pq,
            "ndjson": str(d / "docs.ndjson"), "csv": str(d / "docs.csv")}


def test_formats_build_identical_indexes(spark, payloads):
    cfg = IndexConfig(index_name="ingest")
    base = build_index(
        read_documents(spark, payloads["parquet"], "parquet",
                       schema=TRANSCRIPT_SCHEMA), cfg)
    want = [(r["doc_id"], round(r["score"], 9))
            for r in search(base, "hello spark", 10).collect()]
    assert want  # sanity: the corpus matches

    for fmt in ("ndjson", "csv"):
        df = read_documents(spark, payloads[fmt], fmt,
                            schema=TRANSCRIPT_SCHEMA)
        assert [f.name for f in df.schema.fields] == [
            f.name for f in TRANSCRIPT_SCHEMA.fields]
        idx = build_index(df, cfg)
        got = [(r["doc_id"], round(r["score"], 9))
               for r in search(idx, "hello spark", 10).collect()]
        assert got == want, fmt


def test_csv_typed_casts(spark, payloads):
    df = read_documents(spark, payloads["csv"], "csv")
    types = dict(df.dtypes)
    assert types["turn_idx"] == "double"  # :number
    assert types["conv_id"] == "string"   # bare header


def test_ndjson_schema_mismatch_is_loud(spark, tmp_path):
    p = tmp_path / "bad.ndjson"
    p.write_text('{"conv_id": "c"}\nnot json at all\n')
    with pytest.raises(ValueError, match="malformed JSON"):
        read_documents(spark, str(p), "ndjson")


def test_conform_missing_column_is_loud(spark, payloads):
    """csv/parquet route through _conform (loud on missing columns);
    ndjson pushes the schema into the read, where Spark's standard
    semi-structured semantics null-fill absent fields instead."""
    for fmt in ("csv", "parquet"):
        with pytest.raises(ValueError, match="missing required columns"):
            read_documents(spark, payloads[fmt], fmt,
                           schema="conv_id string, nope int")
    df = read_documents(spark, payloads["ndjson"], "ndjson",
                        schema="conv_id string, nope int")
    assert df.where(df.nope.isNotNull()).count() == 0
