"""Document-payload ingestion — the formats Meilisearch accepts on
``POST /indexes/{uid}/documents`` (NDJSON, CSV with typed headers,
JSON arrays) plus parquet, as distributed Spark reads.

The reference ingests from MongoDB/SQL and ships documents to
Meilisearch as JSON payloads (pkg/bridge/*.go); this engine indexes
DataFrames directly, so payload ingestion is just a schema-enforced
``spark.read``. What's worth implementing faithfully is Meilisearch's
CSV typed-header convention (``field:type`` column names, types
``string``/``number``/``boolean``) — headers carry the schema, so the
read needs NO inference pass (at 100 TB an inferSchema scan reads the
whole input twice; typed headers and explicit schemas read it once).

Scale notes baked in:
- ndjson/json: pass ``schema`` (or use TRANSCRIPT_SCHEMA) — schemaless
  ``spark.read.json`` runs a full inference job first; we allow it but
  only for convenience at small scale.
- csv: header row parsed driver-side from COLUMN NAMES (Spark already
  exposes them post-read); values are read as strings and cast
  JVM-side per the typed header — no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Meilisearch CSV typed-header types -> Spark cast targets
#: (docs.meilisearch.com: only string and number are documented;
#: boolean accepted here as a useful superset, recorded deviation)
_CSV_TYPES = {"string": "string", "number": "double", "boolean": "boolean"}

FORMATS = ("parquet", "ndjson", "json", "csv")


def parse_csv_typed_header(name: str) -> "tuple[str, str]":
    """``'price:number'`` -> ('price', 'double'); bare names are
    strings (Meilisearch's default). Unknown types are a loud error,
    like the engine's invalid_document_csv error."""
    if ":" in name:
        field, _, typ = name.rpartition(":")
        if not field or typ not in _CSV_TYPES:
            raise ValueError(
                f"CSV header {name!r}: expected 'field' or "
                f"'field:type' with type in {sorted(_CSV_TYPES)}"
            )
        return field, _CSV_TYPES[typ]
    return name, "string"


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
) -> DataFrame:
    """Read a document payload as a DataFrame ready for
    ``build_and_save``. ``schema`` (a StructType or DDL string) skips
    inference for ndjson/json; CSV takes its schema from typed headers.
    """
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    if fmt == "parquet":
        df = spark.read.parquet(path)
        if schema is not None:
            df = _conform(df, schema)
        return df
    if fmt in ("ndjson", "json"):
        reader = spark.read
        if schema is not None:
            # pushed schema = one pass, no inference job. Spark fills
            # absent fields with NULL rather than erroring (standard
            # semi-structured semantics); per-field presence
            # enforcement is the build's pk validation job, not the
            # read's.
            reader = reader.schema(schema)
        # multiLine=False (default) is the NDJSON shape: one document
        # per line, splittable — a JSON ARRAY payload needs
        # multiLine=True and is NOT splittable; ndjson is the scale
        # format, exactly why Meilisearch recommends it for big imports
        df = reader.json(path)
        if "_corrupt_record" in df.columns:
            raise ValueError(
                f"{path}: malformed JSON lines (schema mismatch or "
                "corrupt records) — fix the payload or the schema"
            )
        return df
    # csv: strings in, typed header casts applied JVM-side
    raw = spark.read.option("header", True).csv(path)
    cols = []
    seen = set()
    for name in raw.columns:
        field, typ = parse_csv_typed_header(name)
        if field in seen:
            raise ValueError(f"CSV header: duplicate field {field!r}")
        seen.add(field)
        c = F.col(f"`{name}`")
        cols.append((c.cast(typ) if typ != "string" else c).alias(field))
    df = raw.select(*cols)
    if schema is not None:
        df = _conform(df, schema)
    return df


def _conform(df: DataFrame, schema) -> DataFrame:
    """Project + cast ``df`` to ``schema`` (StructType or DDL string),
    loudly failing on missing columns — payload validation, the
    missing_document_id / invalid_document_fields analog."""
    from pyspark.sql.types import StructType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(
            f"payload is missing required columns {missing}; has "
            f"{df.columns}"
        )
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
