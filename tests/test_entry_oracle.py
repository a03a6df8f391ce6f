"""Pre-flight for the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() through DuckDB on
sf0.01 and compare row count, schema (column names), and values
(column-name-sorted, order-insensitive) — the same comparison shape the
driver applies."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    # normalize dtypes for comparison
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


QUERY_NAMES = sorted(entry.queries().keys())


def test_every_query_has_oracle():
    assert set(entry.oracle_sql().keys()) == set(QUERY_NAMES)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry.queries()[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(ddb.execute(entry.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), f"{name}: schema"
    assert len(got) == len(want), f"{name}: rowcount {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            np.testing.assert_allclose(
                g.to_numpy(dtype=float),
                w.to_numpy(dtype=float),
                rtol=0,
                atol=0,
                err_msg=f"{name}.{c}",
            )
        else:
            assert g.tolist() == w.tolist(), f"{name}.{c}"


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
