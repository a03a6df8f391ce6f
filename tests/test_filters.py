"""Meilisearch filter-expression grammar -> Catalyst Column
(functions/filters.py): conditions, ranges, IN/EXISTS/NULL, boolean
precedence, filterable-attribute enforcement, and end-to-end use as
search(filter_docs=...)."""

import pytest
from pyspark.sql import functions as F

from meilibridge_spark.config import (
    ASCII_TOKEN_PATTERN,
    AnalyzerConfig,
    ConfigError,
    IndexConfig,
)
from meilibridge_spark.functions.filters import filter_doc_ids, parse_filter

FILTERABLE = ("lang", "stars", "tag")

ROWS = [
    (0, "alpha beta", "en", 5, "news"),
    (1, "beta gamma", "de", 3, None),
    (2, "gamma delta", "en", 1, "blog"),
    (3, "delta alpha", "fr", 4, "news"),
    (4, "alpha gamma", "en", 2, "wiki"),
]
SCHEMA = "doc_id long, text string, lang string, stars int, tag string"


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _ids(df, expr):
    return sorted(
        r["doc_id"] for r in df.filter(parse_filter(expr, FILTERABLE)).collect()
    )


def test_comparisons(df):
    assert _ids(df, "lang = 'en'") == [0, 2, 4]
    assert _ids(df, "lang != en") == [1, 3]  # bare word value
    assert _ids(df, "stars > 3") == [0, 3]
    assert _ids(df, "stars >= 3") == [0, 1, 3]
    assert _ids(df, "stars < 2") == [2]
    assert _ids(df, "stars <= 2") == [2, 4]


def test_range_in_exists_null(df):
    assert _ids(df, "stars 2 TO 4") == [1, 3, 4]  # inclusive
    assert _ids(df, "lang IN [en, fr]") == [0, 2, 3, 4]
    assert _ids(df, 'tag IN ["news", "wiki"]') == [0, 3, 4]
    assert _ids(df, "tag EXISTS") == [0, 2, 3, 4]
    assert _ids(df, "tag NOT EXISTS") == [1]
    assert _ids(df, "tag IS NULL") == [1]
    assert _ids(df, "tag IS NOT NULL") == [0, 2, 3, 4]


def test_complement_null_semantics(df):
    """Meilisearch set-complement model: != and NOT INCLUDE documents
    whose attribute is missing; plain comparisons select nothing for
    them."""
    # doc 1 has tag = NULL
    assert _ids(df, "tag = 'news'") == [0, 3]
    assert _ids(df, "tag != 'news'") == [1, 2, 4]  # null INCLUDED
    assert _ids(df, "NOT tag = 'news'") == [1, 2, 4]
    assert _ids(df, "NOT tag != 'news'") == [0, 3]
    assert _ids(df, "NOT tag IN ['news', 'wiki']") == [1, 2]
    # comparisons on a missing value select nothing (not complement)
    assert _ids(df, "tag > 'a'") == [0, 2, 3, 4]


def test_boolean_precedence(df):
    # AND binds tighter than OR
    assert _ids(df, "lang = en AND stars > 2 OR lang = fr") == [0, 3]
    assert _ids(df, "lang = en AND (stars > 2 OR lang = fr)") == [0]
    assert _ids(df, "NOT lang = en") == [1, 3]
    assert _ids(df, "NOT (lang = en OR lang = de)") == [3]


def test_quoting_and_escapes(df):
    assert _ids(df, "tag = 'news'") == [0, 3]
    assert _ids(df, 'tag = "news"') == [0, 3]


def test_rejects_bad_input(df):
    with pytest.raises(ConfigError, match="not filterable"):
        parse_filter("text = 'x'", FILTERABLE)
    with pytest.raises(ConfigError):
        parse_filter("", FILTERABLE)
    with pytest.raises(ConfigError):
        parse_filter("lang = ", FILTERABLE)
    with pytest.raises(ConfigError):
        parse_filter("lang = en extra junk", FILTERABLE)
    with pytest.raises(ConfigError):
        parse_filter("lang IN []", FILTERABLE)
    with pytest.raises(ConfigError):
        parse_filter("(lang = en", FILTERABLE)
    # unterminated quotes are syntax errors, not silent bare words
    with pytest.raises(ConfigError):
        parse_filter("lang = 'en", FILTERABLE)
    with pytest.raises(ConfigError):
        parse_filter('tag = "news', FILTERABLE)


EMPTY_ROWS = [
    (0, "alpha", "en", 5, "news"),
    (1, "beta", "de", 3, None),
    (2, "gamma", "en", 1, ""),
    (3, "delta", "fr", 4, "Newsroom"),
]


@pytest.fixture(scope="module")
def dfe(spark):
    return spark.createDataFrame(EMPTY_ROWS, SCHEMA)


def _ids2(df, expr, fold=False):
    return sorted(
        r["doc_id"]
        for r in df.filter(
            parse_filter(expr, FILTERABLE, fold_case=fold)
        ).collect()
    )


def test_not_in(df):
    # NOT IN = set complement: includes docs missing the attribute
    assert _ids(df, "tag NOT IN ['news', 'wiki']") == [1, 2]
    assert _ids(df, "NOT tag NOT IN ['news', 'wiki']") == [0, 3, 4]
    assert _ids(df, "lang NOT IN [en]") == [1, 3]


def test_is_empty(dfe):
    assert _ids2(dfe, "tag IS EMPTY") == [2]
    # complement includes missing (set-complement), excludes only ""
    assert _ids2(dfe, "tag IS NOT EMPTY") == [0, 1, 3]
    assert _ids2(dfe, "NOT tag IS EMPTY") == [0, 1, 3]
    assert _ids2(dfe, "NOT tag IS NOT EMPTY") == [2]


def test_contains_starts_with(dfe):
    assert _ids2(dfe, "tag CONTAINS 'ews'") == [0, 3]
    assert _ids2(dfe, "tag NOT CONTAINS 'ews'") == [1, 2]
    assert _ids2(dfe, "NOT tag CONTAINS 'ews'") == [1, 2]
    assert _ids2(dfe, "tag STARTS WITH 'New'") == [3]
    assert _ids2(dfe, "tag NOT STARTS WITH 'New'") == [0, 1, 2]
    assert _ids2(dfe, "NOT tag STARTS WITH 'New'") == [0, 1, 2]


def test_fold_case(dfe):
    # default: case-sensitive (pushdown-friendly)
    assert _ids2(dfe, "tag = 'NEWS'") == []
    # folded: Meilisearch-style case-insensitive string comparison
    assert _ids2(dfe, "tag = 'NEWS'", fold=True) == [0]
    assert _ids2(dfe, "tag != 'NEWS'", fold=True) == [1, 2, 3]
    assert _ids2(dfe, "tag IN ['NEWS', 'newsROOM']", fold=True) == [0, 3]
    assert _ids2(dfe, "tag CONTAINS 'news'", fold=True) == [0, 3]
    assert _ids2(dfe, "tag STARTS WITH 'news'", fold=True) == [0, 3]
    # numbers unaffected by folding
    assert _ids2(dfe, "stars > 3", fold=True) == [0, 3]


def test_rejects_bad_not_and_is(df):
    with pytest.raises(ConfigError, match="after"):
        parse_filter("tag NOT NULL", FILTERABLE)
    with pytest.raises(ConfigError, match="after IS"):
        parse_filter("tag IS 'news'", FILTERABLE)
    with pytest.raises(ConfigError):
        parse_filter("tag STARTS 'x'", FILTERABLE)  # missing WITH
    with pytest.raises(ConfigError, match="geo"):
        parse_filter("_geoRadius(1, 2, 3)", ("_geoRadius",))


def test_filter_pushdown_plan(df, spark):
    """The compiled Column is a plain Catalyst predicate — it reaches
    the parquet scan like a hand-written filter."""
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(d)
    pq = spark.read.parquet(d)
    import re

    plan = pq.filter(
        parse_filter("lang = en AND stars > 2", FILTERABLE)
    )._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1) and "stars" in m.group(1), m and m.group(1)
    # complemented leaves stay pushable too (no coalesce wrapping)
    plan2 = pq.filter(
        parse_filter("NOT (lang = en) AND tag != 'news'", FILTERABLE)
    )._jdf.queryExecution().executedPlan().toString()
    m2 = re.search(r"PushedFilters: \[([^\]]*)\]", plan2)
    assert m2 and "lang" in m2.group(1) and "tag" in m2.group(1), m2 and m2.group(1)


def test_end_to_end_search_filtering(spark, df):
    from meilibridge_spark.operators.search import search
    from meilibridge_spark.plans.build import build_index

    cfg = IndexConfig(
        index_name="fx",
        primary_key=("doc_id",),
        searchable_attributes=("text",),
        filterable_attributes=FILTERABLE,
        analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
    )
    idx = build_index(df, cfg, doc_id_col="doc_id")
    filt = filter_doc_ids(idx, "lang = en AND stars >= 2")
    hits = {r["doc_id"] for r in search(idx, "alpha gamma", 10, filter_docs=filt).collect()}
    assert hits == {0, 4}
    with pytest.raises(ConfigError, match="not filterable"):
        filter_doc_ids(idx, "text = 'alpha'")


# --- property test: random filter ASTs render -> parse -> evaluate
# identically to a driver-side pandas evaluation of the same AST
import hypothesis.strategies as st
from hypothesis import given, settings

_FIELDS = {"lang": "s", "stars": "n", "tag": "s"}
_STR_VALS = ["en", "de", "fr", "news", "blog", "wiki", None]
_NUM_VALS = [1, 2, 3, 4, 5]


def _leaf():
    conds = []
    for f, kind in _FIELDS.items():
        vals = _NUM_VALS if kind == "n" else [v for v in _STR_VALS if v]
        conds += [("cmp", f, op, v) for op in ("=", "!=", ">", "<=") for v in vals]
        conds += [("in", f, vals[:2]), ("exists", f), ("notexists", f)]
        conds += [("notin", f, vals[:2])]
        if kind == "n":
            conds += [("range", f, vals[0], vals[-1])]
        else:
            conds += [
                ("contains", f, str(v)[:2]) for v in vals[:3]
            ] + [("starts", f, str(v)[:2]) for v in vals[:3]]
    return st.sampled_from(conds)


def _ast(depth=2):
    if depth == 0:
        return _leaf()
    sub = _ast(depth - 1)
    return st.one_of(
        _leaf(),
        st.tuples(st.just("and"), sub, sub),
        st.tuples(st.just("or"), sub, sub),
        st.tuples(st.just("not"), sub),
    )


def _render(node) -> str:
    op = node[0]
    if op == "cmp":
        _, f, o, v = node
        vs = str(v) if isinstance(v, int) else f"'{v}'"
        return f"{f} {o} {vs}"
    if op == "in":
        _, f, vals = node
        return f"{f} IN [" + ", ".join(
            str(v) if isinstance(v, int) else f"'{v}'" for v in vals
        ) + "]"
    if op == "notin":
        _, f, vals = node
        return f"{f} NOT IN [" + ", ".join(
            str(v) if isinstance(v, int) else f"'{v}'" for v in vals
        ) + "]"
    if op == "contains":
        return f"{node[1]} CONTAINS '{node[2]}'"
    if op == "starts":
        return f"{node[1]} STARTS WITH '{node[2]}'"
    if op == "exists":
        return f"{node[1]} EXISTS"
    if op == "notexists":
        return f"{node[1]} NOT EXISTS"
    if op == "range":
        _, f, lo, hi = node
        return f"{f} {lo} TO {hi}"
    if op == "not":
        return f"NOT ({_render(node[1])})"
    if op in ("and", "or"):
        return f"({_render(node[1])}) {op.upper()} ({_render(node[2])})"
    raise AssertionError(node)


def _eval2(node, row) -> bool:
    """Reference evaluator with Meilisearch set-complement semantics:
    every leaf is two-valued (missing attribute -> not selected), != and
    NOT are true complements."""
    op = node[0]
    if op == "cmp":
        _, f, o, v = node
        if o == "!=":
            return not _eval2(("cmp", f, "=", v), row)
        x = row[f]
        if x is None:
            return False
        return {"=": x == v, ">": x > v, "<=": x <= v}[o]
    if op == "in":
        x = row[node[1]]
        return x is not None and x in node[2]
    if op == "notin":
        return not _eval2(("in", node[1], node[2]), row)
    if op == "contains":
        x = row[node[1]]
        return x is not None and node[2] in x
    if op == "starts":
        x = row[node[1]]
        return x is not None and x.startswith(node[2])
    if op == "exists":
        return row[node[1]] is not None
    if op == "notexists":
        return row[node[1]] is None
    if op == "range":
        _, f, lo, hi = node
        x = row[f]
        return x is not None and lo <= x <= hi
    if op == "not":
        return not _eval2(node[1], row)
    if op == "and":
        return _eval2(node[1], row) and _eval2(node[2], row)
    if op == "or":
        return _eval2(node[1], row) or _eval2(node[2], row)
    raise AssertionError(node)


@settings(max_examples=60, deadline=None)
@given(_ast())
def test_filter_parser_matches_reference_eval(spark, node):
    df = spark.createDataFrame(ROWS, SCHEMA)
    expr = _render(node)
    got = sorted(
        r["doc_id"] for r in df.filter(parse_filter(expr, FILTERABLE)).collect()
    )
    rows = [dict(zip(("doc_id", "text", "lang", "stars", "tag"), r)) for r in ROWS]
    want = sorted(r["doc_id"] for r in rows if _eval2(node, r))
    assert got == want, expr


def test_fold_case_mixed_type_in(dfe):
    """ADVICE r03: a folded IN with both string and numeric members —
    string members compare case-insensitively, numeric members keep
    comparing against the RAW column (F.lower casts the column to
    string, which silently un-matches the numbers)."""
    assert _ids2(dfe, "stars IN [5, 'zzz']", fold=True) == [0]
    assert _ids2(dfe, "stars IN [3, 5]", fold=True) == [0, 1]
    # NOT IN stays the set complement of the fixed predicate
    assert _ids2(dfe, "stars NOT IN [5, 'zzz']", fold=True) == [1, 2, 3]
    # pure-string folded IN unchanged
    assert _ids2(dfe, "tag IN ['NEWS', 'newsROOM']", fold=True) == [0, 3]
