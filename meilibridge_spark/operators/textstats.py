"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst plans (built-in pyspark.sql.functions — no UDFs, no
Python in the hot path), so they whole-stage-codegen and scale with the
scan. Semantics are DuckDB-SQL-expressible for the driver's oracle gate
(__spark_entry__.py builds matching SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: oracle-parity token pattern (lower + ascii alnum runs)
TOKEN_RX = "[a-z0-9]+"

#: quality-scoring stop list (tiny English core; shared with oracle SQL)
QUALITY_STOPWORDS = ("a", "and", "in", "is", "of", "the", "to")

#: language marker words for the lang-ID heuristic: (lang, words),
#: priority order breaks ties. Deliberately simple n-gram-free heuristic
#: (stopword-list hits) — deterministic and oracle-expressible.
LANG_MARKERS: "tuple[tuple[str, tuple[str, ...]], ...]" = (
    ("en", ("the", "and", "of", "is", "to", "in")),
    ("de", ("der", "die", "das", "und", "ist", "nicht")),
    ("fr", ("le", "la", "et", "est", "les", "des")),
    ("es", ("el", "los", "es", "y", "que", "una")),
)


def _tokens(text_col: str) -> "F.Column":
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RX}', 0)")


#: GPT-2-style BPE pre-tokenizer pattern, ASCII-simplified: contraction
#: suffixes, space-prefixed letter runs, digit runs, punctuation runs.
#: Plain alternation + classes only — identical semantics in Java regex
#: (Spark) and RE2 (DuckDB oracle).
BPE_RX = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + regex tokens + BPE-ish pre-tokens per doc
    (SURVEY 'token counting': whitespace + a BPE-ish regex)."""
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    bpe = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_RX), F.lit(0)
    )
    return df.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(_tokens(text_col)).cast("long").alias("n_re_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stop-word ratio features + a composite
    quality score in [0,1]: high when doc is long-ish, low-punctuation,
    with a sane stop-word rate."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0))
        * (F.lit(1.0) - punct_ratio)
        * (F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)))
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score(lang) = count of tokens in the
    lang's marker list; argmax with LANG_MARKERS priority tie-break;
    'und' when all scores are 0."""
    toks = _tokens(text_col)
    scores = {}
    for lang, words in LANG_MARKERS:
        arr = F.array(*[F.lit(w) for w in words])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    out = df.select(F.col(id_col), *[scores[lang].cast("long").alias(f"score_{lang}") for lang, _ in LANG_MARKERS], pred.alias("lang_pred"))
    return out


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Key-collision fingerprint (OpenRefine-style): md5 of the
    space-joined sorted distinct token set — catches token-order and
    duplicate-token variants of the same content."""
    toks = _tokens(text_col)
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
    return df.select(F.col(id_col), fp.alias("fingerprint"))
