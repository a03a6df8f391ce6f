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


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1
    "repetition removal", the standard training-data filter family) ->
    (id, n_tokens, distinct_frac, top_token_frac, top_bigram_frac):

    - ``distinct_frac``: |distinct tokens| / |tokens| — low values mean
      the document repeats its vocabulary.
    - ``top_token_frac``: occurrences of the most frequent token /
      |tokens| (Gopher's top-1-gram character-fraction analog at word
      granularity).
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      / |bigrams|.

    Fractions are rounded to 6 places (oracle float parity). All three
    are PER-ROW array expressions over the extracted token list — no
    explode, no groupBy, no shuffle: the plan stays one codegen'd
    projection of the scan, so cost is the column read itself at any
    corpus size. The per-row mode computation is O(distinct x tokens)
    on short-document corpora (transcript turns, web pages); documents
    are bounded, corpora are not — the bound belongs on the row.
    """
    toks = "regexp_extract_all(lower({c}), '{rx}', 0)".format(
        c=text_col, rx=TOKEN_RX
    )
    n = f"size({toks})"
    top_tok = (
        f"aggregate(array_distinct({toks}), 0, "
        f"(acc, x) -> greatest(acc, size(filter({toks}, y -> y = x))))"
    )
    bgs = (
        f"transform(slice({toks}, 1, greatest({n} - 1, 0)), "
        f"(x, i) -> concat(x, ' ', element_at({toks}, i + 2)))"
    )
    top_bg = (
        f"aggregate(array_distinct({bgs}), 0, "
        f"(acc, x) -> greatest(acc, size(filter({bgs}, y -> y = x))))"
    )
    return df.select(
        F.col(id_col),
        F.expr(n).cast("long").alias("n_tokens"),
        F.round(
            F.when(
                F.expr(n) > 0,
                F.expr(f"size(array_distinct({toks}))") / F.expr(n),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("distinct_frac"),
        F.round(
            F.when(
                F.expr(n) > 0, F.expr(top_tok) / F.expr(n)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_token_frac"),
        F.round(
            F.when(
                F.expr(n) > 1, F.expr(top_bg) / (F.expr(n) - 1)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
    )
