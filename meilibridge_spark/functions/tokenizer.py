"""Tokenization (SURVEY.md §2B Q1-Q4).

One pure function shared by index build and query parse — the engine's
analog of Meilisearch's default segmentation that the reference
configures but never implements itself (its separator/dictionary YAML
knobs are dropped by ``config/type.go:55-68``).

Everything here is pure Python / pandas; Spark-side use is via scalar
pandas UDFs built in ``operators/docs.py`` (vectorized, Arrow-batched —
no per-row Python UDFs, per BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache

import pandas as pd

from meilibridge_spark.config import AnalyzerConfig


@lru_cache(maxsize=64)
def _compiled(pattern: str, dictionary: tuple[str, ...]) -> "re.Pattern[str]":
    """Compile the token regex; dictionary compounds (Q2) are prepended as
    a longest-first alternation so they match as single terms."""
    if dictionary:
        alts = sorted(dictionary, key=len, reverse=True)
        pattern = "|".join(re.escape(d) for d in alts) + "|" + pattern
    return re.compile(pattern, re.UNICODE)


def tokenize(text: "str | None", cfg: AnalyzerConfig) -> list[str]:
    """text -> ordered list of terms (stop words removed, Q3)."""
    if text is None:
        return []
    if cfg.lowercase:
        text = text.lower()
    toks = _compiled(cfg.token_pattern, cfg.dictionary).findall(text)
    if cfg.stop_words:
        stop = set(cfg.stop_words)
        toks = [t for t in toks if t not in stop]
    return toks


def term_freqs(text: "str | None", cfg: AnalyzerConfig) -> "Counter[str]":
    return Counter(tokenize(text, cfg))


def doc_length(text: "str | None", cfg: AnalyzerConfig) -> int:
    """dl = token count after stop-word removal (definition pinned here;
    the DuckDB oracles in __spark_entry__.py use the same definition)."""
    return len(tokenize(text, cfg))


def tokenize_series(texts: pd.Series, cfg: AnalyzerConfig) -> pd.Series:
    """Vectorized batch tokenize: Series[str] -> Series[list[str]].

    Uses a single compiled regex over the batch; this is the body of the
    scalar pandas UDF (Arrow in/out).
    """
    rx = _compiled(cfg.token_pattern, cfg.dictionary)
    stop = set(cfg.stop_words)
    s = texts.fillna("")
    if cfg.lowercase:
        s = s.str.lower()
    found = s.str.findall(rx)
    if stop:
        found = found.map(lambda ts: [t for t in ts if t not in stop])
    return found


def term_freq_series(texts: pd.Series, cfg: AnalyzerConfig) -> pd.Series:
    """Series[str] -> Series[list[(term, tf)]] with per-doc tf aggregation
    done Python-side (map-side combine: avoids a (term, doc_id) groupBy
    shuffle downstream — SURVEY §2C)."""
    return tokenize_series(texts, cfg).map(
        lambda ts: list(Counter(ts).items())
    )


def term_freq_frame(texts: pd.Series, cfg: AnalyzerConfig) -> pd.DataFrame:
    """Series[str] -> DataFrame{terms: list[str], tfs: list[int]} —
    struct-of-arrays layout: ~1.8x cheaper through Arrow than an
    array<struct> column, and downstream consumers flatten it with
    np.concatenate instead of per-dict iteration."""
    toks = tokenize_series(texts, cfg)
    terms: list[list[str]] = []
    tfs: list[list[int]] = []
    for ts in toks:
        c = Counter(ts)
        terms.append(list(c.keys()))
        tfs.append(list(c.values()))
    return pd.DataFrame({"terms": terms, "tfs": tfs}, index=texts.index)


def expand_query_terms(terms: list[str], cfg: AnalyzerConfig) -> list[str]:
    """Query-side synonym expansion (Q4): term -> itself + its synonym
    group, order-preserving, de-duplicated."""
    syn = cfg.synonym_map()
    out: list[str] = []
    seen: set[str] = set()
    for t in terms:
        for cand in (t, *syn.get(t, ())):
            if cand not in seen:
                seen.add(cand)
                out.append(cand)
    return out


def query_word_groups(
    query: str,
    cfg: AnalyzerConfig,
    expansions: "dict[str, list[str]] | None" = None,
) -> "list[list[str]]":
    """Per-word alternative groups for ``matching_strategy='all'``
    (Meilisearch's matchingStrategy search param): one group per
    distinct original token, holding the token, its synonyms, and the
    typo ``expansions`` of the token and of each synonym. A document
    satisfies 'all' iff EVERY group has at least one matching term —
    alternates derived from a word stand in for that word, they don't
    add requirements."""
    syn = cfg.synonym_map()
    exp = expansions or {}
    groups: "list[list[str]]" = []
    seen: set[str] = set()
    for t in tokenize(query, cfg):
        if t in seen:
            continue
        seen.add(t)
        alts = [t, *syn.get(t, ())]
        g = list(
            dict.fromkeys(
                alts + [c for a in alts for c in exp.get(a, ())]
            )
        )
        groups.append(g)
    return groups


def parse_query(query: str, cfg: AnalyzerConfig) -> list[str]:
    """Tokenize a query string with the same analyzer as the index, then
    apply synonym expansion. Unique terms, first-seen order."""
    toks = tokenize(query, cfg)
    uniq: list[str] = []
    seen: set[str] = set()
    for t in toks:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    return expand_query_terms(uniq, cfg)
