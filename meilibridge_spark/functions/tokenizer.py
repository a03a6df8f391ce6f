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
def _compiled(
    pattern: str,
    dictionary: tuple[str, ...],
    non_separators: tuple[str, ...] = (),
) -> "re.Pattern[str]":
    """Compile the token regex; dictionary compounds (Q2) are prepended as
    a longest-first alternation so they match as single terms.
    ``non_separators`` (Meilisearch v1.4 nonSeparatorTokens) are spliced
    into the token unit so they stay INSIDE tokens — requires a pattern
    ending in '+' (validated in AnalyzerConfig.validate)."""
    if non_separators:
        alts = "|".join(
            re.escape(t)
            for t in sorted(non_separators, key=len, reverse=True)
        )
        pattern = f"(?:{alts}|{pattern[:-1]})+"
    if dictionary:
        dalts = sorted(dictionary, key=len, reverse=True)
        pattern = "|".join(re.escape(d) for d in dalts) + "|" + pattern
    return re.compile(pattern, re.UNICODE)


@lru_cache(maxsize=64)
def _separator_re(separators: tuple[str, ...]) -> "re.Pattern[str]":
    """Separator strings (Meilisearch v1.4 separatorTokens) as one
    longest-first alternation, replaced by a space pre-tokenization."""
    return re.compile(
        "|".join(
            re.escape(s) for s in sorted(separators, key=len, reverse=True)
        )
    )


def _analyzer_res(cfg: AnalyzerConfig):
    """(separator_re | None, token_re, pure_nonsep_filter_re | None) for
    ``cfg``, case-folded to match the folded text when cfg.lowercase."""
    fold = (lambda t: t.lower()) if cfg.lowercase else (lambda t: t)
    sep_re = (
        _separator_re(tuple(fold(s) for s in cfg.separator_tokens))
        if cfg.separator_tokens
        else None
    )
    nonsep = tuple(fold(t) for t in cfg.non_separator_tokens)
    tok_re = _compiled(cfg.token_pattern, cfg.dictionary, nonsep)
    # a run of pure non-separator strings is not a term: keep only
    # tokens containing at least one base-pattern character
    base_re = (
        _compiled(
            cfg.token_pattern[:-1]
            if cfg.token_pattern.endswith("+")
            else cfg.token_pattern,
            (),
        )
        if nonsep
        else None
    )
    return sep_re, tok_re, base_re


def tokenize(text: "str | None", cfg: AnalyzerConfig) -> list[str]:
    """text -> ordered list of terms (stop words removed, Q3)."""
    if text is None:
        return []
    if cfg.lowercase:
        text = text.lower()
    sep_re, tok_re, base_re = _analyzer_res(cfg)
    if sep_re is not None:
        text = sep_re.sub(" ", text)
    toks = tok_re.findall(text)
    if base_re is not None:
        toks = [t for t in toks if base_re.search(t)]
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
    sep_re, rx, base_re = _analyzer_res(cfg)
    stop = set(cfg.stop_words)
    s = texts.fillna("")
    if cfg.lowercase:
        s = s.str.lower()
    if sep_re is not None:
        s = s.str.replace(sep_re, " ", regex=True)
    found = s.str.findall(rx)
    if base_re is not None:
        found = found.map(lambda ts: [t for t in ts if base_re.search(t)])
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
