"""Tokenizer golden cases (SURVEY.md §5 item 1): separators, dictionary,
stop words, synonyms, unicode, empty/None."""

import pandas as pd

from meilibridge_spark.config import ASCII_ANALYZER, AnalyzerConfig
from meilibridge_spark.functions.tokenizer import (
    doc_length,
    expand_query_terms,
    parse_query,
    term_freq_series,
    term_freqs,
    tokenize,
    tokenize_series,
)

CFG = AnalyzerConfig()


def test_basic_split_and_lowercase():
    assert tokenize("Hello, World! FOO-bar", CFG) == ["hello", "world", "foo", "bar"]


def test_punctuation_and_underscore_are_separators():
    assert tokenize("a_b c.d e;f", CFG) == ["a", "b", "c", "d", "e", "f"]


def test_digits_kept():
    assert tokenize("error 404 found", CFG) == ["error", "404", "found"]


def test_unicode_words():
    assert tokenize("café naïve 東京 мир", CFG) == ["café", "naïve", "東京", "мир"]


def test_empty_and_none():
    assert tokenize("", CFG) == []
    assert tokenize(None, CFG) == []
    assert tokenize("...!!!", CFG) == []


def test_stop_words_dropped():
    cfg = AnalyzerConfig.make(stop_words=["the", "a"])
    assert tokenize("The cat and a dog", cfg) == ["cat", "and", "dog"]
    assert doc_length("the a the", cfg) == 0


def test_dictionary_compound_longest_match():
    cfg = AnalyzerConfig.make(dictionary=["new york", "new york city"])
    assert tokenize("I love new york city pizza", cfg) == [
        "i",
        "love",
        "new york city",
        "pizza",
    ]


def test_term_freqs_counts_repeats():
    tf = term_freqs("spark spark join", CFG)
    assert tf == {"spark": 2, "join": 1}


def test_synonym_expansion_order_preserving():
    cfg = AnalyzerConfig.make(synonyms={"fast": ["quick", "rapid"]})
    assert expand_query_terms(["fast", "join"], cfg) == [
        "fast",
        "quick",
        "rapid",
        "join",
    ]
    assert parse_query("Fast JOIN fast", cfg) == ["fast", "quick", "rapid", "join"]


def test_series_paths_match_scalar():
    texts = pd.Series(["Hello, World!", None, "spark spark join", ""])
    lists = tokenize_series(texts, CFG)
    assert lists.tolist() == [["hello", "world"], [], ["spark", "spark", "join"], []]
    tfs = term_freq_series(texts, CFG)
    assert dict(tfs[2]) == {"spark": 2, "join": 1}


def test_ascii_analyzer_matches_duckdb_regex_semantics():
    # ASCII_ANALYZER is the oracle-parity analyzer: lower + [a-z0-9]+
    assert tokenize("The FAST-key 9x", ASCII_ANALYZER) == ["the", "fast", "key", "9x"]


# --- separatorTokens / nonSeparatorTokens (Meilisearch v1.4 settings) ---


def test_non_separator_keeps_compounds():
    cfg = AnalyzerConfig.make(non_separator_tokens=("-",))
    assert tokenize("State-of-the-art scan", cfg) == [
        "state-of-the-art", "scan",
    ]
    # a run of pure non-separator strings is not a term
    assert tokenize("a - b -- c", cfg) == ["a", "b", "c"]


def test_separator_tokens_split():
    cfg = AnalyzerConfig.make(separator_tokens=("||", "x"))
    assert tokenize("a||b taxi", cfg) == ["a", "b", "ta", "i"]


def test_separator_wins_over_non_separator():
    # '-br-' replaces first, so it splits even though '-' is kept
    cfg = AnalyzerConfig.make(
        separator_tokens=("-br-",), non_separator_tokens=("-",)
    )
    assert tokenize("key-br-order table-scan", cfg) == [
        "key", "order", "table-scan",
    ]


def test_separator_knobs_case_folded_with_lowercase():
    cfg = AnalyzerConfig.make(
        separator_tokens=("X",), non_separator_tokens=("@",)
    )
    assert tokenize("aXb c@d", cfg) == ["a", "b", "c@d"]


def test_separator_series_matches_scalar():
    cfg = AnalyzerConfig.make(
        separator_tokens=("-br-",), non_separator_tokens=("-",)
    )
    texts = ["key-br-order table-scan", "a - b", None, "plain words"]
    assert list(tokenize_series(pd.Series(texts), cfg)) == [
        tokenize(t, cfg) for t in texts
    ]


def test_separator_knob_validation():
    import pytest

    from meilibridge_spark.config import ConfigError

    with pytest.raises(ConfigError, match="both separator"):
        AnalyzerConfig.make(
            separator_tokens=("-",), non_separator_tokens=("-",)
        ).validate()
    with pytest.raises(ConfigError, match="ending in"):
        AnalyzerConfig.make(
            token_pattern="[a-z]", non_separator_tokens=("-",)
        ).validate()
    with pytest.raises(ConfigError, match="could never match"):
        AnalyzerConfig.make(
            dictionary=("t-shirt",), separator_tokens=("-",)
        ).validate()
    with pytest.raises(ConfigError, match="non-empty"):
        AnalyzerConfig.make(separator_tokens=("",)).validate()
