"""textstats.repetition_signals edge cases (the oracle gate covers the
corpus path; these pin the guards: empty text, single token, fully
repeated text)."""


def test_repetition_signals_edges(spark):
    from meilibridge_spark.operators.textstats import repetition_signals

    df = spark.createDataFrame(
        [
            (0, ""),                      # no tokens
            (1, "word"),                  # one token, no bigrams
            (2, "a a a a"),               # fully repeated
            (3, "x y x y x y"),           # dominant bigram both ways
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rows[0]["n_tokens"] == 0
    assert (
        rows[0]["distinct_frac"]
        == rows[0]["top_token_frac"]
        == rows[0]["top_bigram_frac"]
        == 0.0
    )
    assert rows[1]["n_tokens"] == 1
    assert rows[1]["distinct_frac"] == 1.0
    assert rows[1]["top_token_frac"] == 1.0
    assert rows[1]["top_bigram_frac"] == 0.0  # n < 2 guard
    assert rows[2]["distinct_frac"] == 0.25
    assert rows[2]["top_token_frac"] == 1.0
    assert rows[2]["top_bigram_frac"] == 1.0  # 'a a' is every bigram
    assert rows[3]["n_tokens"] == 6
    assert rows[3]["distinct_frac"] == round(2 / 6, 6)
    assert rows[3]["top_token_frac"] == 0.5
    # bigrams: [x y, y x, x y, y x, x y] -> 'x y' 3 of 5
    assert rows[3]["top_bigram_frac"] == 0.6
