"""Driver-side CLI input parsing (no Spark session needed)."""

import pytest

from meilibridge_spark.jobs.query import parse_hybrid_queries_file


def test_hybrid_queries_file_parses():
    got = parse_hybrid_queries_file(["7\tspark join\n", "", "12\tbaba\n"])
    assert got == [("q00000", 7, "spark join"), ("q00002", 12, "baba")]


def test_hybrid_queries_file_rejects_missing_tab():
    """ADVICE r03: a line without a tab made partition() return the
    whole line as vec_id -> unhandled ValueError and an empty query."""
    with pytest.raises(ValueError, match="line 2.*vec_id<TAB>"):
        parse_hybrid_queries_file(["7\tok\n", "no tab here\n"])


def test_hybrid_queries_file_rejects_non_int_vec_id():
    with pytest.raises(ValueError, match="line 1.*integer"):
        parse_hybrid_queries_file(["seven\tspark join\n"])


def test_batch_mode_rejects_cutoff_ms(monkeypatch, capsys):
    """--cutoff-ms + --queries-file errors before any Spark work:
    batch jobs have no per-query interrupt point (COVERAGE.md Q15)."""
    import sys

    from meilibridge_spark.jobs.query import main

    monkeypatch.setattr(sys, "argv", [
        "query.py", "--index-dir", "/nonexistent",
        "--queries-file", "/nonexistent", "--cutoff-ms", "100",
    ])
    with pytest.raises(SystemExit):
        main()
    assert "--cutoff-ms applies to --query only" in capsys.readouterr().err
