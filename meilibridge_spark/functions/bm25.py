"""BM25 (Robertson/Okapi) scoring math — pure numpy, shared by the
distributed scorer, the driver-side WAND path, and the pytest oracle.

score(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

Constants pinned at k1=1.2, b=0.75 (SURVEY.md §2B header). The ranking
contract (north_rule) is: order by summed BM25 desc, doc_id asc
tie-break, scores rounded to 1e-9 for comparison.
"""

from __future__ import annotations

import math

import numpy as np

from meilibridge_spark.config import DEFAULT_B, DEFAULT_K1


def idf(N: int, df: "int | np.ndarray") -> "float | np.ndarray":
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


def tf_norm(
    tf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> np.ndarray:
    """The document-dependent factor tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl));
    multiply by idf(t) for the full per-term score."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def impact_upper_bound(
    max_tf: "int | np.ndarray",
    min_dl: "int | np.ndarray",
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> "float | np.ndarray":
    """Upper bound of tf_norm over a block, valid for ANY entries with
    tf <= max_tf and dl >= min_dl: tf_norm is increasing in tf and
    decreasing in dl, so the bound is tf_norm(max_tf, min_dl).
    Stored as (max_tf, min_dl) rather than a frozen float so the bound
    survives incremental avgdl drift (SURVEY §2C / codec docstring).
    """
    mt = np.asarray(max_tf, dtype=np.float64)
    md = np.asarray(min_dl, dtype=np.float64)
    return mt * (k1 + 1.0) / (mt + k1 * (1.0 - b + b * md / avgdl))


def score_round(x: "float | np.ndarray") -> "float | np.ndarray":
    """Pin float comparison: round to 1e-9 (SURVEY §7 hard part (c))."""
    return np.round(x, 9)


def bm25_score(
    tf: np.ndarray,
    dl: np.ndarray,
    N: int,
    df_t: "int | np.ndarray",
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> np.ndarray:
    return idf(N, df_t) * tf_norm(tf, dl, avgdl, k1, b)


def idf_scalar(N: int, df_t: int) -> float:
    return math.log(1.0 + (N - df_t + 0.5) / (df_t + 0.5))
