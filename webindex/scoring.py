"""The pinned BM25 scoring spec (SURVEY.md §7.0) — shared by the index
builder (block-max metadata), the query engine, and the pure-Python oracle,
so rank-identity is bit-exact, not approximate.

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(tf, dl) = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d) = sum over t in sorted(unique terms of q): idf(t) * tfn
    k1 = 0.9, b = 0.4   (north-rule override of ES 7.0.0 defaults)

Determinism contract: per-(query, doc) contributions are summed in ascending
unicode order of the query's *unique* terms, in float64 — the fixed-order
summation demanded by SURVEY.md §7.3 ("Rank-identity floats"). Ties in the
final ranking break by ascending docID.
"""

from __future__ import annotations

import math

import numpy as np


def idf(N: int, df) -> float:
    """BM25+-style idf; accepts scalar or numpy df."""
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5)) if isinstance(
        df, np.ndarray
    ) else math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def term_contrib(tf, dl, avgdl: float, k1: float, b: float, idf_t: float):
    """idf * tf / (tf + k1*(1 - b + b*dl/avgdl)) — identical expression
    (and therefore identical IEEE-754 rounding) in scalar and numpy form."""
    denom = tf + k1 * (1.0 - b + b * (dl / avgdl))
    return idf_t * (tf / denom)
