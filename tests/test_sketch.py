"""Exact distributed heavy hitters (webindex.sketch.top_terms) vs a brute
Counter oracle — including the certificate's escalation path (tiny local_m
forces extra rounds, result must stay exact) and the uncertifiable-input
failure mode (must raise, never return an uncertified top-k)."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from webindex.analyze import Analyzer
from webindex.config import SQL_SAFE_ANALYZER
from webindex.sketch import top_terms

# Zipf-ish corpus: head terms dominate, long unique tail per doc stresses
# the candidate bound (tail terms must never displace certified heads).
VOCAB = ("data query merge join sort scan batch stream index shard "
         "filter group window vector column").split()


def _make_docs(n=300, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        zipf = np.minimum(rng.zipf(1.5, size=12) - 1, len(VOCAB) - 1)
        words = [VOCAB[int(j)] for j in zipf] + [f"tail{i}"]
        rows.append({"doc_id": i, "text": " ".join(words)})
    return rows


DOCS = _make_docs()


def _brute(docs, k):
    an = Analyzer(SQL_SAFE_ANALYZER)
    c: Counter = Counter()
    for d in docs:
        c.update(an.tokens(d["text"]))
    items = sorted(c.items(), key=lambda e: (-e[1], e[0]))[:k]
    return pd.DataFrame(
        {"term": [t for t, _ in items],
         "cnt": np.array([n for _, n in items], np.int64),
         "rank": np.arange(1, len(items) + 1, dtype=np.int32)}
    )


def _ds(docs, blocks=8):
    import ray.data as rd

    return rd.from_items(docs).repartition(blocks)


def test_top_terms_matches_brute(ray_session):
    got = top_terms(_ds(DOCS), k=10)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), _brute(DOCS, 10)
    )


def test_top_terms_escalation_still_exact(ray_session):
    # local_m=2 cannot certify round 1 (each block's bound is large);
    # escalation must converge to the same exact answer
    got = top_terms(_ds(DOCS), k=5, local_m=2, max_rounds=6)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), _brute(DOCS, 5)
    )


def test_top_terms_partition_invariant(ray_session):
    a = top_terms(_ds(DOCS, blocks=2), k=8)
    b = top_terms(_ds(DOCS, blocks=16), k=8)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_top_terms_uniform_vocab_raises(ray_session):
    # every term globally unique with count 1: no k-th count can ever
    # dominate the uncovered bound while blocks truncate -> must raise
    docs = [
        {"doc_id": i, "text": " ".join(f"u{i}x{j}" for j in range(30))}
        for i in range(40)
    ]
    with pytest.raises(RuntimeError, match="certificate"):
        top_terms(_ds(docs, blocks=8), k=3, local_m=1, max_rounds=2)


def test_top_terms_empty_corpus(ray_session):
    got = top_terms(_ds([{"doc_id": 0, "text": ""}], blocks=1), k=5)
    assert list(got.columns) == ["term", "cnt", "rank"]
    assert got.empty
