"""Pluggable similarity modules (webindex/similarity.py) vs analytic
hand-oracles, plus shard-count invariance of the fan-out pipeline.

The pinned formulas (module docstring) are recomputed here from first
principles in pure Python over a tiny explicit corpus — independent of
the engine's scatter-add/caching machinery."""

import math

import numpy as np
import pyarrow as pa
import pytest

from webindex.build import build_index
from webindex.config import IndexConfig

DOCS = [
    (0, "red apple pie"),
    (1, "green apple apple tart"),
    (2, "blueberry pie crust and pie tin"),
    (3, "red red red wine"),
]
QUERIES = [("q1", "red apple"), ("q2", "pie"), ("q3", "apple pie red")]


def _toks(text):
    return text.split()


def _corpus_stats():
    tf = {}  # (doc, term) -> tf
    dl = {}
    for d, text in DOCS:
        ts = _toks(text)
        dl[d] = len(ts)
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    df, cf = {}, {}
    for (d, t), n in tf.items():
        df[t] = df.get(t, 0) + 1
        cf[t] = cf.get(t, 0) + n
    return tf, dl, df, cf, len(DOCS), sum(dl.values())


def _hand_scores(similarity):
    """{(qid, doc): score} under the pinned spec, ascending-term sums."""
    tf, dl, df, cf, N, T = _corpus_stats()
    out = {}
    for qid, qtext in QUERIES:
        for d, _ in DOCS:
            s, matched = 0.0, False
            for t in sorted(set(_toks(qtext))):
                f = tf.get((d, t))
                if not f:
                    continue
                matched = True
                if similarity == "lmdirichlet":
                    c = max(0.0, math.log(1.0 + f / (2000.0 * (cf[t] / T)))
                            + math.log(2000.0 / (dl[d] + 2000.0)))
                elif similarity == "lmjm":
                    c = math.log(
                        1.0 + ((1.0 - 0.1) / 0.1) * (f / dl[d]) / (cf[t] / T)
                    )
                elif similarity == "tfidf":
                    i = 1.0 + math.log(N / (df[t] + 1))
                    c = math.sqrt(f) * (i * i) / math.sqrt(dl[d])
                else:  # boolean
                    c = 1.0
                s += c
            if matched:
                out[(qid, d)] = s
    return out


@pytest.fixture(scope="module")
def tiny_index(ray_session, tmp_path_factory):
    import ray.data as rd

    idx = str(tmp_path_factory.mktemp("sim") / "idx")
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    }))
    # SQL-safe analyzer = [a-z0-9]+ over lowercase: on this all-lowercase
    # corpus it tokenizes exactly like the hand oracle's text.split()
    from webindex.config import SQL_SAFE_ANALYZER

    build_index(corpus, idx,
                IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=4))
    return idx


def _queries_ds():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "qid": pa.array([q for q, _ in QUERIES]),
        "text": pa.array([t for _, t in QUERIES]),
    }))


@pytest.mark.parametrize("sim", ["lmdirichlet", "lmjm", "tfidf", "boolean"])
def test_matches_hand_oracle(tiny_index, sim):
    from webindex.similarity import similarity_search

    got = {
        (r["qid"], r["doc_id"]): r["score"]
        for r in similarity_search(_queries_ds(), tiny_index, sim,
                                   n_shards=2).take_all()
    }
    want = _hand_scores(sim)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12), (k, sim)


def test_lmd_clamped_match_is_still_a_hit(tiny_index):
    """A matched doc whose LM-Dirichlet contributions all clamp to 0 must
    appear with score 0.0 (membership from the hit counter, not score>0)."""
    from webindex.similarity import similarity_search

    # 'and' appears once in the long doc 2: ln(1 + 1/(mu*cf/T)) is small,
    # the dl norm is negative, so the clamp engages
    import ray.data as rd

    qds = rd.from_arrow(pa.table({"qid": ["z"], "text": ["and"]}))
    rows = similarity_search(qds, tiny_index, "lmdirichlet").take_all()
    tf, dl, df, cf, N, T = _corpus_stats()
    want = max(0.0, math.log(1.0 + 1 / (2000.0 * (cf["and"] / T)))
               + math.log(2000.0 / (dl[2] + 2000.0)))
    assert [(r["qid"], r["doc_id"]) for r in rows] == [("z", 2)]
    assert rows[0]["score"] == pytest.approx(want, abs=1e-15)
    if want == 0.0:  # the interesting branch: still a hit at exactly 0
        assert rows[0]["score"] == 0.0


def test_boolean_counts_matched_terms(tiny_index):
    from webindex.similarity import similarity_search

    got = {
        (r["qid"], r["doc_id"]): r["score"]
        for r in similarity_search(
            _queries_ds(), tiny_index, "boolean").take_all()
    }
    # q3 = "apple pie red": doc 0 matches all three
    assert got[("q3", 0)] == 3.0
    assert got[("q3", 1)] == 1.0  # apple only
    assert got[("q3", 3)] == 1.0  # red only


def test_shard_count_invariance(tiny_index):
    """Scores and top-k ranks are identical at different shard counts
    (partition-count independence, the repo's determinism invariant)."""
    from webindex.similarity import similarity_search

    def run(n):
        rows = similarity_search(_queries_ds(), tiny_index, "lmjm",
                                 top_k=3, n_shards=n).take_all()
        return sorted((r["qid"], r["rank"], r["doc_id"], r["score"])
                      for r in rows)

    assert run(2) == run(5)


def test_unknown_similarity_rejected(tiny_index):
    from webindex.similarity import similarity_search

    with pytest.raises(ValueError, match="unknown similarity"):
        similarity_search(_queries_ds(), tiny_index, "bm42")
