"""ES rescore API (webindex/rescore.py) vs a brute driver-side oracle
built from the pure-Python BM25 oracle: global-window semantics, weight
combine order, the k<=window guard, and shard-count invariance."""

import numpy as np
import pyarrow as pa
import pytest

from webindex.build import build_index
from webindex.config import SQL_SAFE_ANALYZER, IndexConfig
from webindex.oracle import OracleBM25
from webindex.rescore import rescore_queries

CFG = IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=8, block_size=32)
VOCAB = "alpha beta gamma delta epsilon zeta rare1 rare2".split()
N_DOCS = 120


def _make_docs():
    rng = np.random.default_rng(31)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(6, 30))
        words = [VOCAB[int(j)] for j in rng.integers(0, 6, size=n)]
        if i % 11 == 0:
            words.append("rare1")
        if i % 23 == 0:
            words.append("rare2")
        rows.append((i, " ".join(words)))
    return rows


DOCS = _make_docs()
QUERIES = [
    ("r1", "alpha beta", "rare1"),
    ("r2", "gamma delta", "epsilon zeta"),
    ("r3", "rare1", "alpha"),
]
WINDOW, K, RW = 15, 8, 2.0


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("rsc") / "idx")
    tab = pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS]),
    })
    build_index(rd.from_arrow(tab), out, CFG)
    return out


def _brute():
    """{qid: [(doc_id, final_score), ...]} from the pure-Python oracle."""
    o = OracleBM25(DOCS, CFG)
    out = {}
    for qid, pq, rq in QUERIES:
        prim = o.topk(pq, WINDOW)  # already (score desc, docID asc)
        sec = dict(o.topk(rq, 10**9))
        fin = [(d, p + RW * sec.get(d, 0.0)) for d, p in prim]
        fin.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = fin[:K]
    return out


def test_matches_brute_oracle(index_dir):
    got = {}
    rows = rescore_queries(QUERIES, index_dir, top_k=K, window_size=WINDOW,
                           rescore_query_weight=RW).take_all()
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    want = _brute()
    assert set(got) == set(want)
    for qid in want:
        assert [d for d, _ in got[qid]] == [d for d, _ in want[qid]], qid
        for (_, a), (_, b) in zip(got[qid], want[qid]):
            assert a == pytest.approx(b, rel=1e-12)


def test_window_bounds_entry(index_dir):
    """A doc outside the primary top-window can never enter the result,
    even if the secondary would rank it first (the ES window contract)."""
    o = OracleBM25(DOCS, CFG)
    window_ids = {d for d, _ in o.topk("alpha beta", WINDOW)}
    rows = rescore_queries([("x", "alpha beta", "rare2")], index_dir,
                           top_k=K, window_size=WINDOW,
                           rescore_query_weight=100.0).take_all()
    assert rows and all(r["doc_id"] in window_ids for r in rows)


def test_k_must_fit_window(index_dir):
    with pytest.raises(ValueError, match="top_k must be <= window_size"):
        rescore_queries(QUERIES, index_dir, top_k=30, window_size=20)


def test_shard_count_invariance(index_dir):
    def run(n):
        rows = rescore_queries(QUERIES, index_dir, top_k=K,
                               window_size=WINDOW, rescore_query_weight=RW,
                               n_shards=n).take_all()
        return sorted((r["qid"], r["rank"], r["doc_id"], r["score"])
                      for r in rows)

    assert run(3) == run(9)
