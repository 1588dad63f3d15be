"""ES search_after pagination + _termvectors vs brute oracles.

Pagination contract: walking pages with the (score, doc_id) cursor must
reproduce the global ranking exactly — page p equals oracle ranks
(p*size, (p+1)*size], with the strict (score desc, docID asc) total
order making the cut partition- and path-independent. The STEMMED index
exercises the analyzer path end to end."""

import numpy as np
import pyarrow as pa
import pytest

from webindex.build import build_index
from webindex.config import IndexConfig
from webindex.lexicon import term_vectors
from webindex.oracle import OracleBM25
from webindex.search import SearcherActor, search_queries

CFG = IndexConfig(num_buckets=8, block_size=32)

VOCAB = ("alpha beta gamma delta merge join sort scan index shard stream "
         "window filter batch vector").split()
N_DOCS = 150


def _make_docs():
    rng = np.random.default_rng(41)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(5, 25))
        words = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), size=n)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    return rows


DOCS = _make_docs()
QUERIES = [("q1", "merge join"), ("q2", "stream window filter"),
           ("q3", "alpha vector")]


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("pageidx") / "docs_index")
    tab = pa.table(
        {"doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
         "text": pa.array([d["text"] for d in DOCS])}
    )
    build_index(rd.from_arrow(tab), out, CFG)
    return out


@pytest.fixture(scope="module")
def oracle():
    return OracleBM25([(d["doc_id"], d["text"]) for d in DOCS], CFG)


def test_page_walk_reproduces_global_ranking(index_dir, oracle):
    size = 7
    s = SearcherActor(index_dir, top_k=size, mode="auto")
    for qid, text in QUERIES:
        want = oracle.topk(text, 4 * size)
        got: list[tuple[int, float]] = []
        cursor = None
        for _ in range(4):
            if cursor is None:
                ids, scores = s.search_one(qid, text)
            else:
                ids, scores = s.search_one_after(qid, text, *cursor)
            if ids.size == 0:
                break
            got.extend(zip(ids.tolist(), scores.tolist()))
            cursor = (float(scores[-1]), int(ids[-1]))
        assert [d for d, _ in got] == [d for d, _ in want], qid
        np.testing.assert_allclose(
            [sc for _, sc in got], [sc for _, sc in want], rtol=0, atol=0
        )


def test_cursor_mid_tie_cuts_by_doc_id(index_dir, oracle):
    # single-term query: every doc with the same (tf, dl) scores EQUAL —
    # a cursor placed inside the tie run must resume at doc_id order
    s = SearcherActor(index_dir, top_k=1000, mode="exhaustive")
    ids, scores = s.search_one("t", "merge")
    # find a tie run of length >= 2 and cut inside it
    runs = np.flatnonzero(np.diff(scores) == 0)
    assert runs.size > 0, "fixture must contain score ties"
    cut = int(runs[0])
    ids2, scores2 = s.search_one_after(
        "t", "merge", float(scores[cut]), int(ids[cut])
    )
    assert ids2[: ids.size - cut - 1].tolist() == ids[cut + 1:].tolist()


def test_batch_paths_match_single(index_dir, ray_session):
    import ray.data as rd

    size = 5
    s = SearcherActor(index_dir, top_k=size, mode="auto")
    rows_q, rows_t, a_s, a_d = [], [], [], []
    for qid, text in QUERIES:
        ids, scores = s.search_one(qid, text)
        rows_q.append(qid)
        rows_t.append(text)
        a_s.append(float(scores[-1]))
        a_d.append(int(ids[-1]))
    q2 = rd.from_arrow(
        pa.table({"qid": pa.array(rows_q), "text": pa.array(rows_t),
                  "after_score": pa.array(a_s, pa.float64()),
                  "after_doc": pa.array(a_d, pa.int64())})
    )
    for impl in ("pool", "sharded"):
        runs = search_queries(
            q2, index_dir, top_k=size, impl=impl, concurrency=2,
            batch_size=8,
        ).to_pandas().sort_values(["qid", "rank"])
        for qid, text, asc, adoc in zip(rows_q, rows_t, a_s, a_d):
            want_ids, _ = s.search_one_after(qid, text, asc, adoc)
            sub = runs[runs["qid"] == qid]
            assert sub["doc_id"].tolist() == want_ids.tolist(), (impl, qid)


def test_term_vectors_match_analyzer_and_dict(index_dir, oracle, ray_session):
    import ray.data as rd

    seeds = [2, 11, 40]
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(seeds, pa.int64()),
             "text": pa.array([DOCS[i]["text"] for i in seeds])}
        )
    )
    got = (
        term_vectors(docs, index_dir)
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    rows = []
    for i in seeds:
        freqs = oracle.an.term_freqs(DOCS[i]["text"])
        dl = sum(freqs.values())
        for t in sorted(freqs):
            rows.append((i, t, freqs[t], dl, oracle.df(t)))
    assert list(
        got.itertuples(index=False, name=None)
    ) == rows
