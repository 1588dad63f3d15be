"""rank_feature / distance_feature queries (additive docvalue boosts).

Brute oracles recompute the pinned formulas from OracleBM25 full scores
plus plain-Python contributions; the engine must match exactly in rank
order and to 1e-12 in score (same float-op sequence). Also gated:
missing-docvalue docs keep bare BM25, and results are invariant to the
shard fan-out width.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from webindex.build import build_index
from webindex.config import IndexConfig
from webindex.oracle import OracleBM25

CFG = IndexConfig(num_buckets=8, df_salt_threshold=60, salt_shards=2,
                  block_size=32)

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "rare1 rare2").split()
N_DOCS = 140
QUERIES = [
    ("q1", "alpha beta"),
    ("q2", "rare1 gamma"),
    ("q3", "alpha beta gamma delta"),
    ("q4", "rare2"),
]


def _make_docs():
    rng = np.random.default_rng(23)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(8, 40))
        words = [VOCAB[int(j)] for j in rng.integers(0, 10, size=n)]
        if i % 11 == 0:
            words.append("rare1")
        if i % 31 == 0:
            words.append("rare2")
        text = " ".join(words)
        rows.append({"doc_id": i, "text": text, "n_chars": len(text)})
    return rows


DOCS = _make_docs()
NC = {d["doc_id"]: d["n_chars"] for d in DOCS}


def _docs_table():
    return pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
            "text": pa.array([d["text"] for d in DOCS]),
            "n_chars": pa.array([d["n_chars"] for d in DOCS], pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("rfidx") / "docs_index")
    ds = rd.from_arrow(_docs_table())
    build_index(
        ds.select_columns(["doc_id", "text"]), out, CFG,
        docvalues_ds=ds.select_columns(["doc_id", "n_chars"]),
    )
    return out


@pytest.fixture(scope="module")
def partial_dv_index(ray_session, tmp_path_factory):
    """Same corpus, docvalues present only for EVEN doc_ids."""
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("rfidx2") / "docs_index")
    ds = rd.from_arrow(_docs_table())
    dv = ds.filter(lambda r: r["doc_id"] % 2 == 0)
    build_index(
        ds.select_columns(["doc_id", "text"]), out, CFG,
        docvalues_ds=dv.select_columns(["doc_id", "n_chars"]),
    )
    return out


@pytest.fixture(scope="module")
def oracle():
    return OracleBM25([(d["doc_id"], d["text"]) for d in DOCS], CFG)


def _qds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "qid": pa.array([q for q, _ in pairs]),
        "text": pa.array([t for _, t in pairs]),
    }))


def _got(runs_ds):
    out = {}
    for r in sorted(runs_ds.take_all(), key=lambda r: (r["qid"], r["rank"])):
        out.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    return out


def _want(oracle, contrib, k, *, has_dv=lambda d: True):
    want = {}
    for qid, text in QUERIES:
        fin = []
        for did, sc in oracle.topk(text, 10**9):
            bonus = contrib(float(NC[did])) if has_dv(did) else 0.0
            fin.append((did, sc + bonus))
        fin.sort(key=lambda t: (-t[1], t[0]))
        want[qid] = fin[:k]
    return want


def _check(got, want):
    assert set(got) == {q for q, rows in want.items() if rows}
    for qid, rows in want.items():
        if not rows:
            continue
        assert [d for d, _ in got[qid]] == [d for d, _ in rows], qid
        for (_, a), (_, b) in zip(got[qid], rows):
            assert a == pytest.approx(b, rel=1e-12)


@pytest.mark.parametrize("function,kw", [
    ("saturation", dict(pivot=90.0, boost=1.5)),
    ("log", dict(scaling=1.0, boost=0.7)),
    ("sigmoid", dict(pivot=90.0, boost=2.0, exponent=2)),
])
def test_rank_feature_matches_brute(index_dir, oracle, function, kw):
    from webindex.search import rank_feature_queries

    k = 7
    if function == "saturation":
        contrib = lambda v: kw["boost"] * (v / (v + kw["pivot"]))
    elif function == "log":
        contrib = lambda v: kw["boost"] * math.log(kw["scaling"] + v)
    else:
        e, p = kw["exponent"], kw["pivot"]
        contrib = lambda v: kw["boost"] * (v**e / (v**e + p**e))
    want = _want(oracle, contrib, k)
    runs = rank_feature_queries(
        _qds(QUERIES), index_dir, "n_chars", function=function,
        top_k=k, **kw,
    )
    _check(_got(runs), want)


def test_distance_feature_matches_brute(index_dir, oracle):
    from webindex.search import distance_feature_queries

    origin, pivot, boost, k = 150.0, 60.0, 2.5, 7
    contrib = lambda v: boost * (pivot / (pivot + abs(v - origin)))
    want = _want(oracle, contrib, k)
    runs = distance_feature_queries(
        _qds(QUERIES), index_dir, "n_chars", origin=origin, pivot=pivot,
        boost=boost, top_k=k,
    )
    _check(_got(runs), want)


def test_missing_docvalue_keeps_bare_bm25(partial_dv_index, oracle):
    from webindex.search import rank_feature_queries

    boost, pivot, k = 3.0, 50.0, 9
    contrib = lambda v: boost * (v / (v + pivot))
    want = _want(oracle, contrib, k, has_dv=lambda d: d % 2 == 0)
    runs = rank_feature_queries(
        _qds(QUERIES), partial_dv_index, "n_chars",
        function="saturation", pivot=pivot, boost=boost, top_k=k,
    )
    _check(_got(runs), want)


def test_shard_width_invariance(index_dir):
    from webindex.search import distance_feature_queries

    def run(n_shards):
        runs = distance_feature_queries(
            _qds(QUERIES), index_dir, "n_chars", origin=100.0,
            pivot=40.0, boost=1.0, top_k=8, n_shards=n_shards,
        )
        return sorted(
            (r["qid"], r["rank"], r["doc_id"], r["score"])
            for r in runs.take_all()
        )

    assert run(2) == run(5)


def test_param_validation(index_dir):
    from webindex.search import distance_feature_queries, rank_feature_queries

    qds = _qds([("a", "alpha")])
    with pytest.raises(ValueError, match="function"):
        rank_feature_queries(qds, index_dir, "n_chars", function="cube")
    with pytest.raises(ValueError, match="pivot"):
        rank_feature_queries(qds, index_dir, "n_chars",
                             function="saturation", pivot=0.0)
    with pytest.raises(ValueError, match="exponent"):
        rank_feature_queries(qds, index_dir, "n_chars", function="sigmoid",
                             pivot=1.0, exponent=0)
    with pytest.raises(ValueError, match="pivot"):
        distance_feature_queries(qds, index_dir, "n_chars", origin=0.0,
                                 pivot=-1.0)


def test_exists_missing_filters(partial_dv_index, oracle):
    """ES exists/missing queries: docvalue-presence selection, scores
    untouched (partial_dv_index has docvalues only for EVEN doc_ids)."""
    from webindex.search import search_queries

    def run(op):
        runs = search_queries(
            _qds(QUERIES), partial_dv_index, top_k=9,
            filter_pred=(("n_chars", op, None),),
        )
        return _got(runs)

    got_e, got_m = run("exists"), run("missing")
    for qid, text in QUERIES:
        scores = dict(oracle.topk(text, 10**9))
        for got, keep in ((got_e, lambda d: d % 2 == 0),
                          (got_m, lambda d: d % 2 == 1)):
            want = sorted(
                ((d, s) for d, s in scores.items() if keep(d)),
                key=lambda t: (-t[1], t[0]),
            )[:9]
            rows = got.get(qid, [])
            assert [d for d, _ in rows] == [d for d, _ in want], (qid, keep)
            for (_, a), (_, b) in zip(rows, want):
                assert a == pytest.approx(b, rel=1e-12)
