"""Dense-path embedding stage (A1 poolings, M5/M6/M9) and rerank pipeline
(J2 + Reorderer K3) — determinism, pooling math vs numpy oracle, and
batch-size/parallelism invariance (reference test pattern:
sentence-transformers tests/test_compute_embeddings.py:26-47 batch-size
invariance)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from webindex.embed import EmbedStage, dense_retrieve, pool, token_vector
from webindex.rerank import (
    OverlapScorer,
    Reorderer,
    perfect_rerank,
    rerank_runs,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "quick gray fox and the dog",
    "",
]


def _corpus_table():
    return pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS),
        }
    )


def test_token_vector_deterministic_unit():
    v1, v2 = token_vector("fox", 64), token_vector("fox", 64)
    assert np.array_equal(v1, v2)
    assert np.isclose(np.linalg.norm(v1), 1.0)
    assert not np.allclose(v1, token_vector("dog", 64))


def test_pooling_math_vs_numpy():
    mat = np.arange(12, dtype=np.float64).reshape(4, 3)
    assert np.allclose(pool(mat, "mean"), mat.mean(axis=0))
    w = np.array([1.0, 2.0, 3.0, 4.0])
    assert np.allclose(
        pool(mat, "weightedmean"), (mat * w[:, None]).sum(0) / w.sum()
    )
    assert np.allclose(pool(mat, "lasttoken"), mat[3])


def test_embed_stage_semantics():
    out = EmbedStage(dim=32, max_tokens=5)( _corpus_table())
    assert out.column("n_tokens").to_pylist()[0] == 5  # truncated to max
    assert out.column("truncated").to_pylist()[0] is True
    assert out.column("n_tokens").to_pylist()[4] == 0  # empty doc
    # empty doc -> zero vector
    assert not any(out.column("embedding").to_pylist()[4])

    # specb wrapping changes the embedding and the roles differ (M6)
    d = EmbedStage(dim=32, role="doc")(_corpus_table())
    q = EmbedStage(dim=32, role="query")(_corpus_table())
    plain = EmbedStage(dim=32)(_corpus_table())
    e_d = np.array(d.column("embedding").to_pylist()[0])
    e_q = np.array(q.column("embedding").to_pylist()[0])
    e_p = np.array(plain.column("embedding").to_pylist()[0])
    assert not np.allclose(e_d, e_q)
    assert not np.allclose(e_d, e_p)

    # left truncation keeps the TAIL (M9)
    left = EmbedStage(dim=32, max_tokens=3, truncate_side="left",
                      pooling="lasttoken")(_corpus_table())
    right = EmbedStage(dim=32, max_tokens=3, pooling="lasttoken")(
        _corpus_table()
    )
    lv = np.array(left.column("embedding").to_pylist()[0])
    rv = np.array(right.column("embedding").to_pylist()[0])
    assert not np.allclose(lv, rv)
    assert np.allclose(lv, token_vector("dog", 32))


def test_dense_retrieve_matches_single_threaded(ray_session):
    import ray.data as rd

    corpus = rd.from_arrow(_corpus_table())
    queries = ["quick fox", "liquor jugs"]
    runs = dense_retrieve(
        corpus, [0, 1], queries, k=3, dim=32, concurrency=2, batch_size=2
    ).to_pandas()

    # single-threaded oracle: embed everything in one process, full matmul
    stage = EmbedStage(dim=32)
    demb = np.array(
        stage(_corpus_table()).column("embedding").to_pylist(), dtype=np.float64
    )
    from webindex.embed import embed_texts

    qemb = embed_texts(queries, dim=32)

    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    sims = norm(qemb) @ norm(demb).T
    for qi in range(2):
        want = np.argsort(-sims[qi], kind="stable")[:3]
        got = runs[runs["query_id"] == qi].sort_values("rank")["vec_id"]
        assert got.tolist() == want.tolist()


def test_reorderer_restores_order():
    items = ["aaaa", "b", "cc", "dddddd"]
    r = Reorderer(items)
    assert r.items == ["dddddd", "aaaa", "cc", "b"]
    assert r.restore([len(x) for x in r.items]) == [4, 1, 2, 6]


def test_rerank_runs_pipeline(ray_session):
    runs = pd.DataFrame(
        [
            ("q1", "0", 5.0, 1),
            ("q1", "3", 4.0, 2),
            ("q1", "1", 3.0, 3),
        ],
        columns=["qid", "did", "score", "rank"],
    )
    queries = {"q1": "quick fox dog"}
    lookup = {str(i): DOCS[i] for i in range(4)}
    out = rerank_runs(runs, queries, lookup, depth=3, concurrency=2)
    assert set(out["did"]) == {"0", "3", "1"}
    # doc 3 shares 3 terms with the query, doc 0 shares 3 too but doc 1 none;
    # overlap scorer must rank 1 last
    assert out[out["rank"] == 3]["did"].iloc[0] == "1"
    sc = OverlapScorer()
    want = sc.predict([(queries["q1"], lookup[d]) for d in out["did"]])
    assert np.allclose(out["score"].to_numpy(), want)


def test_perfect_rerank_upper_bound():
    runs = pd.DataFrame(
        [("q1", "a", 3.0, 1), ("q1", "b", 2.0, 2), ("q1", "c", 1.0, 3)],
        columns=["qid", "did", "score", "rank"],
    )
    qrels = pd.DataFrame([("q1", "c", 1)], columns=["qid", "did", "rel"])
    out = perfect_rerank(runs, qrels, depth=3)
    assert out[out["rank"] == 1]["did"].iloc[0] == "c"

    from webindex.eval import evaluate_runs_pd

    runs2 = out.copy()
    m = evaluate_runs_pd(runs2, qrels, k_values=[3]).iloc[0]
    assert m["ndcg@3"] == pytest.approx(1.0)


def test_extended_poolings_analytic():
    """A1 variants vs hand-computed numpy oracles
    (beir_dense_retriever.py:237-305, models/WeightedMeanPooling.py)."""
    rng = np.random.default_rng(7)
    L, d, n_layers = 5, 8, 3
    layer_mats = rng.standard_normal((n_layers, L, d))
    mat = layer_mats[-1]

    np.testing.assert_allclose(
        pool(mat, "meanmean", layer_mats=layer_mats),
        layer_mats.reshape(-1, d).mean(axis=0), rtol=1e-12,
    )
    np.testing.assert_allclose(
        pool(mat, "lasttokenmean", layer_mats=layer_mats),
        layer_mats[:, -1, :].mean(axis=0), rtol=1e-12,
    )
    np.testing.assert_allclose(
        pool(mat, "poolout"), np.tanh(mat[0]), rtol=1e-12
    )
    w = np.array([0.5, 2.0, 1.0, 0.0, 3.0])
    np.testing.assert_allclose(
        pool(mat, "weightedmean_learnt", position_weights=w),
        (mat * w[:, None]).sum(axis=0) / w.sum(), rtol=1e-12,
    )
    # all-zero learnt weights hit the reference's 1e-9 clamp, not a div0
    z = pool(mat, "weightedmean_learnt", position_weights=np.zeros(L))
    assert np.isfinite(z).all()
    # empty doc -> zero vector for every pooling
    for m in ("meanmean", "lasttokenmean", "poolout", "weightedmean_learnt"):
        out = pool(np.zeros((0, d)), m, position_weights=np.ones(4))
        assert (out == 0).all()


def test_embed_stage_extended_poolings_deterministic():
    tab = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta gamma", "delta"], pa.string()),
        }
    )
    for m in ("meanmean", "lasttokenmean", "poolout", "weightedmean_learnt"):
        a = EmbedStage(dim=16, pooling=m)(tab)
        b = EmbedStage(dim=16, pooling=m)(tab)
        assert a.equals(b), m
        v = np.array(a.column("embedding").to_pylist())
        assert v.shape == (2, 16)
        assert np.isfinite(v).all()
    # layered poolings differ from plain mean (distinct layer vectors)
    mm = EmbedStage(dim=16, pooling="meanmean")(tab)
    mn = EmbedStage(dim=16, pooling="mean")(tab)
    assert not np.allclose(
        np.array(mm.column("embedding").to_pylist()),
        np.array(mn.column("embedding").to_pylist()),
    )
    # untrained learnt weights (all ones) == unweighted mean
    wl = EmbedStage(dim=16, pooling="weightedmean_learnt")(tab)
    np.testing.assert_allclose(
        np.array(wl.column("embedding").to_pylist()),
        np.array(mn.column("embedding").to_pylist()), rtol=1e-6,
    )


def test_max_query_tokens_aggregate(ray_session):
    """A4: distributed partial-max equals the driver-side max, and the
    doc budget follows the reference truncation rule (tokens kept =
    max_token_len - max_query_len - 1)."""
    import ray.data as rd

    from webindex.analyze import Analyzer
    from webindex.config import SQL_SAFE_ANALYZER
    from webindex.embed import doc_token_budget, max_query_tokens

    texts = ["alpha beta gamma", "", "one two three four five six",
             "x", "the quick brown fox jumps"]
    ds = rd.from_items(
        [{"qid": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(3)
    an = Analyzer(SQL_SAFE_ANALYZER)
    expect = max(len(an.tokens(t)) for t in texts)
    assert max_query_tokens(ds) == expect

    assert doc_token_budget(2048, expect) == 2048 - expect - 1
    with pytest.raises(ValueError):
        doc_token_budget(10, 10)

    # empty query set -> 0 (and the budget degenerates to the window - 1)
    empty = rd.from_items([{"qid": 0, "text": ""}])
    assert max_query_tokens(empty) == 0


def test_dense_retrieve_budgeted_truncation(ray_session):
    """budget_total wires A4 into the doc-side EmbedStage: with a tight
    window, docs truncate to budget_total - max_query_len - 1 tokens and
    the runs match an explicitly-truncated dense_retrieve."""
    import ray.data as rd

    docs = [
        {"doc_id": 1, "text": "aa bb cc dd ee ff gg hh"},
        {"doc_id": 2, "text": "aa bb cc"},
        {"doc_id": 3, "text": "zz yy xx ww vv"},
    ]
    queries = ["aa bb", "zz"]
    corpus = rd.from_items(docs)
    budget_total = 6  # max_query_len = 2 -> doc budget 3
    got = (
        dense_retrieve(corpus, [0, 1], queries, k=3, dim=16,
                       budget_total=budget_total, concurrency=1)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    want = (
        dense_retrieve(rd.from_items(docs), [0, 1], queries, k=3, dim=16,
                       max_tokens=3, concurrency=1)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
