"""Metric implementation checks: hand-computed toy + perfect-ranking upper
bound (reference oracle pattern: "perfect rerank" runs,
/root/reference/other/sgpt_utils.ipynb cells 13-14 — SURVEY.md §5.3)."""

import math

import pandas as pd
import pytest

from webindex.eval import evaluate_runs, evaluate_runs_pd


def _runs(rows):
    return pd.DataFrame(rows, columns=["qid", "did", "score", "rank"])


def test_hand_computed_toy():
    # q1: ranked [d1, d2, d3]; rels: d1=2 (rank1), d3=1 (rank3)
    runs = _runs([("q1", "d1", 3.0, 1), ("q1", "d2", 2.0, 2), ("q1", "d3", 1.0, 3)])
    qrels = pd.DataFrame(
        [("q1", "d1", 2), ("q1", "d3", 1)], columns=["qid", "did", "rel"]
    )
    m = evaluate_runs_pd(runs, qrels, k_values=[3]).iloc[0]
    dcg = 2 / math.log2(2) + 0 + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3)
    assert m["ndcg@3"] == pytest.approx(dcg / idcg)
    assert m["p@3"] == pytest.approx(2 / 3)
    assert m["recall@3"] == pytest.approx(1.0)
    assert m["mrr@3"] == pytest.approx(1.0)
    assert m["map@3"] == pytest.approx((1 / 1 + 2 / 3) / 2)


def test_perfect_ranking_upper_bound():
    qrels = pd.DataFrame(
        [("q1", "a", 2), ("q1", "b", 1), ("q2", "c", 1)],
        columns=["qid", "did", "rel"],
    )
    runs = _runs(
        [("q1", "a", 9.0, 1), ("q1", "b", 8.0, 2), ("q2", "c", 9.0, 1)]
    )
    df = evaluate_runs_pd(runs, qrels, k_values=[10])
    assert (df["ndcg@10"] == 1.0).all()
    assert (df["recall@10"] == 1.0).all()
    assert (df["mrr@10"] == 1.0).all()
    assert (df["map@10"] == 1.0).all()


def test_query_without_qrels_skipped():
    runs = _runs([("qX", "d", 1.0, 1)])
    qrels = pd.DataFrame([("qY", "d", 1)], columns=["qid", "did", "rel"])
    assert evaluate_runs_pd(runs, qrels).empty


@pytest.mark.usefixtures("ray_session")
def test_ray_eval_matches_pd():
    import ray.data as rd

    runs = _runs(
        [("q1", "d1", 3.0, 1), ("q1", "d2", 2.0, 2), ("q2", "d9", 5.0, 1),
         ("q2", "d1", 4.0, 2)]
    )
    qrels = pd.DataFrame(
        [("q1", "d2", 1), ("q2", "d9", 2), ("q2", "d1", 1)],
        columns=["qid", "did", "rel"],
    )
    expect = evaluate_runs_pd(runs, qrels, k_values=[1, 2]).set_index("qid")
    per_q, macro = evaluate_runs(rd.from_pandas(runs), qrels, k_values=[1, 2])
    got = per_q.to_pandas().set_index("qid")
    pd.testing.assert_frame_equal(
        got.sort_index(), expect.sort_index(), check_like=True
    )
    assert macro["n_queries"] == 2
    assert macro["ndcg@2"] == pytest.approx(float(expect["ndcg@2"].mean()))


def test_k5_model_ranking_helpers():
    """K5 (beir_dense_retriever.py:543-604): checkpoint selection + model
    ranking over a metrics table."""
    import pandas as pd

    from webindex.eval import model_averages, rank_models, select_best_ckpt

    metrics = pd.DataFrame(
        {
            "model": ["sgpt125m_100", "sgpt125m_100", "sgpt125m_200",
                      "sgpt125m_200", "sgpt6b_100", "sgpt6b_100"],
            "dataset": ["scifact", "nfcorpus"] * 3,
            "ndcg@10": [0.5, 0.3, 0.6, 0.4, 0.7, 0.5],
        }
    )
    avg = model_averages(metrics)
    assert dict(zip(avg["model"], avg["avg_ndcg@10"])) == {
        "sgpt125m_100": 0.4, "sgpt125m_200": 0.5, "sgpt6b_100": 0.6,
    }
    best = select_best_ckpt(metrics)
    assert dict(zip(best["family"], best["model"])) == {
        "sgpt125m": "sgpt125m_200", "sgpt6b": "sgpt6b_100",
    }
    ranked = rank_models(metrics, top_n=2)
    assert ranked["model"].tolist() == ["sgpt6b_100", "sgpt125m_200"]
    assert ranked["rank"].tolist() == [1, 2]

    # all-zero (or negative) averages must still select a checkpoint per
    # family, and an all-zero table must not crash on the empty frame
    zero = metrics.assign(**{"ndcg@10": 0.0})
    bz = select_best_ckpt(zero)
    assert set(bz["family"]) == {"sgpt125m", "sgpt6b"}
    # strict > keeps the first member in sorted-name order on ties
    assert dict(zip(bz["family"], bz["model"]))["sgpt125m"] == "sgpt125m_100"
    empty = select_best_ckpt(metrics.iloc[0:0])
    assert len(empty) == 0 and list(empty.columns) == [
        "family", "model", "avg_ndcg@10"
    ]


def test_paired_bootstrap_properties():
    import numpy as np
    import pandas as pd

    from webindex.eval import paired_bootstrap

    rng = np.random.default_rng(3)
    qids = [f"q{i}" for i in range(200)]
    base = rng.random(200)
    a = pd.DataFrame({"qid": qids, "ndcg@10": np.clip(base + 0.08, 0, 1)})
    b = pd.DataFrame({"qid": qids, "ndcg@10": base})
    r = paired_bootstrap(a, b, n_boot=2000, seed=7)
    # a clearly better system: tiny p, all wins
    assert r["p_value"] < 0.01
    assert r["wins"] == 200 and r["losses"] == 0
    assert abs(r["mean_delta"] - 0.08) < 0.02
    # identical systems: all ties, p ~= 1 (<=0 every resample)
    r2 = paired_bootstrap(a, a, n_boot=500, seed=7)
    assert r2["ties"] == 200 and r2["p_value"] > 0.99
    # deterministic under the same seed
    r3 = paired_bootstrap(a, b, n_boot=2000, seed=7)
    assert r3 == r
    # noise-level difference: p must NOT claim significance
    c = pd.DataFrame(
        {"qid": qids,
         "ndcg@10": np.clip(base + rng.normal(0, 0.05, 200), 0, 1)}
    )
    r4 = paired_bootstrap(c, b, n_boot=2000, seed=7)
    assert r4["p_value"] > 0.01


@pytest.mark.usefixtures("ray_session")
def test_mine_hard_negatives(tmp_path):
    """Negatives are the top-scoring UNjudged docs, in ranked order; a
    judged doc never appears even when it ranks first."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from webindex.build import build_index
    from webindex.config import SQL_SAFE_ANALYZER, IndexConfig
    from webindex.eval import mine_hard_negatives
    from webindex.oracle import OracleBM25

    cfg = IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=4)
    rng = np.random.default_rng(5)
    vocab = "alpha beta gamma delta".split()
    docs = [
        (i, " ".join(vocab[int(j)] for j in rng.integers(0, 4, size=12)))
        for i in range(60)
    ]
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })), idx, cfg)

    o = OracleBM25(docs, cfg)
    ranked = [d for d, _ in o.topk("alpha beta", 30)]
    judged = set(ranked[:3])  # the top 3 are all positives
    want = [d for d in ranked if d not in judged][:5]

    qds = rd.from_arrow(pa.table({"qid": ["q"], "text": ["alpha beta"]}))
    qrels = rd.from_arrow(pa.table({
        "qid": pa.array(["q"] * len(judged)),
        "doc_id": pa.array(sorted(judged), pa.int64()),
    }))
    rows = mine_hard_negatives(qds, qrels, idx, k=5, depth=30).take_all()
    rows.sort(key=lambda r: r["neg_rank"])
    assert [r["doc_id"] for r in rows] == want
    assert not judged & {r["doc_id"] for r in rows}
