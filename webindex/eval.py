"""IR evaluation: runs x qrels -> NDCG/MAP/Recall/P/MRR @ k.

Reference: ``EvaluateRetrieval.evaluate(qrels, results, k_values)`` via
pytrec_eval (/root/reference/biencoder/beir/beir_dense_retriever.py:446,
/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cells 12/14)
and the standalone metric code in the vendored fork
(/root/reference/biencoder/nli_msmarco/sentence-transformers/
sentence_transformers/evaluation/InformationRetrievalEvaluator.py:189-295).

Pinned metric definitions (trec_eval-compatible):
- DCG@k   = sum_{i<=k} rel_i / log2(i + 1)   (linear gain, ranks 1-based)
- NDCG@k  = DCG@k / IDCG@k (ideal = qrels sorted by rel desc)
- MAP@k   = mean over relevant docs of P@rank, denominator
            min(k, #relevant); rel > 0 counts as relevant
- P@k, Recall@k, MRR@k: standard.
Queries with no qrels are skipped (reference behavior:
InformationRetrievalEvaluator.py:42-45).

Distributed shape: runs and qrels are joined per-query inside
``groupby("qid").map_groups`` (qrels broadcast — they are tiny next to
runs), then metrics average with a global Mean aggregate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _per_query_metrics(ranked_dids: list[str], rels: dict[str, int],
                       k_values: list[int]) -> dict[str, float]:
    out: dict[str, float] = {}
    relevant = {d for d, r in rels.items() if r > 0}
    n_rel = len(relevant)
    gains = [rels.get(d, 0) for d in ranked_dids]
    ideal = sorted(rels.values(), reverse=True)
    for k in k_values:
        dcg = sum(g / math.log2(i + 2) for i, g in enumerate(gains[:k]))
        idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal[:k]))
        out[f"ndcg@{k}"] = dcg / idcg if idcg > 0 else 0.0
        topk = ranked_dids[:k]
        hits = sum(1 for d in topk if d in relevant)
        out[f"p@{k}"] = hits / k
        out[f"recall@{k}"] = hits / n_rel if n_rel else 0.0
        # MRR@k
        rr = 0.0
        for i, d in enumerate(topk):
            if d in relevant:
                rr = 1.0 / (i + 1)
                break
        out[f"mrr@{k}"] = rr
        # MAP@k
        num, ap = 0, 0.0
        for i, d in enumerate(topk):
            if d in relevant:
                num += 1
                ap += num / (i + 1)
        denom = min(k, n_rel) if n_rel else 0
        out[f"map@{k}"] = ap / denom if denom else 0.0
    return out


def evaluate_runs_pd(runs: pd.DataFrame, qrels: pd.DataFrame,
                     k_values=(1, 3, 5, 10, 100, 1000)) -> pd.DataFrame:
    """Single-process evaluation; returns one row per qid + metric columns."""
    qrel_map: dict[str, dict[str, int]] = {}
    for q, d, r in zip(qrels["qid"], qrels["did"], qrels["rel"]):
        qrel_map.setdefault(q, {})[d] = int(r)
    rows = []
    for qid, grp in runs.groupby("qid"):
        rels = qrel_map.get(qid)
        if not rels:
            continue  # reference skips queries without qrels
        ranked = grp.sort_values("rank")["did"].tolist()
        rows.append({"qid": qid, **_per_query_metrics(ranked, rels, list(k_values))})
    return pd.DataFrame(rows)


def evaluate_runs(runs_ds, qrels_pd: pd.DataFrame,
                  k_values=(1, 3, 5, 10, 100, 1000)):
    """Ray pipeline: per-qid map_groups with broadcast qrels -> macro means.

    Returns (per_query Dataset, macro-average dict).
    """
    qrel_map: dict[str, dict[str, int]] = {}
    for q, d, r in zip(qrels_pd["qid"], qrels_pd["did"], qrels_pd["rel"]):
        qrel_map.setdefault(q, {})[d] = int(r)
    kv = list(k_values)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["qid"].iloc[0]
        rels = qrel_map.get(qid)
        if not rels:
            return pd.DataFrame()
        ranked = g.sort_values("rank")["did"].tolist()
        return pd.DataFrame([{"qid": qid, **_per_query_metrics(ranked, rels, kv)}])

    per_q = runs_ds.groupby("qid").map_groups(per_group, batch_format="pandas")
    pdf = per_q.to_pandas()
    macro = {
        c: float(np.mean(pdf[c])) if len(pdf) else 0.0
        for c in pdf.columns
        if c != "qid"
    }
    macro["n_queries"] = len(pdf)
    return per_q, macro


# ---------------------------------------------------------------------------
# K5: model ranking / checkpoint selection over a metrics table
# ---------------------------------------------------------------------------


def model_averages(metrics: pd.DataFrame, *, model_col: str = "model",
                   metric_col: str = "ndcg@10") -> pd.DataFrame:
    """Per-model macro average of ``metric_col`` over datasets (A6,
    beir_dense_retriever.py:520-541: the "average" entry written per
    model)."""
    out = (
        metrics.groupby(model_col, sort=True)[metric_col]
        .mean()
        .reset_index()
        .rename(columns={metric_col: f"avg_{metric_col}"})
    )
    return out


def select_best_ckpt(metrics: pd.DataFrame, *, model_col: str = "model",
                     metric_col: str = "ndcg@10") -> pd.DataFrame:
    """Best checkpoint per model family by average metric (K5,
    beir_dense_retriever.py:543-592). Model names are ``<base>_<ckpt>``;
    the family is the name with its final ``_<ckpt>`` segment removed.
    Ties keep the first family member in sorted-name order (the
    reference's strict ``>`` comparison)."""
    avg = model_averages(metrics, model_col=model_col, metric_col=metric_col)
    acol = f"avg_{metric_col}"
    fam = avg[model_col].str.rsplit("_", n=1).str[0]
    avg = avg.assign(family=fam).sort_values(model_col)
    rows = []
    for family, grp in avg.groupby("family", sort=True):
        best = None
        best_score = -np.inf  # scores of 0.0 (or negative) still select
        for _, r in grp.iterrows():
            if r[acol] > best_score:
                best_score = r[acol]
                best = r
        if best is not None:
            rows.append(best)
    if not rows:
        return pd.DataFrame(columns=["family", model_col, acol])
    return (
        pd.DataFrame(rows)[["family", model_col, acol]]
        .reset_index(drop=True)
    )


def rank_models(metrics: pd.DataFrame, *, model_col: str = "model",
                metric_col: str = "ndcg@10", top_n: int = 5) -> pd.DataFrame:
    """Models sorted by average metric desc, top ``top_n`` (K5,
    beir_dense_retriever.py:594-604 ``rank_model_avg``). Ties break by
    ascending model name for determinism."""
    avg = model_averages(metrics, model_col=model_col, metric_col=metric_col)
    acol = f"avg_{metric_col}"
    out = avg.sort_values(
        [acol, model_col], ascending=[False, True], kind="mergesort"
    ).head(top_n).reset_index(drop=True)
    out["rank"] = out.index + 1
    return out


def paired_bootstrap(metrics_a: pd.DataFrame, metrics_b: pd.DataFrame, *,
                     metric: str = "ndcg@10", n_boot: int = 10_000,
                     seed: int = 7) -> dict:
    """Paired bootstrap significance test between two systems' per-query
    metrics (Sakai 2006 / the standard IR evaluation practice the
    reference's model comparisons imply): resample queries WITH
    replacement ``n_boot`` times from the paired per-query deltas and
    report the one-sided p-value that system A does NOT beat B, plus the
    observed mean delta and win/tie/loss counts.

    Inputs are (qid, <metric>) frames over the SAME query set (inner
    alignment on qid; a qid missing from either side is dropped —
    evaluation joins are exact-key). Deterministic: seeded generator,
    fixed resample count. Driver-side by design — per-query metric
    tables are queries-sized, orders of magnitude below any corpus."""
    a = metrics_a[["qid", metric]].rename(columns={metric: "a"})
    b = metrics_b[["qid", metric]].rename(columns={metric: "b"})
    j = a.merge(b, on="qid", how="inner").sort_values("qid")
    if j.empty:
        raise ValueError("paired_bootstrap: no overlapping qids")
    delta = (j["a"] - j["b"]).to_numpy(np.float64)
    n = delta.size
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, size=(n_boot, n))
    boot_means = delta[idx].mean(axis=1)
    # one-sided: how often a resampled world shows A <= B
    p = float((boot_means <= 0.0).sum() + 1) / (n_boot + 1)
    return {
        "n_queries": int(n),
        "mean_delta": float(delta.mean()),
        "wins": int((delta > 0).sum()),
        "ties": int((delta == 0).sum()),
        "losses": int((delta < 0).sum()),
        "p_value": p,
        "n_boot": int(n_boot),
    }


def mine_hard_negatives(queries_ds, qrels_ds, index_dir: str, *,
                        k: int = 10, depth: int = 100,
                        n_shards: int | None = None):
    """BM25 hard-negative mining — the training-data prep step of the
    reference's bi-encoder fine-tuning (SGPT trains on MS MARCO triples
    whose negatives are BM25 top hits that are NOT judged relevant;
    /root/reference/biencoder/nli_msmarco trains on exactly such
    triples): for each query, the ``k`` HIGHEST-BM25 documents that do
    not appear in qrels.

    queries(qid, text) x qrels(qid, doc_id) -> (qid, doc_id, score,
    neg_rank). The ranked retrieval is the standard sharded fan-out at
    ``top_k=depth``; qrels — queries-sized, never corpus-sized — are
    collected once and broadcast into a stateless anti-join batch filter
    (ray.put, read per task), then negatives re-rank per qid. ``depth``
    must exceed ``k`` by at least the max judged docs per query, or a
    query with many positives can come up short (ES-style fetch-k+1
    logic, generalized)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from webindex.search import search_queries

    runs = search_queries(
        queries_ds, index_dir, top_k=depth,
        **({"n_shards": n_shards} if n_shards else {}),
    )
    qrels_tab = (
        qrels_ds.to_pandas() if hasattr(qrels_ds, "to_pandas")
        else pd.DataFrame(qrels_ds, columns=["qid", "doc_id"])
    )
    # one blob in the object store; every filter task reads it zero-copy
    judged_ref = ray.put({
        (q, int(d))
        for q, d in zip(qrels_tab["qid"], qrels_tab["doc_id"])
    })

    def drop_judged(t: pa.Table) -> pa.Table:
        judged = ray.get(judged_ref)
        qids = t.column("qid").to_pylist()
        ids = t.column("doc_id").to_pylist()
        keep = np.array(
            [(q, d) not in judged for q, d in zip(qids, ids)], dtype=bool
        )
        return t.filter(pa.array(keep))

    def renumber(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k).reset_index(drop=True)
        g["neg_rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "score", "neg_rank"]]

    return (
        runs.map_batches(
            lambda t: t.select(["qid", "doc_id", "score"]),
            batch_format="pyarrow",
        )
        .map_batches(drop_judged, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(renumber, batch_format="pandas")
    )
