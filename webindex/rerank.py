"""Cross-encoder rerank pipeline (SURVEY.md §3.3) with pluggable scorers.

Re-expresses the reference's rerank flow
(/root/reference/crossencoder/beir/sgptce.py:265-374) Ray-Data-first:

1. take the top-``depth`` (qid, did) of an input runs table (J2's gather);
2. join the doc texts — broadcast lookup via ``ray.put`` (the small side is
   depth x |queries| docs, never the full corpus);
3. score (query, doc) pairs in an actor-pool ``map_batches`` stage, with the
   reference's ``Reorderer`` length-sort + inverse-permutation restore
   (K3, sgptce.py:102-129,156-167) applied *inside* each batch — at the
   Dataset level Ray's scheduler owns ordering, so the permutation trick
   survives only as intra-batch padding efficiency;
4. emit a new runs table ranked (score desc, did asc).

Scorers are duck-typed ``predict(pairs: list[tuple[str, str]]) ->
list[float]`` (the reference's reranker contract, sgptce.py:314-333).
``OverlapScorer`` is the deterministic stand-in for the GPT log-prob
scorer; ``perfect_rerank`` reproduces the metric-upper-bound oracle
(/root/reference/other/sgpt_utils.ipynb cells 13-14).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from webindex.analyze import Analyzer
from webindex.config import SQL_SAFE_ANALYZER


class Reorderer:
    """Length-descending sort with inverse-permutation restore
    (sgptce.py:102-129): batches become length-uniform for padding, and
    results are returned in the original order."""

    def __init__(self, items: list, length_fn=len):
        self.order = np.argsort([-length_fn(x) for x in items], kind="stable")
        self.items = [items[i] for i in self.order]

    def restore(self, results: list) -> list:
        out = [None] * len(results)
        for pos, orig in enumerate(self.order):
            out[orig] = results[pos]
        return out


class OverlapScorer:
    """Deterministic pair scorer: |query terms ∩ doc terms| + Jaccard
    tie-break — a reproducible stand-in for GPT continuation log-probs
    (sgptce.py:255-260)."""

    def __init__(self, analyzer_cfg=None):
        self.an = Analyzer(analyzer_cfg or SQL_SAFE_ANALYZER)

    def predict(self, pairs: list[tuple[str, str]]) -> list[float]:
        reorder = Reorderer(pairs, length_fn=lambda p: len(p[1]))
        scores = []
        for q, d in reorder.items:
            qs, ds_ = set(self.an.tokens(q)), set(self.an.tokens(d))
            inter = len(qs & ds_)
            union = len(qs | ds_) or 1
            scores.append(float(inter) + len(qs & ds_) / union)
        return reorder.restore(scores)


class PairScoreStage:
    """Actor-pool stage over (qid, did, query, doc) rows."""

    def __init__(self, scorer_factory):
        self.scorer = scorer_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pairs = list(
            zip(batch.column("query").to_pylist(), batch.column("doc").to_pylist())
        )
        scores = self.scorer.predict(pairs)
        return pa.table(
            {
                "qid": batch.column("qid"),
                "did": batch.column("did"),
                "score": pa.array(scores, pa.float64()),
            }
        )


def rerank_runs(runs_df: pd.DataFrame, queries: dict[str, str],
                doc_lookup: dict, depth: int = 100,
                scorer_factory=OverlapScorer, *, concurrency=2,
                batch_size: int = 128):
    """runs (qid, did|doc_id, score, ...) -> reranked runs (qid, did, score,
    rank), scoring the BM25 top-``depth`` per query (sgptce.py:343-374).

    ``doc_lookup`` maps did -> text for the gathered docs only (the J2
    small side); build it from the corpus with a semi-join before calling.
    """
    import ray
    import ray.data as rd

    did_col = "did" if "did" in runs_df.columns else "doc_id"
    # stable sort + did tie-break so the candidate cut at the depth
    # boundary is deterministic across runs/partitionings
    top = (
        runs_df.sort_values(
            ["qid", "score", did_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        .groupby("qid", sort=False)
        .head(depth)
    )
    texts_ref = ray.put(doc_lookup)
    qref = ray.put(dict(queries))

    def attach(batch: pa.Table) -> pa.Table:
        docs = ray.get(texts_ref)
        qs = ray.get(qref)
        qids = [str(x) for x in batch.column("qid").to_pylist()]
        dids = batch.column(did_col).to_pylist()
        return pa.table(
            {
                "qid": pa.array(qids),
                "did": pa.array([str(d) for d in dids]),
                "query": pa.array([qs[q] for q in qids]),
                "doc": pa.array([docs[d] for d in dids]),
            }
        )

    pairs_ds = rd.from_pandas(top[["qid", did_col]]).map_batches(
        attach, batch_format="pyarrow"
    )
    scored = pairs_ds.map_batches(
        PairScoreStage,
        fn_constructor_args=(scorer_factory,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).to_pandas()
    scored = scored.sort_values(
        ["qid", "score", "did"], ascending=[True, False, True]
    ).reset_index(drop=True)
    scored["rank"] = scored.groupby("qid", sort=False).cumcount() + 1
    return scored


def perfect_rerank(runs_df: pd.DataFrame, qrels: pd.DataFrame,
                   depth: int = 10) -> pd.DataFrame:
    """Metric upper bound: move judged-relevant docs of the top-``depth``
    to the front (score = rel + 1), everything else keeps rank order with
    score descending below 1 (sgpt_utils.ipynb cells 13-14)."""
    did_col = "did" if "did" in runs_df.columns else "doc_id"
    rel = {
        (str(q), str(d)): int(r)
        for q, d, r in zip(qrels["qid"], qrels["did"], qrels["rel"])
    }
    top = (
        runs_df.sort_values(["qid", "score"], ascending=[True, False])
        .groupby("qid", sort=False)
        .head(depth)
        .copy()
    )
    base = 1.0 / (2 + np.arange(len(top)))
    top["score"] = [
        float(rel.get((str(q), str(d)), 0) + 1) if (str(q), str(d)) in rel else b
        for q, d, b in zip(top["qid"], top[did_col], base)
    ]
    top = top.rename(columns={did_col: "did"})
    top = top.sort_values(
        ["qid", "score", "did"], ascending=[True, False, True]
    ).reset_index(drop=True)
    top["rank"] = top.groupby("qid", sort=False).cumcount() + 1
    return top[["qid", "did", "score", "rank"]]


def rrf_fuse(runs_list, *, k_const: int = 60, top_k: int = 10):
    """Reciprocal-rank fusion (Cormack et al. 2009; the ES/OpenSearch
    hybrid-search combiner): fused score of a doc =
    ``sum over retrievers of 1 / (k_const + rank)``, summed in retriever
    order (pinned float order — each term is one exact-int division).
    Retrievers contribute only their own ranked window (the ES
    ``rank_window_size`` semantics: a doc outside a retriever's window
    adds 0 from that side).

    ``runs_list``: Datasets with (qid, doc_id, rank). Output
    (qid, doc_id, score, rank) with the standard (score desc, docID asc)
    total order. The union is window x queries x retrievers rows — tiny
    relative to any corpus — so the merge is one small per-qid kernel.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    tagged = None
    for side, runs in enumerate(runs_list):
        t = runs.map_batches(
            lambda b, s=side: pa.table(
                {
                    "qid": b.column("qid"),
                    "doc_id": b.column("doc_id"),
                    "rank": b.column("rank"),
                    "side": pa.array(
                        np.full(b.num_rows, s, dtype=np.int32)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        tagged = t if tagged is None else tagged.union(t)

    kk = float(k_const)

    n_sides = len(runs_list)

    def fuse(g: pd.DataFrame) -> pd.DataFrame:
        ids_all = g["doc_id"].to_numpy(np.int64)
        uniq, inv = np.unique(ids_all, return_inverse=True)
        contrib = 1.0 / (kk + g["rank"].to_numpy(np.float64))
        sides = g["side"].to_numpy(np.int32)
        score = np.zeros(uniq.size, dtype=np.float64)
        # one scatter-add PER SIDE, ascending: the summation order is
        # side order exactly (a doc appears at most once per side), the
        # same left-to-right order the SQL oracle's coalesce chain uses
        for s in range(n_sides):
            m = sides == s
            score[inv[m]] += contrib[m]
        out = pd.DataFrame(
            {
                "qid": g["qid"].iloc[0],  # one qid per group
                "doc_id": uniq,
                "score": score,
            }
        ).sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
        return out

    return tagged.groupby("qid").map_groups(fuse, batch_format="pandas")
