"""End-to-end BM25 lifecycle (SURVEY.md §3.1) as one composable call.

The reference's notebook flow
(/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cells 2-16):
load corpus -> (re)build ES index -> retrieve top-k for all queries ->
dump results JSON -> evaluate vs qrels. This module is that lifecycle on
the Ray engine: pages parquet -> extract/dedup/docIDs -> checkpointed index
build -> WAND top-k through the searcher actor pool -> runs parquet +
reference-shape results JSON -> metrics. Each stage streams; only the
(small) runs/metrics artifacts materialize.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd

from webindex.config import IndexConfig
from webindex.util import atomic_write_json


@dataclass
class BM25RunResult:
    index_dir: str
    runs_path: str          # parquet runs table (qid, did, doc_id, score, rank)
    results_json: str       # reference-shape {qid: {did: score}}
    stats: dict
    metrics: dict = field(default_factory=dict)


def run_bm25(pages_ds, queries_ds, out_dir: str, *,
             cfg: IndexConfig | None = None, top_k: int = 1000,
             num_shards: int = 64, qrels: pd.DataFrame | None = None,
             k_values=(1, 3, 5, 10, 100, 1000),
             searcher_concurrency=None) -> BM25RunResult:
    """pages(url, warc_ts, html, lang) + queries(qid, text) -> runs + eval.

    Resumable: the index build checkpoints per stage; the runs table is
    written partitioned parquet and skipped if already complete.
    """
    from webindex.build import build_index
    from webindex.eval import evaluate_runs
    from webindex.pipelines.corpus import prepare_corpus_from_pages
    from webindex.search import search_queries
    from webindex.sources import write_runs_json
    from webindex.util import StageRunner

    cfg = cfg or IndexConfig()
    idx_dir = os.path.join(out_dir, "index")
    corpus = prepare_corpus_from_pages(pages_ds, num_shards=num_shards)
    stats = build_index(corpus, idx_dir, cfg)

    runner = StageRunner(out_dir)
    runs_dir = runner.out_dir("runs")

    def stage_runs(tmp):
        runs = search_queries(
            queries_ds, idx_dir, top_k=top_k, mode="auto",
            concurrency=searcher_concurrency,
        )
        runs.write_parquet(tmp)
        return {}

    runner.run("runs", stage_runs)

    import pyarrow.dataset as pads

    runs_pd = pads.dataset(runs_dir).to_table().to_pandas()
    results_json = os.path.join(out_dir, "results.json")
    all_qids = [str(q) for q in queries_ds.to_pandas()["qid"]]
    write_runs_json(runs_pd, results_json, all_qids=all_qids)

    metrics: dict = {}
    if qrels is not None and len(qrels):
        import ray.data as rd

        _, metrics = evaluate_runs(
            rd.from_pandas(runs_pd), qrels, k_values=k_values
        )
        atomic_write_json(os.path.join(out_dir, "metrics.json"), metrics)

    return BM25RunResult(
        index_dir=idx_dir, runs_path=runs_dir, results_json=results_json,
        stats=stats, metrics=metrics,
    )
