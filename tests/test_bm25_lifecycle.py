"""End-to-end §3.1 lifecycle: pages -> index -> runs -> JSON -> metrics,
resumable, with the synthetic qrels fixture."""

import json
import os

import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.pipelines.bm25 import run_bm25
from webindex.synth import (
    synth_pages_table,
    synth_qrels_table,
    synth_queries_table,
)

CFG = IndexConfig(num_buckets=8, n_parts=8, analyzer=AnalyzerConfig())


@pytest.mark.usefixtures("ray_session")
def test_lifecycle_and_resume(tmp_path):
    import pandas as pd
    import ray.data as rd

    out = str(tmp_path / "run")
    pages = rd.from_arrow(synth_pages_table(400, seed=3)).drop_columns(["text"])
    queries = rd.from_arrow(synth_queries_table(n=10))

    # qrels from the deduped corpus (single-threaded golden path)
    from webindex.docids import assign_doc_ids_py
    from webindex.extract import extract_text

    tab = synth_pages_table(400, seed=3)
    latest = {}
    for u, ts, h in zip(
        tab.column("url").to_pylist(),
        [t.value for t in tab.column("warc_ts")],
        tab.column("html").to_pylist(),
    ):
        if u not in latest or ts > latest[u][0]:
            latest[u] = (ts, h)
    ids = assign_doc_ids_py([(u, ts) for u, (ts, _) in latest.items()], 64)
    corpus = [
        (ids[u], extract_text(h)) for u, (ts, h) in latest.items()
        if extract_text(h)
    ]
    qrels_tab = synth_qrels_table(corpus, synth_queries_table(n=10))
    qrels = qrels_tab.to_pandas()

    res = run_bm25(
        pages, queries, out, cfg=CFG, top_k=50, qrels=qrels,
        k_values=[10], searcher_concurrency=2,
    )
    assert res.stats["N"] == len(corpus)
    assert os.path.exists(res.results_json)
    results = json.load(open(res.results_json))
    assert len(results) == 10
    assert res.metrics["n_queries"] > 0
    assert 0.0 < res.metrics["ndcg@10"] <= 1.0

    # resume: re-running reuses every checkpointed stage and yields the
    # identical runs table
    runs1 = pd.read_parquet(res.runs_path).sort_values(
        ["qid", "rank"]).reset_index(drop=True)
    res2 = run_bm25(
        pages, queries, out, cfg=CFG, top_k=50, qrels=qrels,
        k_values=[10], searcher_concurrency=2,
    )
    runs2 = pd.read_parquet(res2.runs_path).sort_values(
        ["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(runs1, runs2)
