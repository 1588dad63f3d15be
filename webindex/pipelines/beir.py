"""End-to-end BEIR BM25 quality reproduction (build -> top-k -> eval).

The one reference headline the sandbox cannot verify is BM25 quality on
real BEIR data (no network, no datasets baked in): the reference reports
macro-avg NDCG@10 = 0.4763 over 18 BEIR datasets via Elasticsearch's
``english`` analyzer, fields title+txt, top-1000
(/root/reference/other/sgpt_utils.ipynb cell 32; BASELINE.md quotes the
numbers). This module makes the reproduction a ONE-COMMAND affair the
day a BEIR zip is available:

    python tools/run_beir.py /path/to/scifact.zip --split test

Pipeline: S2 fetch/unzip (file:// or http), S1 loaders, string ``_id``
-> int64 docID via the engine's url-keyed id rule, title+text concat
(M3), full-english index build, top-1000 search, qrels join + NDCG/MAP/
R@k eval — every stage the pinned engine components, nothing bespoke.
The plumbing is fully tested on synthetic BEIR-format fixtures
(tests/test_beir_pipeline.py); only the real data is missing here.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from webindex.config import IndexConfig

#: the reference's reran per-dataset BM25 NDCG@10 values (public:
#: /root/reference/other/sgpt_utils.ipynb cell 32, paper-table order,
#: first = msmarco which the macro-average excludes)
REFERENCE_BM25_NDCG10 = [
    0.413, 0.757, 0.523, 0.350, 0.533, 0.707, 0.347, 0.338, 0.431,
    0.475, 0.311, 0.271, 0.370, 0.825, 0.409, 0.166, 0.819, 0.253,
    0.688,
]
REFERENCE_BM25_MACRO = 0.4763  # mean of the 18 non-msmarco values


def load_beir_dir(dataset_dir: str, *, split: str = "test"):
    """BEIR layout dir -> (corpus_ds, queries_ds, qrels_pd)."""
    from webindex.sources import (read_beir_corpus, read_beir_queries,
                                  read_qrels_tsv)

    corpus = read_beir_corpus(os.path.join(dataset_dir, "corpus.jsonl"))
    queries = read_beir_queries(os.path.join(dataset_dir, "queries.jsonl"))
    qrels = read_qrels_tsv(
        os.path.join(dataset_dir, "qrels", f"{split}.tsv")
    ).to_pandas()
    return corpus, queries, qrels


def run_beir_bm25(dataset_dir: str, out_dir: str, *, split: str = "test",
                  top_k: int = 1000, cfg: IndexConfig | None = None,
                  num_shards: int = 16,
                  k_values=(1, 3, 5, 10, 100, 1000),
                  searcher_concurrency=None) -> dict:
    """BEIR dataset dir -> metrics dict (written to out_dir/metrics.json).

    Query set restricted to qids with qrels (the reference's eval skips
    unjudged queries); docID mapping written as parquet next to the
    index so runs are joinable back to string ids."""
    import ray.data as rd

    from webindex.build import build_index
    from webindex.docids import assign_doc_ids
    from webindex.eval import evaluate_runs
    from webindex.search import search_queries
    from webindex.util import atomic_write_json

    corpus, queries, qrels = load_beir_dir(dataset_dir, split=split)

    # string _id -> int64 docID via the engine's url-keyed rule (the
    # BEIR id IS the "url"; warc_ts = 0 — ids depend only on the id set,
    # so they are stable across runs and parallelism levels)
    def as_pages(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("doc_id"),
                "warc_ts": pa.array(
                    np.zeros(t.num_rows, np.int64), pa.int64()
                ),
                "title": t.column("title"),
                "body": t.column("text"),
            }
        )

    with_ids = assign_doc_ids(
        corpus.map_batches(as_pages, batch_format="pyarrow"), num_shards
    )

    # M3: title + " " + text concat (reference hit["title"] + " " +
    # hit["txt"]); empty titles contribute a leading space the analyzer
    # tokenizes away
    def concat(t: pa.Table) -> pa.Table:
        texts = [
            ((ti or "") + " " + (tx or "")).strip()
            for ti, tx in zip(t.column("title").to_pylist(),
                              t.column("body").to_pylist())
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "url": t.column("url"),
                "text": pa.array(texts, pa.string()),
            }
        )

    docs = with_ids.map_batches(concat, batch_format="pyarrow")
    idx_dir = os.path.join(out_dir, "index")
    idmap_dir = os.path.join(out_dir, "idmap")
    os.makedirs(out_dir, exist_ok=True)
    docs.select_columns(["doc_id", "url"]).write_parquet(idmap_dir)
    build_index(
        docs.select_columns(["doc_id", "text"]), idx_dir,
        cfg or IndexConfig(),
    )

    # restrict queries to judged qids (reference eval behavior)
    judged = set(qrels["qid"])
    queries_pd = queries.to_pandas()
    queries_pd = queries_pd[queries_pd["qid"].isin(judged)]
    runs_ds = search_queries(
        rd.from_pandas(queries_pd), idx_dir, top_k=top_k, mode="auto",
        concurrency=searcher_concurrency,
    )

    # int docID -> string did: distributed hash join against the
    # corpus-sized idmap (the runs side is bounded at |queries| x top_k,
    # but the idmap is |corpus| rows — at BioASQ scale a driver pandas
    # frame of it is ~GB and at 100x it dies, so neither side touches
    # the driver)
    from webindex.relational import hash_join_attach

    runs_ds = hash_join_attach(
        runs_ds.drop_columns(["did"]), "doc_id",
        rd.read_parquet(idmap_dir), ["url"],
        rows_types={"qid": pa.string(), "doc_id": pa.int64(),
                    "score": pa.float64(), "rank": pa.int32()},
        val_types={"url": pa.string()},
    )
    runs_ds = runs_ds.map_batches(
        lambda t: t.rename_columns(
            ["did" if c == "url" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )

    _, macro = evaluate_runs(runs_ds, qrels, k_values=k_values)
    macro["dataset"] = os.path.basename(os.path.normpath(dataset_dir))
    macro["split"] = split
    macro["reference_macro_ndcg10"] = REFERENCE_BM25_MACRO
    atomic_write_json(os.path.join(out_dir, "metrics.json"), macro)
    return macro
