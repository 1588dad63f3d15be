"""Query execution as a stateful actor-pool ``map_batches`` stage.

The reference batches 128 queries per ES msearch round-trip
(/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10 via
beir BM25Search — SURVEY.md §2.6 K6); here a pool of ``SearcherActor``s
holds the hot dictionary / doclens / decoded-postings cache (loaded once in
``__init__``, SURVEY.md §2.3 T4) and processes Arrow query batches.

Output is the flat runs table (FIXTURES.md F4):
``(qid:string, did:string, doc_id:int64, score:float64, rank:int32)`` —
the reference's nested ``Dict[qid, Dict[did, score]]`` results JSON
(/root/reference/biencoder/beir/beir_dense_retriever.py:443-445) made
columnar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from webindex.analyze import Analyzer
from webindex.segments import SegmentReader
from webindex.wand import block_max_wand, exhaustive_topk


class SearcherActor:
    """``mode``:
    - ``"wand"``       — block-max WAND (document-at-a-time with skipping);
    - ``"exhaustive"`` — vectorized scatter-add over full posting lists;
    - ``"auto"``       — WAND only when the heap can actually prune:
      estimated candidate count (sum of query-term dfs) must exceed
      ``top_k`` by a wide margin, otherwise the vectorized exhaustive path
      is strictly faster (WAND visits nearly every candidate anyway, at
      Python-loop cost). Both paths are rank- and score-identical
      (tests/test_build_search.py), so the switch is purely physical.
    """

    # WAND must be able to skip ~98% of candidates to beat vectorized
    # scoring; below this candidates/k ratio, score everything.
    AUTO_WAND_RATIO = 10_000

    def __init__(self, index_dir: str, top_k: int = 1000,
                 mode: str = "auto", self_hit_filter: bool = False,
                 preload: bool = True, segments_ref=None,
                 doc_id_range=None):
        self.reader = SegmentReader(index_dir, doc_id_range=doc_id_range)
        if preload:
            # resident segments (T4): per-query latency pays decode + score,
            # never cold parquet scans. When the pool driver put the
            # segments table in the object store, every actor preloads from
            # the SAME zero-copy Arrow buffers — the parquet files are read
            # once per node, not once per actor.
            tab = None
            if segments_ref is not None:
                import ray

                tab = ray.get(segments_ref)
            self.reader.preload(table=tab)
        self.an = Analyzer(self.reader.cfg.analyzer)
        self.top_k = top_k
        self.mode = mode
        self.self_hit = self_hit_filter

    def search_one(self, qid: str, text: str):
        terms = self.an.tokens(text or "")
        # self-hit anti-join (SURVEY.md §2.4 J4): fetch k+1 then drop did==qid
        k = self.top_k + 1 if self.self_hit else self.top_k
        mode = self.mode
        if mode == "auto":
            est = sum(self.reader.df(t) for t in set(terms))
            mode = "wand" if est > k * self.AUTO_WAND_RATIO else "exhaustive"
        fn = block_max_wand if mode == "wand" else exhaustive_topk
        ids, scores = fn(self.reader, terms, k)
        if self.self_hit and ids.size:
            keep = np.array([str(d) != qid for d in ids])
            ids, scores = ids[keep], scores[keep]
        ids, scores = ids[: self.top_k], scores[: self.top_k]
        return ids, scores

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out, dids_out, docid_out, score_out, rank_out = [], [], [], [], []
        for qid, text in zip(
            batch.column("qid").to_pylist(), batch.column("text").to_pylist()
        ):
            ids, scores = self.search_one(qid, text)
            n = ids.size
            qids_out.extend([qid] * n)
            dids_out.extend(str(d) for d in ids)
            docid_out.append(ids)
            score_out.append(scores)
            rank_out.append(np.arange(1, n + 1, dtype=np.int32))
        return pa.table(
            {
                "qid": pa.array(qids_out, pa.string()),
                "did": pa.array(dids_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(docid_out) if docid_out else
                    np.empty(0, np.int64)
                ),
                "score": pa.array(
                    np.concatenate(score_out) if score_out else
                    np.empty(0, np.float64)
                ),
                "rank": pa.array(
                    np.concatenate(rank_out) if rank_out else
                    np.empty(0, np.int32)
                ),
            }
        )


def search_queries(queries_ds, index_dir: str, *, top_k: int = 1000,
                   mode: str = "auto", self_hit_filter: bool = False,
                   concurrency=None, batch_size: int = 128):
    """queries(qid, text) Dataset -> runs Dataset via the actor pool."""
    import os

    import pyarrow.dataset as pads
    import ray

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    # one read of the segments dataset, shared with every pool actor
    # through the object store (zero-copy Arrow buffers)
    seg_root = os.path.join(index_dir, "segments")
    segments_ref = (
        ray.put(pads.dataset(seg_root).to_table())
        if os.path.isdir(seg_root)
        else None
    )
    return queries_ds.map_batches(
        SearcherActor,
        fn_constructor_kwargs=dict(
            index_dir=index_dir, top_k=top_k, mode=mode,
            self_hit_filter=self_hit_filter, segments_ref=segments_ref,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
