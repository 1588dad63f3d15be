"""The ES ``rescore`` API: re-score the top window of a primary BM25
ranking with a secondary query, combine as

    final = query_weight * primary + rescore_query_weight * secondary

(score_mode=total — the ES default; weights equal to 1 multiply nothing,
so the float ops match the SQL oracle text exactly).

One pinned deviation, for determinism: ES rescores each SHARD's top
``window_size`` (results change with shard count); here the window is the
GLOBAL top ``window_size`` under the primary order (score desc, docID
asc) — partition-count-independent and strictly more exact. ``top_k``
must be <= ``window_size`` (documents outside the window cannot re-enter,
exactly as in ES).

Scale shape: the window (queries x window_size rows, never corpus-sized)
routes to its OWNING salt-range shards by docID — the fetch-phase routing
(webindex/search.py fetch_fields) — where each shard task computes the
secondary contributions at its resident docs with one searchsorted per
rescore term; the combine is vectorized per row and the final per-qid
re-rank is the standard exact merge.

Reference anchor: the reranking lifecycle (SURVEY.md §3.3) — BM25 top-k
re-scored by a second scorer and re-ranked — is exactly this shape; the
reference does it driver-side over nested dicts
(/root/reference/crossencoder/beir/sgptce.py:343-374).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rescore_queries(queries: list[tuple[str, str, str]], index_dir: str, *,
                    top_k: int = 10, window_size: int = 50,
                    query_weight: float = 1.0,
                    rescore_query_weight: float = 1.0,
                    n_shards: int | None = None):
    """[(qid, primary_text, rescore_text)] -> runs (qid, doc_id, score,
    rank): the global primary top-``window_size`` per query, re-scored
    and re-ranked. Secondary scores are plain BM25 of the rescore query
    over the window docs (ascending-term float64 sums, like everything)."""
    import os

    import pandas as pd
    import ray.data as rd

    from webindex.analyze import Analyzer
    from webindex.config import IndexConfig
    from webindex.search import SEARCH_SHARDS, _shard_searcher, search_queries
    from webindex.serve import shard_salt_bounds
    from webindex.util import read_json
    from webindex.wand import _dense

    if top_k > window_size:
        raise ValueError("top_k must be <= window_size (docs outside the "
                         "rescore window cannot re-enter, as in ES)")
    if n_shards is None:
        n_shards = SEARCH_SHARDS

    an = Analyzer(IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))).analyzer)
    rterms = {
        qid: sorted(set(an.tokens(rq or ""))) for qid, _q, rq in queries
    }

    q_ds = rd.from_arrow(pa.table({
        "qid": pa.array([q for q, _, _ in queries], pa.string()),
        "text": pa.array([t for _, t, _ in queries], pa.string()),
    }))
    primary = search_queries(
        q_ds, index_dir, top_k=window_size, n_shards=n_shards
    ).map_batches(
        lambda t: t.select(["qid", "doc_id", "score"]),
        batch_format="pyarrow",
    )

    bounds = shard_salt_bounds(index_dir, n_shards)
    cfg = IndexConfig.from_dict(
        read_json(os.path.join(index_dir, "config.json"))
    )
    salt_lows = np.array([lo for lo, _hi in bounds], dtype=np.int64)
    shift, sps = cfg.salt_doc_shift, cfg.shards_per_salt

    def route(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        salt = (ids >> shift) // sps  # the pinned docID->salt math
        shard = np.clip(
            np.searchsorted(salt_lows, salt, side="right") - 1,
            0, len(bounds) - 1,
        ).astype(np.int32)
        return batch.append_column("_shard", pa.array(shard))

    def rescore_shard(g: pa.Table) -> pa.Table:
        sid = g.column("_shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, 1, "auto", False)
        r = searcher.inner.reader
        ids = g.column("doc_id").to_numpy()
        qids = np.asarray(g.column("qid").to_pylist(), dtype=object)
        pos = np.searchsorted(r._dl_ids, ids)  # window ids are indexed
        sec = np.zeros(ids.size, dtype=np.float64)
        for qid in sorted(set(qids.tolist())):
            rows = np.flatnonzero(qids == qid)
            rpos = pos[rows]
            add = np.zeros(rows.size, dtype=np.float64)
            for t in rterms.get(qid, ()):  # ascending term order
                pl = r.postings(t)
                if pl is None:
                    continue
                _dense(pl, r)
                idx = np.searchsorted(pl.dense_pos, rpos)
                idx = np.minimum(idx, max(pl.dense_pos.size - 1, 0))
                hit = (pl.dense_pos[idx] == rpos) if pl.dense_pos.size \
                    else np.zeros(rows.size, dtype=bool)
                add[hit] += pl.dense_contrib[idx[hit]]
            sec[rows] = add
        p = g.column("score").to_numpy()
        left = p if query_weight == 1.0 else query_weight * p
        right = sec if rescore_query_weight == 1.0 \
            else rescore_query_weight * sec
        final = left + right
        return pa.table(
            {
                "qid": g.column("qid"),
                "doc_id": g.column("doc_id"),
                "score": pa.array(final, pa.float64()),
            }
        )

    def rerank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "score", "rank"]]

    return (
        primary.map_batches(route, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(rescore_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(rerank, batch_format="pandas")
    )
