"""Doc-partitioned distributed serving: shard searcher actors + top-k merge.

The reference's serving tier is one Elasticsearch node (SURVEY.md §2.3 T4);
at 10^12 docs the index cannot live in one searcher. This module is the
scale architecture: N ``ShardSearcher`` actors each own a contiguous salt
range (= docID range — webindex.build salts every posting by the docID's
shard prefix), every query fans out to all shards, and the partial top-k
rows merge exactly (SURVEY.md §2.6 K1's chunk-merge, made a service).

Exactness: a document lives in exactly one salt range, document frequency
and corpus stats are global (dictionary/stats artifacts), so each shard
computes final BM25 scores for its own documents; the merge is a
concatenation + (score desc, docID asc) top-k — bit-identical to a single
searcher over the whole index (tests/test_serve.py).

This intentionally uses raw ``@ray.remote`` actors rather than a Dataset
stage: scatter-gather routing by shard key is the one pattern
``map_batches`` actor pools cannot express (pool actors are
interchangeable; shards are not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class _ShardSearcherImpl:
    """Plain class (wrapped by ray.remote below, reusable in-process for
    tests): a SearcherActor restricted to blocks whose salt lies in
    [salt_lo, salt_hi]."""

    def __init__(self, index_dir: str, salt_lo: int, salt_hi: int,
                 top_k: int = 1000, mode: str = "auto",
                 self_hit_filter: bool = False, filter_pred=None,
                 match: str = "or"):
        import pyarrow.dataset as pads

        from webindex.config import IndexConfig
        from webindex.search import SearcherActor
        from webindex.util import read_json

        cfg = IndexConfig.from_dict(
            read_json(f"{index_dir}/config.json")
        )
        # inclusive docID range covered by [salt_lo, salt_hi]: per-actor
        # doclen residency (and dense-score arrays) bounded by the shard
        doc_lo = salt_lo * cfg.shards_per_salt << cfg.salt_doc_shift
        doc_hi = (
            ((salt_hi + 1) * cfg.shards_per_salt) << cfg.salt_doc_shift
        ) - 1
        self.inner = SearcherActor(
            index_dir, top_k=top_k, mode=mode, preload=False,
            self_hit_filter=self_hit_filter,
            doc_id_range=(doc_lo, doc_hi),
            filter_pred=filter_pred, match=match,
        )
        reader = self.inner.reader
        seg_root = reader._seg_root
        import os

        if os.path.isdir(seg_root):
            tab = pads.dataset(seg_root).to_table(
                filter=(pads.field("salt") >= salt_lo)
                & (pads.field("salt") <= salt_hi)
            )
            reader.preload(table=tab)
        self.salt = (salt_lo, salt_hi)

    def search_batch(self, pairs: list[tuple[str, str]]):
        """[(qid, text)] -> list of (qid, doc_id, score) partial rows."""
        out = []
        for qid, text in pairs:
            ids, scores = self.inner.search_one(qid, text)
            out.extend(zip([qid] * ids.size, ids.tolist(), scores.tolist()))
        return out


def shard_salt_bounds(index_dir: str, n_shards: int) -> list[tuple[int, int]]:
    """Split the index's salt space into <= n_shards contiguous inclusive
    (salt_lo, salt_hi) ranges (shared by the serving tier and the batch
    query path)."""
    from webindex.config import IndexConfig
    from webindex.util import read_json

    stats = read_json(f"{index_dir}/stats.json")
    cfg = IndexConfig.from_dict(read_json(f"{index_dir}/config.json"))
    max_salt = (stats["max_doc_id"] >> cfg.salt_doc_shift) // cfg.shards_per_salt
    n_shards = max(1, min(n_shards, max_salt + 1))
    bounds = np.linspace(0, max_salt + 1, n_shards + 1).astype(int)
    return [
        (int(lo), int(hi - 1))
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]


def merge_partials(rows: list[tuple[str, int, float]], k: int) -> pd.DataFrame:
    """Partial (qid, doc_id, score) rows from all shards -> exact global
    top-k runs (score desc, docID asc), ranks 1-based."""
    if not rows:
        return pd.DataFrame(
            {"qid": pd.Series(dtype=object),
             "doc_id": pd.Series(dtype=np.int64),
             "score": pd.Series(dtype=np.float64),
             "rank": pd.Series(dtype=np.int32)}
        )
    df = pd.DataFrame(rows, columns=["qid", "doc_id", "score"])
    df = df.sort_values(
        ["qid", "score", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    df = df.groupby("qid", sort=False).head(k).reset_index(drop=True)
    df["rank"] = (df.groupby("qid", sort=False).cumcount() + 1).astype(np.int32)
    return df


class ShardedSearchService:
    """Spawns ``n_shards`` ShardSearcher actors over the index's salt space
    and serves exact top-k via scatter-gather."""

    def __init__(self, index_dir: str, n_shards: int = 4,
                 top_k: int = 1000, mode: str = "auto",
                 filter_pred=None, match: str = "or"):
        import ray

        Actor = ray.remote(_ShardSearcherImpl)
        self.top_k = top_k
        self.actors = [
            Actor.remote(index_dir, lo, hi, top_k=top_k, mode=mode,
                         filter_pred=filter_pred, match=match)
            for lo, hi in shard_salt_bounds(index_dir, n_shards)
        ]

    def search(self, pairs: list[tuple[str, str]]) -> pd.DataFrame:
        """[(qid, text)] -> exact global runs table."""
        import ray

        partials = ray.get(
            [a.search_batch.remote(pairs) for a in self.actors]
        )
        return merge_partials(
            [r for part in partials for r in part], self.top_k
        )
