"""URL dedup + deterministic, partition-independent docID assignment.

The reference uses string doc ids carried through Python dicts (BEIR
``corpus.jsonl`` ``_id``); at 10^12-document scale we need int64 docIDs that
are (a) deterministic regardless of partitioning/parallelism (SURVEY.md §7.3
"Determinism under parallelism") and (b) assignable without a global sort.

Pinned scheme
-------------
- ``shard = blake2b64(url) % num_shards`` — a stable content hash, so a URL
  lands on the same shard on any cluster size;
- within a shard, URLs are deduplicated *latest ``warc_ts`` wins* (SURVEY.md
  §2.7 D5) and ranked in ascending URL order;
- ``doc_id = (shard << SHARD_BITS) | rank``.

Each shard's assignment depends only on that shard's URL set, so the whole
step is one ``groupby(shard).map_groups`` — embarrassingly parallel across
shards, no global sort, no driver loop. At 10^12 docs use ~2^20 shards
(shard fits ``doc_id < 2^63`` as long as ``num_shards < 2^23``).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd

SHARD_BITS = 40


def url_shard(url: str, num_shards: int) -> int:
    h = blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") % num_shards


def _shard_column(urls, num_shards: int) -> np.ndarray:
    return np.fromiter(
        (url_shard(u, num_shards) for u in urls), dtype=np.int64, count=len(urls)
    )


def assign_doc_ids_py(rows: list[tuple[str, int]], num_shards: int) -> dict[str, int]:
    """Single-threaded reference implementation (oracle + qrels generator).

    ``rows`` is ``[(url, warc_ts_ordinal)]``; returns ``{url: doc_id}`` for
    the deduped (latest-wins) corpus.
    """
    latest: dict[str, int] = {}
    for url, ts in rows:
        if url not in latest or ts > latest[url]:
            latest[url] = ts
    by_shard: dict[int, list[str]] = {}
    for url in latest:
        by_shard.setdefault(url_shard(url, num_shards), []).append(url)
    out: dict[str, int] = {}
    for shard, urls in by_shard.items():
        for rank, url in enumerate(sorted(urls)):
            out[url] = (shard << SHARD_BITS) | rank
    return out


class AddShardColumn:
    """map_batches stage: adds ``shard`` from ``url``."""

    def __init__(self, num_shards: int):
        self.num_shards = num_shards

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["shard"] = _shard_column(batch["url"].tolist(), self.num_shards)
        return batch


def _dedup_and_rank(group: pd.DataFrame) -> pd.DataFrame:
    """Per-shard: latest-wins URL dedup, ascending-URL rank -> doc_id."""
    g = group.sort_values(["url", "warc_ts"], kind="mergesort")
    g = g.drop_duplicates(subset="url", keep="last")
    shard = int(g["shard"].iloc[0])
    g = g.drop(columns=["shard"])
    g.insert(
        0,
        "doc_id",
        (shard << SHARD_BITS) | np.arange(len(g), dtype=np.int64),
    )
    return g


def assign_doc_ids(pages_ds, num_shards: int):
    """Ray Data pipeline: pages(url, warc_ts, ...) -> adds ``doc_id``.

    One shuffle (groupby shard); each group is processed independently so
    the result is identical at any parallelism level.
    """
    with_shard = pages_ds.map_batches(
        AddShardColumn(num_shards), batch_format="pandas"
    )
    return with_shard.groupby("shard").map_groups(
        _dedup_and_rank, batch_format="pandas"
    )
