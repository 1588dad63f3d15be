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


def _key128(url: str, ts: int) -> tuple[int, int]:
    """128-bit digest of (url, warc_ts) — the broadcast-join key. Split
    into two uint64 halves; ts is mixed into the low half. Collision odds
    for matching BOTH halves are ~2^-128 — content-addressing grade."""
    d = blake2b(url.encode("utf-8"), digest_size=16).digest()
    hi = int.from_bytes(d[:8], "big")
    lo = int.from_bytes(d[8:], "big") ^ ((ts * 0x9E3779B97F4A7C15) & _U64)
    return hi, lo


_U64 = (1 << 64) - 1


def _dedup_and_rank_keys(group: pd.DataFrame) -> pd.DataFrame:
    """Per-shard over KEY ROWS ONLY: latest-wins URL dedup, ascending-URL
    rank -> (url, warc_ts, doc_id, n_ties, k_hi, k_lo). ``n_ties`` counts
    rows that carried the winning (url, max warc_ts) — >1 flags
    exact-duplicate records needing the slow dedup path. k_hi/k_lo is the
    128-bit (url, ts) digest the broadcast lookup matches on (computed
    here, distributed — the driver never hashes urls)."""
    g = group.sort_values(["url", "warc_ts"], kind="mergesort")
    ties = g.groupby(["url", "warc_ts"], sort=False).size().rename("n_ties")
    g = g.drop_duplicates(subset="url", keep="last")
    g = g.merge(ties.reset_index(), on=["url", "warc_ts"], how="left")
    shard = int(g["shard"].iloc[0])
    g = g.drop(columns=["shard"])
    g.insert(
        0,
        "doc_id",
        (shard << SHARD_BITS) | np.arange(len(g), dtype=np.int64),
    )
    ks = [
        _key128(u, int(t))
        for u, t in zip(g["url"], g["warc_ts"].astype("int64"))
    ]
    g["k_hi"] = np.array([k[0] for k in ks], dtype=np.uint64)
    g["k_lo"] = np.array([k[1] for k in ks], dtype=np.uint64)
    return g


_BCAST_CACHE: dict[str, object] = {}


def _broadcast_cached(ref):
    """Worker-process-cached ray.get for broadcast Python objects."""
    import ray

    key = ref.hex()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


# Above this many distinct urls the id side-table is joined back with a
# distributed hash join instead of a broadcast lookup. The broadcast side
# is four numpy arrays (~32 bytes/url), shared zero-copy from the object
# store — ~50M urls fits a 128GB node comfortably. (A pandas/dict
# broadcast was catastrophically worse: 400MB pickled frame re-unpickled
# per fresh worker + a GB-scale Python dict per worker. Ray 2.49's
# Dataset.join also measured far slower than broadcast at every size that
# fits; prefer broadcast whenever memory allows.)
BROADCAST_MAX_URLS = 50_000_000


# Key tables at or below this row count are processed in ONE driver-side
# pass (a few MB) instead of a distributed groupby — Ray's sort shuffle
# carries ~2s of fixed cost that dwarfs small inputs. Both paths run the
# SAME per-shard function, so ids are identical.
DRIVER_KEYS_MAX = 500_000


def build_id_table(pages_ds, num_shards: int, *,
                   driver_keys_max: int = DRIVER_KEYS_MAX):
    """(url, warc_ts) keys -> side table (url, warc_ts, doc_id, n_ties,
    k_hi, k_lo).

    Only the ~30-byte key rows go through the groupby(shard) shuffle; the
    page payload (html) never moves here. Each shard's output depends only
    on its own URL set, so ids are identical at any parallelism level.
    """
    import ray.data as rd

    keys = pages_ds.select_columns(["url", "warc_ts"])
    rows = keys.count()
    if rows <= driver_keys_max:
        kdf = keys.to_pandas()
        kdf["shard"] = _shard_column(kdf["url"].tolist(), num_shards)
        parts = [
            _dedup_and_rank_keys(g)
            for _, g in kdf.groupby("shard", sort=True)
        ]
        return rd.from_pandas(pd.concat(parts, ignore_index=True))
    keys = keys.map_batches(AddShardColumn(num_shards), batch_format="pandas")
    # key rows are ~30 bytes: coalesce to few fat blocks before the sort
    # shuffle — Ray's sort pays per-task overhead per input block, which
    # dominates when blocks are tiny
    keys = keys.repartition(16)
    return keys.groupby("shard").map_groups(
        _dedup_and_rank_keys, batch_format="pandas"
    )


def assign_doc_ids(pages_ds, num_shards: int, *,
                   broadcast_max_urls: int = BROADCAST_MAX_URLS):
    """Ray Data pipeline: pages(url, warc_ts, ...) -> adds ``doc_id``,
    drops stale duplicates (latest ``warc_ts`` wins).

    Physical plan: the wide step runs over key columns only
    (``build_id_table``); the payload is then matched to its id by
    ``attach_ids``.
    """
    # one distributed execution; count on the materialized table is a
    # metadata read, and only the broadcast branch pulls rows to the driver
    id_tab = build_id_table(pages_ds, num_shards).materialize()
    return attach_ids(pages_ds, id_tab, num_shards,
                      broadcast_max_urls=broadcast_max_urls)


def attach_ids(pages_ds, id_tab, num_shards: int, *,
               broadcast_max_urls: int = BROADCAST_MAX_URLS):
    """Inner-join an id side table (url, warc_ts, doc_id, n_ties, k_hi,
    k_lo — the ``build_id_table`` schema; ``id_tab`` must be materialized)
    onto a pages Dataset: rows without a matching (url, warc_ts) key are
    DROPPED (that is what implements latest-wins dedup, and it lets a
    caller pass a pruned id table — e.g. the refresh pipeline's
    newer-than-indexed delta subset).

    Small tables broadcast as four numpy arrays (``ray.put`` once,
    zero-copy per task); above ``broadcast_max_urls`` a distributed hash
    join runs instead. Exact duplicate (url, warc_ts) records
    (n_ties > 1) resolve deterministically to the lexicographically
    smallest payload."""
    import ray

    n_urls = id_tab.count()

    if n_urls <= broadcast_max_urls:
        # side = four numpy arrays sorted by (k_hi, k_lo): zero-copy
        # ray.get in every task, vectorized searchsorted lookup — no
        # pandas frame, no per-worker dict, no unpickle cost
        import pyarrow as pa

        side = id_tab.select_columns(
            ["k_hi", "k_lo", "doc_id", "n_ties"]
        ).to_pandas()
        k_hi = side["k_hi"].to_numpy().astype(np.uint64)
        k_lo = side["k_lo"].to_numpy().astype(np.uint64)
        order = np.lexsort((k_lo, k_hi))
        any_ties = bool((side["n_ties"].to_numpy() > 1).any())
        payload = {
            "k_hi": np.ascontiguousarray(k_hi[order]),
            "k_lo": np.ascontiguousarray(k_lo[order]),
            "doc_id": np.ascontiguousarray(
                side["doc_id"].to_numpy()[order]
            ),
        }
        if any_ties:
            payload["n_ties"] = np.ascontiguousarray(
                side["n_ties"].to_numpy()[order].astype(np.int32)
            )
        ref = ray.put(payload)

        def attach(batch: pa.Table) -> pa.Table:
            s = ray.get(ref)  # numpy arrays: zero-copy from object store
            if s["k_hi"].size == 0:
                empty = batch.slice(0, 0)
                return empty.add_column(
                    0, "doc_id", pa.array([], pa.int64())
                )
            urls = batch.column("url").to_pylist()
            tss = batch.column("warc_ts").cast("int64").to_pylist()
            ks = [_key128(u, t) for u, t in zip(urls, tss)]
            bh = np.array([k[0] for k in ks], dtype=np.uint64)
            bl = np.array([k[1] for k in ks], dtype=np.uint64)
            lo = np.searchsorted(s["k_hi"], bh, side="left")
            hi_b = np.searchsorted(s["k_hi"], bh, side="right")
            pos = np.minimum(lo, s["k_hi"].size - 1)
            # verify both 128-bit halves; equal-k_hi spans are
            # single-element at these densities (fast path), but scan the
            # full span when longer so a k_hi collision can't drop a page
            hit = (hi_b > lo) & (s["k_lo"][pos] == bl)
            multi = (hi_b - lo > 1) & ~hit
            for i in np.flatnonzero(multi):
                j = lo[i] + np.searchsorted(
                    s["k_lo"][lo[i]:hi_b[i]], bl[i]
                )
                if j < hi_b[i] and s["k_lo"][j] == bl[i]:
                    pos[i] = j
                    hit[i] = True
            out = batch.filter(pa.array(hit))
            sel = pos[hit]
            arrays = [pa.array(s["doc_id"][sel], pa.int64())]
            names = ["doc_id"]
            for i, name in enumerate(out.column_names):
                arrays.append(out.column(i))
                names.append(name)
            res = pa.table(dict(zip(names, arrays)))
            if "n_ties" in s:
                res = res.append_column(
                    "_tie", pa.array(s["n_ties"][sel] > 1)
                )
            return res

        joined = pages_ds.map_batches(attach, batch_format="pyarrow")
        if not any_ties:
            return joined
    else:
        any_ties = True  # resolved post-join in the distributed path
        joined = pages_ds.join(
            id_tab,
            join_type="inner",
            num_partitions=max(64, num_shards),
            on=("url", "warc_ts"),
        ).map_batches(
            lambda df: df.assign(_tie=df["n_ties"] > 1).drop(columns=["n_ties"]),
            batch_format="pandas",
        )
        if not any_ties:
            return joined.map_batches(
                lambda df: df.drop(columns=["_tie"]), batch_format="pandas"
            )

    # Exact-duplicate (url, warc_ts) records: tiny flagged subset goes
    # through a per-doc_id deterministic pick (lexicographically smallest
    # payload); the clean bulk passes straight through.
    def _split(df: pd.DataFrame, want_tie: bool) -> pd.DataFrame:
        mask = df["_tie"].to_numpy(bool)
        out = df.loc[mask if want_tie else ~mask]
        return out.drop(columns=["_tie"])

    def _pick_one(g: pd.DataFrame) -> pd.DataFrame:
        cols = [c for c in ("html", "url", "warc_ts") if c in g.columns]
        return g.sort_values(cols, kind="mergesort").head(1)

    clean = joined.map_batches(
        lambda df: _split(df, False), batch_format="pandas"
    )
    resolved = (
        joined.map_batches(lambda df: _split(df, True), batch_format="pandas")
        .groupby("doc_id")
        .map_groups(_pick_one, batch_format="pandas")
    )
    return clean.union(resolved)
