"""Incremental crawl refresh: re-crawl delta -> tombstones + delta index
-> merge. The continuous-crawl lifecycle composed from the engine's own
primitives (SURVEY.md §7.1 step 5 builds the merge; webindex.lifecycle the
tombstones): the reference's ES index would be fed the re-crawl via bulk
upserts — here the immutable-artifact equivalent is

  1. join the delta's (url, warc_ts) keys against the old index's urlmap
     sidecar, per shard: a delta row survives only if its url is new or
     strictly newer than the indexed crawl (stale re-crawls drop);
  2. assign surviving rows fresh docIDs ABOVE the shard's old max rank
     (``doc_id = shard << 40 | rank`` — disjoint from every old id by
     construction, so the relay merge needs no re-numbering);
  3. build a delta index over just those pages and merge it with the old
     index (hardlinked relays, one re-encode — webindex.merge);
  4. tombstone the superseded old docIDs in the merged index (Lucene
     liveDocs semantics, webindex.lifecycle) — compaction physically
     removes them and corrects the statistics whenever the operator
     chooses.

Scale shape: the wide step touches KEY ROWS only (url, ts, id — one
groupby(shard), the docids pattern); page payloads cross the cluster once
(attach + extract + delta build); the merge hardlinks relays and re-encodes
once; tombstones and the merged urlmap are written distributed (no
driver-side id collection). A daily 1% delta therefore costs ~1% of a
rebuild plus one re-encode pass.

Determinism: delta ids depend only on (old urlmap, delta key set) — the
per-shard function is partition-count-independent like docids' — so a
re-run of the same refresh produces identical ids, and the whole flow is
resumable (delta build and merge are StageRunner-checkpointed; tombstone/
urlmap writes are guarded by done-markers).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from webindex.config import IndexConfig
from webindex.docids import (
    BROADCAST_MAX_URLS,
    DRIVER_KEYS_MAX,
    SHARD_BITS,
    _key128,
    attach_ids,
    build_id_table,
)
from webindex.util import atomic_write_json, read_json

RANK_MASK = (1 << SHARD_BITS) - 1

_REFRESH_SCHEMA = {
    "url": pd.Series(dtype=object),
    "warc_ts": pd.Series(dtype=np.int64),      # raw int64, delta table's unit
    "ts_ns": pd.Series(dtype=np.int64),        # canonical ns (urlmap dtype)
    "doc_id": pd.Series(dtype=np.int64),
    "n_ties": pd.Series(dtype=np.int64),
    "k_hi": pd.Series(dtype=np.uint64),
    "k_lo": pd.Series(dtype=np.uint64),
    "superseded": pd.Series(dtype=np.int64),   # old doc_id, -1 = new url
}


def _ts_ns(s: pd.Series) -> np.ndarray:
    """Canonical int64 nanoseconds (urlmap sidecars store ns so successive
    refreshes compare timestamps in one unit regardless of source unit)."""
    if np.issubdtype(s.dtype, np.datetime64):
        return s.to_numpy().astype("datetime64[ns]").astype(np.int64)
    return s.to_numpy().astype(np.int64)


def _norm_ts_ns(batch: pa.Table) -> pa.Table:
    """Normalize a pages batch's warc_ts to int64 NANOSECONDS. The whole
    refresh flow (urlmap comparison, _key128 keys, attach_ids' cast, the
    distributed-join fallback) then operates on ONE integer unit — a
    timestamp[us] delta vs a ns urlmap would otherwise compare and join
    garbage."""
    col = batch.column("warc_ts")
    typ = col.type
    if pa.types.is_timestamp(typ):
        col = col.cast(pa.timestamp("ns")).cast(pa.int64())
    else:
        col = col.cast(pa.int64())
    i = batch.column_names.index("warc_ts")
    return batch.set_column(i, "warc_ts", col)


def _refresh_shard(g: pd.DataFrame) -> pd.DataFrame:
    """One shard's old urlmap rows (kind=0) + delta key rows (kind=1) ->
    surviving delta id rows. Depends only on the shard's own rows —
    partition-count-independent, the docids determinism contract."""
    shard = int(g["shard"].iloc[0])
    old = g[g["kind"] == 0]
    delta = g[g["kind"] == 1]
    if delta.empty:
        return pd.DataFrame(_REFRESH_SCHEMA)
    # latest-wins within the delta itself; count exact-dup key rows the
    # same way build_id_table does (n_ties > 1 -> deterministic payload
    # pick inside attach_ids)
    delta = delta.sort_values(["url", "ts_ns"], kind="mergesort")
    ties = (
        delta.groupby(["url", "ts_ns"], sort=False)
        .size()
        .rename("n_ties")
        .reset_index()
    )
    delta = delta.drop_duplicates(subset="url", keep="last")
    delta = delta.merge(ties, on=["url", "ts_ns"], how="left")
    if len(old):
        om = old[["url", "ts_ns", "doc_id"]].rename(
            columns={"ts_ns": "old_ts", "doc_id": "old_id"}
        )
        # nullable Int64: a float64 coercion would silently round ids
        om = om.assign(old_id=om["old_id"].astype("Int64"))
        delta = delta.merge(om, on="url", how="left")
        delta = delta[
            delta["old_ts"].isna() | (delta["ts_ns"] > delta["old_ts"])
        ]
        next_rank = int(
            (old["doc_id"].to_numpy(np.int64) & RANK_MASK).max()
        ) + 1
    else:
        delta = delta.assign(
            old_id=pd.array([pd.NA] * len(delta), dtype="Int64")
        )
        next_rank = 0
    if delta.empty:
        return pd.DataFrame(_REFRESH_SCHEMA)
    delta = delta.sort_values("url", kind="mergesort").reset_index(drop=True)
    new_ids = (shard << SHARD_BITS) | (
        next_rank + np.arange(len(delta), dtype=np.int64)
    )
    ts_raw = delta["warc_ts"].to_numpy(np.int64)
    ks = [_key128(u, int(t)) for u, t in zip(delta["url"], ts_raw)]
    return pd.DataFrame(
        {
            "url": delta["url"].to_numpy(),
            "warc_ts": ts_raw,
            "ts_ns": delta["ts_ns"].to_numpy(np.int64),
            "doc_id": new_ids,
            "n_ties": delta["n_ties"].to_numpy(np.int64),
            "k_hi": np.array([k[0] for k in ks], dtype=np.uint64),
            "k_lo": np.array([k[1] for k in ks], dtype=np.uint64),
            "superseded": delta["old_id"].fillna(-1).astype(np.int64)
            .to_numpy(),
        }
    )


def build_with_urlmap(pages_ds, out_dir: str, cfg: IndexConfig | None = None,
                      *, num_shards: int = 32, docvalues_ds=None) -> dict:
    """Standard pages build that additionally persists the urlmap sidecar
    (url, warc_ts ns, doc_id of the deduped crawl) + its num_shards —
    everything a later :func:`refresh_index` needs. The id table is
    computed ONCE and shared by the corpus attach and the sidecar."""
    import pyarrow.compute as pc

    from webindex.build import build_index
    from webindex.extract import extract_batch

    id_tab = build_id_table(pages_ds, num_shards).materialize()
    with_ids = attach_ids(pages_ds, id_tab, num_shards)
    corpus = with_ids.map_batches(
        extract_batch, batch_format="pyarrow"
    ).map_batches(
        lambda t: t.filter(pc.not_equal(t.column("text"), "")),
        batch_format="pyarrow",
    )

    def to_urlmap(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": df["url"],
                "warc_ts": _ts_ns(df["warc_ts"]),
                "doc_id": df["doc_id"].astype(np.int64),
            }
        )

    urlmap = id_tab.select_columns(["url", "warc_ts", "doc_id"]).map_batches(
        to_urlmap, batch_format="pandas"
    )
    stats = build_index(corpus, out_dir, cfg, docvalues_ds=docvalues_ds,
                        urlmap_ds=urlmap)
    atomic_write_json(
        os.path.join(out_dir, "urlmap_meta.json"),
        {"num_shards": num_shards},
    )
    return stats


def _refresh_table(old_dir: str, delta_pages_ds, num_shards: int, *,
                   driver_keys_max: int = DRIVER_KEYS_MAX):
    """Delta id table (the _refresh_shard output) as a materialized
    Dataset. Driver fast path below ``driver_keys_max`` total key rows;
    identical rows either way (same per-shard function)."""
    import ray.data as rd

    urlmap_dir = os.path.join(old_dir, "urlmap")

    def tag_old(df: pd.DataFrame) -> pd.DataFrame:
        doc_id = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "url": df["url"],
                "warc_ts": df["warc_ts"].to_numpy(np.int64),
                "ts_ns": df["warc_ts"].to_numpy(np.int64),  # stored as ns
                "doc_id": doc_id,
                "kind": np.zeros(len(df), np.int8),
                "shard": doc_id >> SHARD_BITS,
            }
        )

    def tag_delta(df: pd.DataFrame) -> pd.DataFrame:
        from webindex.docids import _shard_column

        # delta pages are pre-normalized to int64 ns (_norm_ts_ns), so the
        # raw value IS the canonical one — and matches attach_ids' cast
        ts = df["warc_ts"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "url": df["url"],
                "warc_ts": ts,
                "ts_ns": ts,
                "doc_id": np.full(len(df), -1, np.int64),
                "kind": np.ones(len(df), np.int8),
                "shard": _shard_column(df["url"].tolist(), num_shards),
            }
        )

    old_keys = rd.read_parquet(urlmap_dir).map_batches(
        tag_old, batch_format="pandas"
    )
    delta_keys = delta_pages_ds.select_columns(["url", "warc_ts"]).map_batches(
        tag_delta, batch_format="pandas"
    )
    tagged = old_keys.union(delta_keys)
    n = tagged.count()
    if n <= driver_keys_max:
        df = tagged.to_pandas()
        parts = [
            _refresh_shard(g) for _, g in df.groupby("shard", sort=True)
        ]
        out = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(_REFRESH_SCHEMA)
        )
        return rd.from_pandas(out).materialize()
    return (
        tagged.repartition(16)
        .groupby("shard")
        .map_groups(_refresh_shard, batch_format="pandas")
        .materialize()
    )


def refresh_index(old_dir: str, delta_pages_ds, out_dir: str, *,
                  cfg: IndexConfig | None = None,
                  num_shards: int | None = None,
                  driver_keys_max: int = DRIVER_KEYS_MAX,
                  broadcast_max_urls: int = BROADCAST_MAX_URLS) -> dict:
    """Produce ``out_dir`` = old index refreshed with ``delta_pages_ds``
    (url, warc_ts, html, ...). Requires the old index to carry a urlmap
    sidecar (build via :func:`build_with_urlmap`). Returns a summary dict
    (n_delta_docs, n_updated, n_new, stats). The result serves queries
    immediately (superseded docs tombstoned); run
    ``lifecycle.compact_index`` to physically drop them and correct
    df/avgdl."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from webindex.build import build_index
    from webindex.extract import extract_batch
    from webindex.merge import merge_indexes

    if not os.path.isdir(os.path.join(old_dir, "urlmap")):
        raise FileNotFoundError(
            f"{old_dir} has no urlmap sidecar — build with "
            "refresh.build_with_urlmap to enable incremental refresh"
        )
    meta_path = os.path.join(old_dir, "urlmap_meta.json")
    if num_shards is None:
        if not os.path.isfile(meta_path):
            raise ValueError(
                "num_shards not given and urlmap_meta.json missing"
            )
        num_shards = int(read_json(meta_path)["num_shards"])
    elif os.path.isfile(meta_path):
        stored = int(read_json(meta_path)["num_shards"])
        if stored != num_shards:
            # a different shard count would send an updated url's delta
            # row to a different group than its old row — the supersede
            # join would silently miss and the url would appear twice
            raise ValueError(
                f"num_shards={num_shards} != index's {stored}"
            )
    if cfg is None:
        cfg = IndexConfig.from_dict(
            read_json(os.path.join(old_dir, "config.json"))
        )

    delta_pages = delta_pages_ds.map_batches(
        _norm_ts_ns, batch_format="pyarrow"
    )
    rtab = _refresh_table(old_dir, delta_pages, num_shards,
                          driver_keys_max=driver_keys_max)
    n_delta = rtab.count()
    summary = {"n_delta_docs": n_delta}

    if n_delta == 0:
        # nothing new or newer: the refreshed index IS the old index
        if not os.path.isdir(out_dir):
            shutil.copytree(old_dir, out_dir)
        summary.update(
            n_updated=0, n_new=0,
            stats=read_json(os.path.join(out_dir, "stats.json")),
        )
        return summary

    # ---- delta index over the surviving delta pages ----------------------
    delta_dir = out_dir + "-delta"
    id_cols = ["url", "warc_ts", "doc_id", "n_ties", "k_hi", "k_lo"]
    with_ids = attach_ids(
        delta_pages, rtab.select_columns(id_cols), num_shards,
        broadcast_max_urls=broadcast_max_urls,
    )
    corpus = with_ids.map_batches(
        extract_batch, batch_format="pyarrow"
    ).map_batches(
        lambda t: t.filter(pc.not_equal(t.column("text"), "")),
        batch_format="pyarrow",
    )
    build_index(corpus, delta_dir, cfg)

    # ---- merge + tombstones + merged urlmap -------------------------------
    merge_indexes([old_dir, delta_dir], out_dir, cfg)

    sup_ds = rtab.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("superseded"), 0)
        ).select(["superseded"]).rename_columns(["doc_id"]),
        batch_format="pyarrow",
    ).materialize()
    n_updated = sup_ds.count()

    # tombstones for the merged index: newly superseded docs PLUS any
    # tombstones the old index still carried (merge links relays only —
    # dropping them would resurrect deleted docs)
    from webindex.lifecycle import delete_docs, read_deletes

    old_dels = read_deletes(old_dir)
    deletes_dir = os.path.join(out_dir, "deletes")
    marker = os.path.join(out_dir, "deletes_done.json")
    if not os.path.isfile(marker):
        shutil.rmtree(deletes_dir, ignore_errors=True)  # partial prior run
        if n_updated:
            sup_ds.write_parquet(deletes_dir)
        if old_dels.size:
            delete_docs(out_dir, old_dels)
        atomic_write_json(
            marker, {"n_superseded": n_updated, "n_old": int(old_dels.size)}
        )

    urlmap_out = os.path.join(out_dir, "urlmap")
    if not os.path.isdir(urlmap_out):
        # superseded set is delta-bounded: broadcast it to the urlmap
        # filter tasks (swap for an anti-join if deltas ever outgrow the
        # object store's broadcast comfort zone)
        sup_pa = pa.array(
            sup_ds.to_pandas()["doc_id"].to_numpy(np.int64)
            if n_updated else [],
            pa.int64(),
        )
        sup_ref = ray.put(sup_pa)

        def drop_superseded(batch: pa.Table) -> pa.Table:
            sup = ray.get(sup_ref)
            if len(sup) == 0:
                return batch
            return batch.filter(
                pc.invert(pc.is_in(batch.column("doc_id"), value_set=sup))
            )

        def to_urlmap(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "url": df["url"],
                    "warc_ts": df["ts_ns"].to_numpy(np.int64),
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                }
            )

        tmp_urlmap = urlmap_out + ".tmp"
        shutil.rmtree(tmp_urlmap, ignore_errors=True)
        (
            rd.read_parquet(os.path.join(old_dir, "urlmap"))
            .map_batches(drop_superseded, batch_format="pyarrow")
            .union(
                rtab.select_columns(["url", "ts_ns", "doc_id"]).map_batches(
                    to_urlmap, batch_format="pandas"
                )
            )
            .write_parquet(tmp_urlmap)
        )
        os.rename(tmp_urlmap, urlmap_out)
    atomic_write_json(
        os.path.join(out_dir, "urlmap_meta.json"),
        {"num_shards": num_shards},
    )

    summary.update(
        n_updated=n_updated,
        n_new=n_delta - n_updated,
        stats=read_json(os.path.join(out_dir, "stats.json")),
    )
    return summary
