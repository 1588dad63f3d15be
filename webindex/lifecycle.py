"""Document lifecycle on the immutable segment store: deletes + compaction.

The reference's ES index supports live document deletion; Lucene implements
it as a liveDocs bitset consulted at search time, with deleted docs
physically removed (and statistics corrected) only when segments merge.
This module is that lifecycle for the webindex artifact layout:

- :func:`delete_docs` appends a tombstone parquet file under
  ``index_dir/deletes/`` (atomic rename; no existing artifact is touched).
  Searchers consult ``SegmentReader.live_mask()`` per query — deleted docs
  disappear from results immediately while surviving docs keep their exact
  pre-delete BM25 scores (df/avgdl still count tombstoned docs — the
  pinned Lucene pre-merge semantics, tested in tests/test_lifecycle.py).
- :func:`compact_index` rewrites the index WITHOUT the tombstoned docs,
  recomputing doclens, df/cf, N/avgdl and block maxima. It never touches
  the corpus or re-tokenizes: the build's postings relay
  (``postings_raw/``, raw (term, doc_id, tf, dl) rows) is filtered file-
  parallel, then the standard stats/dict/encode stages run over the
  filtered relay — the same checkpointed StageRunner shape as a build, so
  compaction is resumable too. The result is bit-identical in query
  results to an index built from scratch over the surviving corpus
  (tests/test_lifecycle.py).

Scale notes: tombstone files are tiny (sorted int64 runs); the relay
filter is one task per relay file (embarrassingly parallel, no shuffle);
stats/dict reuse the sidecar/partial machinery (nothing corpus-sized
crosses the cluster); encode is the standard one-task-per-pkey stage.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa

from webindex.config import IndexConfig
from webindex.util import StageRunner, atomic_write_json, read_json


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone ``doc_ids`` (iterable of int) in ``index_dir``. Appends
    one sorted tombstone file; returns the number of ids recorded (ids
    not present in the index are harmless no-ops at query time). Safe to
    call repeatedly — the reader unions all tombstone files."""
    import pyarrow.parquet as pq

    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if ids.size == 0:
        return 0
    root = os.path.join(index_dir, "deletes")
    os.makedirs(root, exist_ok=True)
    name = f"del-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(root, "_tmp-" + name)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, os.path.join(root, name))  # atomic publish; bumps dir mtime
    return int(ids.size)


def read_deletes(index_dir: str) -> np.ndarray:
    """Union of all tombstoned doc_ids (sorted unique int64; empty array
    when the index has no deletes sidecar)."""
    import pyarrow.dataset as pads

    root = os.path.join(index_dir, "deletes")
    if not os.path.isdir(root):
        return np.empty(0, np.int64)
    tab = pads.dataset(root).to_table(columns=["doc_id"], use_threads=False)
    return np.unique(tab.column("doc_id").to_numpy())


def _relay_files(praw: str) -> list[str]:
    """Data-file paths of a postings relay, via the writer sidecars (the
    authoritative manifest — stray non-manifested files are ignored the
    same way _praw_layout ignores them)."""
    import json as _json

    out = []
    for root, _, names in os.walk(praw):
        for name in sorted(names):
            if not name.endswith(".stats.json"):
                continue
            with open(os.path.join(root, name)) as f:
                rec = _json.load(f)
            out.append(os.path.join(root, rec["file"]))
    return out


def compact_index(index_dir: str, out_dir: str,
                  cfg: IndexConfig | None = None) -> dict:
    """Rewrite ``index_dir`` into ``out_dir`` with all tombstoned docs
    physically removed and every statistic (N, avgdl, df/cf, block-max
    bounds) recomputed. Checkpointed + resumable like a build. Returns
    the new stats dict."""
    import ray
    import ray.data as rd

    from webindex.build import (
        _write_postings_block,
        encode_part,
        sum_relay_sidecars,
        write_dict_from_partials,
    )

    if cfg is None:
        cfg = IndexConfig.from_dict(
            read_json(os.path.join(index_dir, "config.json"))
        )
    dels = read_deletes(index_dir)
    runner = StageRunner(out_dir)
    atomic_write_json(os.path.join(out_dir, "config.json"), cfg.to_dict())
    stats_path = os.path.join(out_dir, "stats.json")
    src_praw = os.path.join(index_dir, "postings_raw")

    # ---- stage 1: filtered relay (one task per relay file, no shuffle) --
    def stage_relay(tmp):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        files = _relay_files(src_praw)
        dels_ref = ray.put(pa.array(dels, pa.int64()))

        def filter_file(batch: pa.Table) -> pa.Table:
            del_arr = ray.get(dels_ref)
            manifests = []
            for path in batch.column("path").to_pylist():
                tab = pq.read_table(path, use_threads=False)
                if len(del_arr):
                    tab = tab.filter(
                        pc.invert(pc.is_in(tab.column("doc_id"),
                                           value_set=del_arr))
                    )
                manifests.append(_write_postings_block(tab, out_dir=tmp))
            return (
                pa.concat_tables(manifests)
                if manifests
                else pa.table({"file": pa.array([], pa.string()),
                               "rows": pa.array([], pa.int64())})
            )

        (
            rd.from_items([{"path": f} for f in files],
                          override_num_blocks=max(1, len(files)))
            .map_batches(filter_file, batch_format="pyarrow", batch_size=1)
            .materialize()
        )
        return {"n_tombstones": int(dels.size)}

    runner.run("postings_raw", stage_relay)
    praw = runner.out_dir("postings_raw")

    # ---- stage 2: recomputed global stats --------------------------------
    def stage_stats(_tmp):
        stats = sum_relay_sidecars(praw)
        stats["compacted_from"] = index_dir
        stats["n_deleted"] = int(dels.size)
        atomic_write_json(stats_path, stats)
        return {"stats": stats}

    runner.run("stats", stage_stats, has_output_dir=False)
    stats = read_json(stats_path)

    # ---- stage 3: recomputed dictionary ----------------------------------
    runner.run(
        "dict",
        lambda tmp: write_dict_from_partials(praw, tmp, cfg, out_dir,
                                             stats_path),
    )
    stats = read_json(stats_path)

    # ---- stage 4: re-encoded segments (new avgdl -> new block maxima) ----
    def stage_segments(tmp):
        parts = rd.from_items(
            [{"p": p} for p in range(cfg.n_parts)],
            override_num_blocks=cfg.n_parts,
        )
        parts.map_batches(
            encode_part,
            fn_kwargs=dict(
                praw=praw, cfg_dict=cfg.to_dict(), avgdl=stats["avgdl"]
            ),
            batch_format="pyarrow",
            batch_size=1,
        ).write_parquet(tmp)
        return {}

    runner.run("segments", stage_segments)

    # ---- stages 5/6 (conditional): filtered sidecars ----------------------
    # docvalues and urlmap rows of tombstoned docs are dropped with them
    for sidecar in ("docvalues", "urlmap"):
        if not os.path.isdir(os.path.join(index_dir, sidecar)):
            continue

        def stage_sidecar(tmp, sidecar=sidecar):
            import pyarrow.compute as pc

            dels_ref = ray.put(pa.array(dels, pa.int64()))

            def drop_deleted(batch: pa.Table) -> pa.Table:
                del_arr = ray.get(dels_ref)
                if not len(del_arr):
                    return batch
                return batch.filter(
                    pc.invert(pc.is_in(batch.column("doc_id"),
                                       value_set=del_arr))
                )

            (
                rd.read_parquet(os.path.join(index_dir, sidecar))
                .map_batches(drop_deleted, batch_format="pyarrow")
                .write_parquet(tmp)
            )
            return {}

        runner.run(sidecar, stage_sidecar)

    return read_json(stats_path)


def delete_by_query(index_dir: str, text: str, *, match: str = "or") -> int:
    """ES ``_delete_by_query``: tombstone EVERY document matching the
    analyzed query. The match set comes from the scan export
    (webindex.search.scan_matches — shard-parallel, no scoring, no
    merge); each matched block appends its own tombstone file (the
    reader unions all files), so no id list ever concentrates on the
    driver. Returns the number of docs tombstoned. Same liveDocs
    semantics as :func:`delete_docs`: matches vanish immediately,
    survivor scores are untouched until compaction."""
    import ray.data as rd

    from webindex.search import scan_matches

    matches = scan_matches(
        rd.from_items([{"qid": "dbq", "text": text}]), index_dir,
        match=match,
    )

    def tombstone(batch: pa.Table) -> pa.Table:
        n = delete_docs(index_dir, batch.column("doc_id").to_pylist())
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = matches.map_batches(tombstone, batch_format="pyarrow")
    return int(sum(r["n"] for r in parts.take_all()))
