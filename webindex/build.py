"""Checkpointed, resumable index-build pipeline (Ray-Data-first).

Replaces the reference's opaque Elasticsearch index build (beir==0.2.3
``BM25Search.index``, invoked at
/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10 —
SURVEY.md §2.1 S8) with explicit Ray Data stages over Arrow batches:

  corpus(doc_id, text)
    -> [postings_raw] map_batches(tokenize) -> parquet, rows carrying
                      pkey = hash(term, salt) % n_parts, each file sorted
                      by pkey  (term, doc_id, tf, dl, salt, kind, pkey)
    -> [stats]        global aggregates N/avgdl/max_doc_id -> stats.json
    -> [dict]         per-batch partial df/cf -> groupby(term).sum -> parquet
    -> [segments]     one task per pkey value reads its slice (pkey filter
                      with row-group pruning): local sort + per-(term,
                      salt) delta+varbyte encode + block-max metadata
                      -> parquet partitioned by term-hash bucket

Scale properties:
- the posting "shuffle" is checkpoint-relay through parquet: stage 1 writes
  pkey-sorted files, and each encode task reads only its pkey's rows — no
  Ray-level sort/groupby ever touches the posting rows (the only Dataset
  groupby is over tiny per-batch df/cf partials). pkey-sorted files keep
  row-group min/max statistics tight so the filtered reads prune; a
  hive-partitioned variant (one dir per pkey) was measured strictly worse
  on one node (write tasks x n_parts files -> per-file metadata overhead
  dominated every later scan);
- term skew is handled structurally: every posting carries a docID-range
  salt (the docID's shard prefix), so a stopword's ~N postings spread
  across partitions *by construction*, each encoded as an independent run;
  runs concatenate in docID order at read time (range salting);
- block-max metadata stores idf-free tf-normalization maxima
  (``max_tf_norm``); the reader multiplies by idf(df) at load. Encoding
  therefore needs no global df — one pass, no df broadcast;
- every stage is checkpointed to parquet with an atomic rename + manifest
  + lineage record, so a restarted build skips completed stages
  (north rule: "resumable from checkpoint with per-partition lineage").
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from webindex.analyze import Analyzer
from webindex.compress import varbyte_encode
from webindex.config import IndexConfig
from webindex.util import StageRunner, atomic_write_json, read_json, stable_hash64, term_bucket

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
        ("salt", pa.int32()),
        ("kind", pa.int8()),  # 0 = posting, 1 = doclen marker row
        ("pkey", pa.int32()),
    ]
)

_MIX = 0x9E3779B97F4A7C15


_ANALYZER_CACHE: dict[str, Analyzer] = {}
_TERM_HASH_CACHE: dict[str, int] = {}
_DSET_CACHE: dict[str, object] = {}


def analyzer_for(cfg) -> Analyzer:
    """Process-global analyzer (compiled regexes + stem memo). Ray reuses
    worker processes across tasks, so stateless-task stages get actor-style
    state amortization without paying actor-pool startup (reference analog
    of once-per-worker setup: CustomEmbedder ctor,
    /root/reference/biencoder/beir/beir_dense_retriever.py:106-156)."""
    key = cfg.cache_key()
    an = _ANALYZER_CACHE.get(key)
    if an is None:
        an = _ANALYZER_CACHE[key] = Analyzer(cfg)
    return an


def _term_hash(t: str) -> int:
    h = _TERM_HASH_CACHE.get(t)
    if h is None:
        h = _TERM_HASH_CACHE[t] = stable_hash64(t)
    return h


def tokenize_batch(batch: pa.Table, analyzer_cfg, n_parts: int = 64,
                   salt_doc_shift: int = 40,
                   shards_per_salt: int = 2,
                   store_positions: bool = False) -> pa.Table:
    """Stateless-task tokenize stage: documents -> per-doc term counts.

    Emits postings pre-aggregated per document — the combiner that keeps
    downstream work proportional to (term, doc) pairs, not raw tokens —
    plus one ``kind=1`` row per doc carrying its length. Every posting
    carries its docID-range ``salt`` and encode partition ``pkey``.
    With ``store_positions`` each posting additionally carries a ``pos``
    blob: the term's token positions in the doc, delta+varbyte encoded
    (first absolute) — tf values per posting, no extra metadata.
    """
    return TokenizeStage(
        analyzer_cfg, n_parts=n_parts, salt_doc_shift=salt_doc_shift,
        shards_per_salt=shards_per_salt, store_positions=store_positions,
        _cached=True,
    )(batch)


class TokenizeStage:
    """Callable form of the tokenize stage (usable as an actor class too)."""

    def __init__(self, analyzer_cfg, n_parts: int = 64,
                 salt_doc_shift: int = 40, shards_per_salt: int = 2,
                 store_positions: bool = False, _cached: bool = False):
        self.an = analyzer_for(analyzer_cfg) if _cached else Analyzer(analyzer_cfg)
        self.n_parts = n_parts
        self.salt_doc_shift = salt_doc_shift
        self.shards_per_salt = shards_per_salt
        self.store_positions = store_positions

    def _doc_positions(self, toks: list[str]):
        """Per-term position blobs for one doc, in first-occurrence term
        order (Counter insertion order — identical to ``term_freqs``).
        One vectorized varbyte encode over the doc; per-term blobs are
        byte-offset slices (the encode_run trick)."""
        codes, uniques = pd.factorize(np.asarray(toks, dtype=object))
        counts = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        pos_sorted = order.astype(np.int64)  # positions grouped by term
        ends = np.cumsum(counts)
        starts = ends - counts
        gaps = np.empty(pos_sorted.size, dtype=np.int64)
        gaps[0] = pos_sorted[0]
        np.subtract(pos_sorted[1:], pos_sorted[:-1], out=gaps[1:])
        gaps[starts] = pos_sorted[starts]  # first position absolute
        buf = varbyte_encode(gaps)
        bends = np.concatenate(([0], np.cumsum(_varbyte_sizes(gaps))))
        blobs = [bytes(buf[bends[s]:bends[e]]) for s, e in zip(starts, ends)]
        return list(uniques), counts.tolist(), blobs

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        np_, shift, sps = self.n_parts, self.salt_doc_shift, self.shards_per_salt
        ndocs = len(texts)
        terms: list[str] = []
        tfs: list[int] = []
        pos_blobs: list[bytes] = []
        n_terms_doc = np.empty(ndocs, np.int64)
        dl_doc = np.empty(ndocs, np.int64)
        tf = self.an.term_freqs
        if self.store_positions:
            tok = self.an.tokens
            for i, txt in enumerate(texts):
                toks = tok(txt or "")
                dl_doc[i] = len(toks)
                if toks:
                    ts, cs, bs_ = self._doc_positions(toks)
                else:
                    ts, cs, bs_ = [], [], []
                n_terms_doc[i] = len(ts)
                terms.extend(ts)
                tfs.extend(cs)
                pos_blobs.extend(bs_)
        else:
            for i, txt in enumerate(texts):
                cnt = tf(txt or "")
                dl_doc[i] = sum(cnt.values())
                n_terms_doc[i] = len(cnt)
                terms.extend(cnt.keys())
                tfs.extend(cnt.values())
        # posting columns via np.repeat over per-doc run lengths (the
        # per-(term, doc) Python append loop was ~40% of tokenize time)
        salt_doc = (doc_ids >> shift) // sps
        dids_p = np.repeat(doc_ids, n_terms_doc)
        dls_p = np.repeat(dl_doc, n_terms_doc)
        salts_p = np.repeat(salt_doc, n_terms_doc)
        th = _term_hash
        hashes = np.fromiter(
            (th(t) for t in terms), np.uint64, count=len(terms)
        )
        pkeys_p = (
            (hashes ^ (salts_p.astype(np.uint64) * np.uint64(_MIX))) % np_
        ).astype(np.int32)
        # doclen marker rows -- every doc, even all-stopword ones (dl may
        # be 0); keeps N and avgdl exact. They live in the disjoint pkey
        # range [n_parts, 2n_parts) so posting reads never touch them.
        # Output sorted by pkey so row-group stats cluster by partition.
        cols = {}
        if self.store_positions:
            cols["pos"] = pa.array(
                pos_blobs + [b""] * ndocs, pa.binary()
            )
        return pa.table(
            {
                "term": pa.array(terms + [""] * ndocs, pa.string()),
                "doc_id": pa.array(
                    np.concatenate([dids_p, doc_ids]), pa.int64()
                ),
                "tf": pa.array(
                    np.concatenate(
                        [np.asarray(tfs, np.int64), np.zeros(ndocs, np.int64)]
                    ),
                    pa.int32(),
                ),
                "dl": pa.array(np.concatenate([dls_p, dl_doc]), pa.int32()),
                "salt": pa.array(
                    np.concatenate([salts_p, salt_doc]), pa.int32()
                ),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(terms), np.int8), np.ones(ndocs, np.int8)]
                    ),
                    pa.int8(),
                ),
                "pkey": pa.array(
                    np.concatenate(
                        [pkeys_p, (np_ + doc_ids % np_).astype(np.int32)]
                    ),
                    pa.int32(),
                ),
                **cols,
            }
        ).sort_by("pkey")


def _partial_df(batch: pa.Table) -> pa.Table:
    """Per-batch partial df/cf — pre-aggregation before the groupby(term)."""
    g = batch.group_by("term").aggregate([("tf", "sum"), ("tf", "count")])
    return g.rename_columns(["term", "cf_p", "df_p"])


def _write_postings_block(batch: pa.Table, out_dir: str) -> pa.Table:
    """Write one pkey-sorted block as one parquet file with one row group
    per pkey run (plus splits at ~256k rows for giant runs). Returns a
    one-row manifest. Blocks arrive pkey-sorted (tokenize sorts each
    batch; Ray concatenates sorted batches — re-sort cheaply to restore
    global order within the block)."""
    import uuid

    import pyarrow.parquet as pq

    if batch.num_rows == 0:
        return pa.table({"file": pa.array([], pa.string()),
                         "rows": pa.array([], pa.int64())})
    batch = batch.sort_by("pkey")
    pk = batch.column("pkey").to_numpy()
    change = np.flatnonzero(np.diff(pk)) + 1
    bounds = np.concatenate(([0], change, [pk.size]))
    path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.parquet")
    rg_map: dict[int, list[int]] = {}
    rg = 0
    with pq.ParquetWriter(path, batch.schema, compression="zstd") as w:
        for s, e in zip(bounds[:-1], bounds[1:]):
            p = int(pk[s])
            for off in range(int(s), int(e), 262_144):
                w.write_table(
                    batch.slice(off, min(262_144, int(e) - off)),
                    row_group_size=262_144,
                )
                rg_map.setdefault(p, []).append(rg)
                rg += 1
    # dictionary partials: one tiny parquet per block (term, df_p, cf_p) —
    # the dict stage aggregates these instead of re-scanning the postings
    kind0 = batch.filter(pc.equal(batch.column("kind"), 0))
    partial = _partial_df(kind0.select(["term", "tf"]))
    pq.write_table(
        partial,
        os.path.join(out_dir, "_dictpart-" + os.path.basename(path)),
    )
    # sidecar stats partial: the doclen aggregates fall out of the rows
    # already in hand, so the stats stage never re-scans the postings
    kind = batch.column("kind").to_numpy()
    dls = batch.column("dl").to_numpy()
    dids = batch.column("doc_id").to_numpy()
    m = kind == 1
    import json as _json

    # "_"-prefixed: parquet dataset discovery skips it as a metadata file
    sidecar = os.path.join(
        out_dir, "_" + os.path.basename(path) + ".stats.json"
    )
    with open(sidecar, "w") as f:
        _json.dump(
            {
                "file": os.path.basename(path),
                "n_docs": int(m.sum()),
                "dl_sum": int(dls[m].sum()) if m.any() else 0,
                "max_doc_id": int(dids[m].max()) if m.any() else -1,
                "row_groups": {str(k): v for k, v in rg_map.items()},
            },
            f,
        )
    return pa.table({"file": pa.array([path]),
                     "rows": pa.array([batch.num_rows], pa.int64())})


# ---------------------------------------------------------------------------
# posting-run encoding (pure function, no global state)
# ---------------------------------------------------------------------------


def _varbyte_sizes(v: np.ndarray) -> np.ndarray:
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, 9):
        nb += v >= (1 << (7 * k))
    return nb


def encode_run(term: str, salt: int, ids: np.ndarray, tfs: np.ndarray,
               dls: np.ndarray, cfg: IndexConfig, avgdl: float,
               pos_blobs: list | None = None) -> dict:
    """One (term, salt) posting run (``ids`` ascending) -> columnar block
    rows: delta+varbyte buffers with per-block idf-free score bounds
    (``max_tf_norm = max tf/(tf + k1(1-b+b·dl/avgdl))``).

    Whole-run encode is a single vectorized varbyte call; block boundaries
    are recovered by byte-offset slicing (no per-posting Python loop).
    """
    n = ids.size
    tf_norm = tfs / (
        tfs + cfg.k1 * (1.0 - cfg.b + cfg.b * (dls / avgdl))
    )

    bs = cfg.block_size
    starts = np.arange(0, n, bs)
    if cfg.codec == "ef":
        # Elias-Fano blocks are self-contained over ABSOLUTE ids (EF is
        # monotone-only and not byte-sliceable) — per-block encode, each
        # call vectorized (webindex.compress.ef_encode)
        from webindex.compress import ef_encode

        id_blobs = [
            ef_encode(ids[starts[j]: min(starts[j] + bs, n)])
            for j in range(starts.size)
        ]
    elif cfg.codec == "varbyte":
        # gaps, with absolute docID at every block start
        gaps = np.empty(n, dtype=np.int64)
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
        gaps[starts] = ids[starts]
        id_bytes = _varbyte_sizes(gaps)
        id_buf = varbyte_encode(gaps)
        id_ends = np.concatenate(([0], np.cumsum(id_bytes)))
        id_blobs = [
            id_buf[id_ends[starts[j]]: id_ends[min(starts[j] + bs, n)]]
            for j in range(starts.size)
        ]
    else:
        raise ValueError(f"unknown codec {cfg.codec!r}")
    tfs_i = tfs.astype(np.int64)
    tf_bytes = _varbyte_sizes(tfs_i)
    tf_buf = varbyte_encode(tfs_i)
    tf_ends = np.concatenate(([0], np.cumsum(tf_bytes)))
    block_max = np.maximum.reduceat(tf_norm, starts)
    last_ids = ids[np.minimum(starts + bs, n) - 1]

    nblocks = starts.size
    extra = {}
    if pos_blobs is not None:
        # one positions blob per block: per-posting delta+varbyte runs
        # concatenated — tf values each, so decoding needs no offsets
        # beyond the tfs already stored
        extra["positions"] = [
            b"".join(pos_blobs[starts[j]: min(starts[j] + bs, n)])
            for j in range(nblocks)
        ]
    return {
        **extra,
        "bucket": np.full(nblocks, term_bucket(term, cfg.num_buckets), np.int32),
        "term": [term] * nblocks,
        "salt": np.full(nblocks, salt, np.int64),
        "block_id": np.arange(nblocks, dtype=np.int32),
        "n": np.minimum(starts + bs, n).astype(np.int32) - starts.astype(np.int32),
        "last_doc_id": last_ids,
        "doc_ids": id_blobs,
        "tfs": [
            tf_buf[tf_ends[starts[j]]: tf_ends[min(starts[j] + bs, n)]]
            for j in range(nblocks)
        ],
        "max_tf_norm": block_max,
    }


_EMPTY_SEG = pa.table(
    {
        "bucket": pa.array([], pa.int32()),
        "term": pa.array([], pa.string()),
        "salt": pa.array([], pa.int64()),
        "block_id": pa.array([], pa.int32()),
        "n": pa.array([], pa.int32()),
        "last_doc_id": pa.array([], pa.int64()),
        "doc_ids": pa.array([], pa.binary()),
        "tfs": pa.array([], pa.binary()),
        "max_tf_norm": pa.array([], pa.float64()),
    }
)


def _praw_layout(praw: str):
    """Worker-cached (pkey -> [(file, row_group)]) map from the writer
    sidecars, plus per-file ParquetFile handles (footers parsed once per
    worker, not once per task)."""
    import json as _json

    import pyarrow.parquet as pq

    # Cache key includes the directory's identity (inode + mtime): the
    # postings_raw dir is freshly os.replace()d by every build, so a
    # rebuild at the same path invalidates stale layouts/handles held by
    # persistent Ray workers.
    st = os.stat(praw)
    key = (praw, st.st_ino, st.st_mtime_ns)
    cached = _DSET_CACHE.get(key)
    if cached is not None:
        return cached
    by_pkey: dict[int, list[tuple[str, int]]] = {}
    for root, _, names in os.walk(praw):
        for name in sorted(names):
            if not name.endswith(".stats.json"):
                continue
            with open(os.path.join(root, name)) as f:
                rec = _json.load(f)
            fpath = os.path.join(root, rec["file"])
            for pk, rgs in rec.get("row_groups", {}).items():
                lst = by_pkey.setdefault(int(pk), [])
                for rg in rgs:
                    lst.append((fpath, rg))
    handles: dict[str, pq.ParquetFile] = {}
    out = (by_pkey, handles)
    for k in [k for k in _DSET_CACHE if k[0] == praw]:  # stale prior builds
        del _DSET_CACHE[k]
    _DSET_CACHE[key] = out
    return out


def encode_part(batch: pa.Table, praw: str, cfg_dict: dict,
                avgdl: float) -> pa.Table:
    """Stage-4 task body: encode every (term, salt) run of one pkey
    partition. Reads exactly its row groups via the writer's sidecar map
    (no dataset scan, no filter evaluation; arrow threading off — Ray owns
    parallelism across the n_parts tasks). Terms are dictionary-encoded so
    the run sort is a pure-int lexsort (an object-dtype string lexsort
    measured ~10x slower and memory-bandwidth-bound under concurrency);
    output is assembled as one Arrow table, no pandas."""
    import pyarrow.parquet as pq

    cfg = IndexConfig.from_dict(cfg_dict)
    pieces: list[dict] = []
    by_pkey, handles = _praw_layout(praw)
    cols = ["term", "salt", "doc_id", "tf", "dl"]
    if cfg.store_positions:
        cols.append("pos")
    for p in batch.column("p").to_pylist():
        chunks = []
        for fpath, rg in by_pkey.get(int(p), []):
            h = handles.get(fpath)
            if h is None:
                h = handles[fpath] = pq.ParquetFile(fpath)
            chunks.append(h.read_row_group(rg, columns=cols, use_threads=False))
        if not chunks:
            continue
        tab = pa.concat_tables(chunks)
        if tab.num_rows == 0:
            continue
        d = pc.dictionary_encode(tab.column("term").combine_chunks())
        codes = d.indices.to_numpy().astype(np.int64)
        vocab = d.dictionary.to_pylist()
        salts_c = tab.column("salt").to_numpy().astype(np.int64)
        ids_c = tab.column("doc_id").to_numpy()
        order = np.lexsort((ids_c, salts_c, codes))
        codes = codes[order]
        salts = salts_c[order]
        ids = ids_c[order]
        tfs = tab.column("tf").to_numpy()[order].astype(np.float64)
        dls = tab.column("dl").to_numpy()[order].astype(np.float64)
        pos_sorted = (
            tab.column("pos").combine_chunks().take(
                pa.array(order, pa.int64())
            )
            if cfg.store_positions
            else None
        )
        # run boundaries: change of (term-code, salt)
        change = np.empty(codes.size, dtype=bool)
        change[0] = True
        change[1:] = (codes[1:] != codes[:-1]) | (salts[1:] != salts[:-1])
        bounds = np.flatnonzero(change).tolist() + [codes.size]
        for s, e in zip(bounds[:-1], bounds[1:]):
            pieces.append(
                encode_run(
                    vocab[codes[s]], int(salts[s]), ids[s:e], tfs[s:e],
                    dls[s:e], cfg, avgdl,
                    pos_blobs=(
                        pos_sorted.slice(s, e - s).to_pylist()
                        if pos_sorted is not None
                        else None
                    ),
                )
            )
    if not pieces:
        if cfg.store_positions:
            return _EMPTY_SEG.append_column(
                "positions", pa.array([], pa.binary())
            )
        return _EMPTY_SEG
    buckets = np.concatenate([r["bucket"] for r in pieces])
    # bucket-ordered output so the reader's bucket-filtered loads prune
    # row groups; runs within a bucket stay in (term, salt) order
    run_order = np.argsort(
        np.repeat(np.array([r["bucket"][0] for r in pieces]),
                  [len(r["bucket"]) for r in pieces]),
        kind="stable",
    )
    terms_flat = [t for r in pieces for t in r["term"]]
    ids_flat = [b for r in pieces for b in r["doc_ids"]]
    tfs_flat = [b for r in pieces for b in r["tfs"]]
    extra_cols = {}
    if cfg.store_positions:
        pos_flat = [b for r in pieces for b in r["positions"]]
        extra_cols["positions"] = pa.array(
            [pos_flat[i] for i in run_order], pa.binary()
        )
    return pa.table(
        {
            "bucket": pa.array(buckets[run_order], pa.int32()),
            "term": pa.array([terms_flat[i] for i in run_order], pa.string()),
            "salt": pa.array(
                np.concatenate([r["salt"] for r in pieces])[run_order],
                pa.int64(),
            ),
            "block_id": pa.array(
                np.concatenate([r["block_id"] for r in pieces])[run_order],
                pa.int32(),
            ),
            "n": pa.array(
                np.concatenate([r["n"] for r in pieces])[run_order], pa.int32()
            ),
            "last_doc_id": pa.array(
                np.concatenate([r["last_doc_id"] for r in pieces])[run_order],
                pa.int64(),
            ),
            "doc_ids": pa.array(
                [ids_flat[i] for i in run_order], pa.binary()
            ),
            "tfs": pa.array([tfs_flat[i] for i in run_order], pa.binary()),
            "max_tf_norm": pa.array(
                np.concatenate([r["max_tf_norm"] for r in pieces])[run_order],
                pa.float64(),
            ),
            **extra_cols,
        }
    )


def sum_relay_sidecars(praw: str) -> dict:
    """Global N/total_tokens/max_doc_id/avgdl from the per-file .stats.json
    sidecars of a postings relay (shared by build, merge, and compaction —
    the stats stage never re-scans posting rows)."""
    import json as _json

    n = tot = 0
    max_doc = -1
    for root, _, names in os.walk(praw):
        for name in names:
            if not name.endswith(".stats.json"):
                continue
            with open(os.path.join(root, name)) as f:
                rec = _json.load(f)
            n += rec["n_docs"]
            tot += rec["dl_sum"]
            max_doc = max(max_doc, rec["max_doc_id"])
    return {
        "N": n,
        "total_tokens": tot,
        "max_doc_id": max_doc,
        "avgdl": float(tot) / max(1, n),
    }


def write_dict_from_partials(praw: str, tmp: str, cfg: IndexConfig,
                             out_dir: str, stats_path: str) -> dict:
    """Dictionary stage body (shared by build and compaction): aggregate
    the per-block _dictpart partials — only ~vocab-sized rows shuffle —
    add the term bucket, write parquet, and record heavy-term/skew
    observability metrics into stats.json."""
    import glob as _glob

    import ray.data as rd

    from webindex.relational import hash_partitioned_groupby_arrow

    # term is vocab-cardinality (billions of distinct rows at design
    # scale): Ray's native groupby().aggregate() measures ~50x a
    # hash-partitioned merge at key cardinality near the row count, so
    # route through the pinned term-hash partitioning like every other
    # high-cardinality merge here (dup_ngrams precedent). Counts are
    # int64 partial sums — exact under any merge order.
    def _psum(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate(
            [("df_p", "sum"), ("cf_p", "sum")]
        )
        return pa.table(
            {"term": g.column("term"),
             "df_p": g.column("df_p_sum"),
             "cf_p": g.column("cf_p_sum")}
        )

    def _fsum(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate(
            [("df_p", "sum"), ("cf_p", "sum")]
        )
        # per-partition term sort: deterministic row order independent
        # of shuffle arrival order (vocab/n_parts rows — cheap)
        g = pa.table(
            {"term": g.column("term"),
             "df": g.column("df_p_sum"),
             "cf": g.column("cf_p_sum")}
        )
        return g.sort_by("term")

    partial = rd.read_parquet(
        sorted(_glob.glob(os.path.join(praw, "_dictpart-*.parquet")))
    )
    dict_ds = hash_partitioned_groupby_arrow(
        partial, ["term"], _psum, _fsum, n_parts=cfg.n_parts
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pa.array(
            [term_bucket(x, cfg.num_buckets)
             for x in t.column("term").to_pylist()],
            pa.int32(),
        )
        return t.append_column("bucket", b)

    dict_ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(tmp)
    # heavy-term list (stopword-scale df): skew observability metric
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    dset = pads.dataset(tmp)
    heavy = dset.to_table(
        columns=["term", "df"],
        filter=pads.field("df") >= cfg.df_salt_threshold,
    )
    atomic_write_json(
        os.path.join(out_dir, "heavy_terms.json"),
        dict(zip(heavy.column("term").to_pylist(),
                 heavy.column("df").to_pylist())),
    )
    n_terms = sum(
        pq.ParquetFile(os.path.join(r, f)).metadata.num_rows
        for r, _, fs in os.walk(tmp) for f in fs if f.endswith(".parquet")
    )
    st = read_json(stats_path)
    st["n_terms"] = n_terms
    st["n_heavy_terms"] = heavy.num_rows
    atomic_write_json(stats_path, st)
    return {}


def build_index(corpus_ds, out_dir: str, cfg: IndexConfig | None = None,
                *, tokenize_batch_size: int = 512,
                tokenize_concurrency=None, docvalues_ds=None,
                urlmap_ds=None) -> dict:
    """Run the full checkpointed build. ``corpus_ds`` is a
    ``ray.data.Dataset`` with columns ``(doc_id:int64, text:string)``,
    already deduped/filtered (see webindex.pipelines.prepare_corpus).

    ``docvalues_ds`` (optional) is a ``(doc_id:int64, attr...)`` Dataset of
    per-doc attribute columns, written as the ``docvalues/`` sidecar (the
    Lucene-docvalues analog) that powers filtered search
    (``search_queries(filter_pred=...)``). It streams straight to parquet
    — never materialized — and adds a resumable stage, so an existing
    index gains docvalues on the next ``build_index`` call without
    re-tokenizing.

    Returns the final stats dict. Safe to re-run: completed stages are
    skipped via the manifest (atomic rename checkpoints).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    # tokenize_concurrency is accepted for API stability but unused: the
    # tokenize stage runs as stateless tasks (process-global analyzer
    # cache), which scale elastically and skip actor-pool startup.
    del tokenize_concurrency
    cfg = cfg or IndexConfig()
    if cfg.store_positions and cfg.analyzer.synonyms:
        raise ValueError(
            "store_positions does not compose with index-time synonyms: "
            "appended synonym tokens would take tail positions, not "
            "Lucene's same-position semantics (AnalyzerConfig.synonyms)"
        )
    if cfg.analyzer.shingle_only and cfg.analyzer.synonyms:
        raise ValueError(
            "shingle_only does not compose with index-time synonyms: "
            "synonym expansions are appended at the tail of the token "
            "stream, so shingling would emit a spurious bigram spanning "
            "the last real token and the first appended synonym "
            "(AnalyzerConfig.synonyms)"
        )
    runner = StageRunner(out_dir)
    atomic_write_json(os.path.join(out_dir, "config.json"), cfg.to_dict())
    stats_path = os.path.join(out_dir, "stats.json")

    # ---- stage 1: tokenize -> postings_raw ------------------------------
    def stage_postings(tmp):
        ds = corpus_ds.map_batches(
            tokenize_batch,
            fn_kwargs=dict(
                analyzer_cfg=cfg.analyzer, n_parts=cfg.n_parts,
                salt_doc_shift=cfg.salt_doc_shift,
                shards_per_salt=cfg.shards_per_salt,
                store_positions=cfg.store_positions,
            ),
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
        )
        # custom writer, fused into the tokenize tasks (no object-store
        # hop for the fat posting rows): one parquet ROW GROUP per pkey run
        # within each pkey-sorted block, and a sidecar mapping
        # pkey -> row-group ids so encode tasks read exactly their row
        # groups through cached file handles.
        ds.map_batches(
            _write_postings_block, fn_kwargs=dict(out_dir=tmp),
            batch_format="pyarrow", batch_size=None,
        ).materialize()
        return {}

    runner.run("postings_raw", stage_postings)
    praw = runner.out_dir("postings_raw")

    # ---- stage 2: global stats ------------------------------------------
    # folded into stage 1: each postings file carries a .stats.json sidecar
    # with its doclen partials; this stage just sums the (n_files) sidecars
    def stage_stats(_tmp):
        stats = sum_relay_sidecars(praw)
        atomic_write_json(stats_path, stats)
        return {"stats": stats}

    runner.run("stats", stage_stats, has_output_dir=False)
    stats = read_json(stats_path)

    # ---- stage 3: dictionary (df/cf per term) ---------------------------
    runner.run(
        "dict",
        lambda tmp: write_dict_from_partials(praw, tmp, cfg, out_dir,
                                             stats_path),
    )
    stats = read_json(stats_path)

    # ---- stage 4: encoded segments (one task per pkey partition) --------
    def stage_segments(tmp):
        parts = rd.from_items(
            [{"p": p} for p in range(cfg.n_parts)],
            override_num_blocks=cfg.n_parts,
        )
        enc = parts.map_batches(
            encode_part,
            fn_kwargs=dict(
                praw=praw, cfg_dict=cfg.to_dict(), avgdl=stats["avgdl"]
            ),
            batch_format="pyarrow",
            batch_size=1,
        )
        enc.write_parquet(tmp)
        return {}

    runner.run("segments", stage_segments)

    # ---- stage 5 (optional): docvalues sidecar ---------------------------
    if docvalues_ds is not None:
        def stage_docvalues(tmp):
            docvalues_ds.write_parquet(tmp)
            return {}

        runner.run("docvalues", stage_docvalues)

    # ---- stage 6 (optional): urlmap sidecar -------------------------------
    # (url, warc_ts, doc_id) of the deduped crawl — what the incremental
    # refresh pipeline (webindex.refresh) joins a re-crawl delta against.
    if urlmap_ds is not None:
        def stage_urlmap(tmp):
            urlmap_ds.write_parquet(tmp)
            return {}

        runner.run("urlmap", stage_urlmap)

    return read_json(stats_path)
