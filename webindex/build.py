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
                   shards_per_salt: int = 2) -> pa.Table:
    """Stateless-task tokenize stage: documents -> per-doc term counts.

    Emits postings pre-aggregated per document — the combiner that keeps
    downstream work proportional to (term, doc) pairs, not raw tokens —
    plus one ``kind=1`` row per doc carrying its length. Every posting
    carries its docID-range ``salt`` and encode partition ``pkey``.
    """
    return TokenizeStage(
        analyzer_cfg, n_parts=n_parts, salt_doc_shift=salt_doc_shift,
        shards_per_salt=shards_per_salt, _cached=True,
    )(batch)


class TokenizeStage:
    """Callable form of the tokenize stage (usable as an actor class too)."""

    def __init__(self, analyzer_cfg, n_parts: int = 64,
                 salt_doc_shift: int = 40, shards_per_salt: int = 2,
                 _cached: bool = False):
        self.an = analyzer_for(analyzer_cfg) if _cached else Analyzer(analyzer_cfg)
        self.n_parts = n_parts
        self.salt_doc_shift = salt_doc_shift
        self.shards_per_salt = shards_per_salt

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        np_, shift, sps = self.n_parts, self.salt_doc_shift, self.shards_per_salt
        terms: list[str] = []
        dids: list[int] = []
        tfs: list[int] = []
        dls: list[int] = []
        salts: list[int] = []
        kinds: list[int] = []
        pkeys: list[int] = []
        for did, txt in zip(doc_ids, texts):
            cnt = self.an.term_freqs(txt or "")
            dl = sum(cnt.values())
            salt = (did >> shift) // sps
            for t, f in cnt.items():
                terms.append(t)
                dids.append(did)
                tfs.append(f)
                dls.append(dl)
                salts.append(salt)
                kinds.append(0)
                pkeys.append(((_term_hash(t) ^ (salt * _MIX)) & ((1 << 64) - 1)) % np_)
            # doclen marker row — every doc, even all-stopword ones (dl may
            # be 0); keeps N and avgdl exact. Spread across partitions by doc.
            terms.append("")
            dids.append(did)
            tfs.append(0)
            dls.append(dl)
            salts.append(salt)
            kinds.append(1)
            # doclen rows live in the disjoint pkey range [n_parts, 2n_parts)
            # so posting reads (pkey == p < n_parts) never touch them
            pkeys.append(np_ + did % np_)
        # sorted by pkey so parquet row-group min/max statistics cluster by
        # partition — the pkey-filtered encode reads can prune row groups
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(dids, pa.int64()),
                "tf": pa.array(tfs, pa.int32()),
                "dl": pa.array(dls, pa.int32()),
                "salt": pa.array(salts, pa.int32()),
                "kind": pa.array(kinds, pa.int8()),
                "pkey": pa.array(pkeys, pa.int32()),
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
    with pq.ParquetWriter(path, batch.schema, compression="zstd") as w:
        for s, e in zip(bounds[:-1], bounds[1:]):
            for off in range(int(s), int(e), 262_144):
                w.write_table(
                    batch.slice(off, min(262_144, int(e) - off)),
                    row_group_size=262_144,
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
               dls: np.ndarray, cfg: IndexConfig, avgdl: float) -> dict:
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
    # gaps, with absolute docID at every block start
    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    gaps[starts] = ids[starts]
    id_bytes = _varbyte_sizes(gaps)
    tfs_i = tfs.astype(np.int64)
    tf_bytes = _varbyte_sizes(tfs_i)
    id_buf = varbyte_encode(gaps)
    tf_buf = varbyte_encode(tfs_i)
    id_ends = np.concatenate(([0], np.cumsum(id_bytes)))
    tf_ends = np.concatenate(([0], np.cumsum(tf_bytes)))
    block_max = np.maximum.reduceat(tf_norm, starts)
    last_ids = ids[np.minimum(starts + bs, n) - 1]

    nblocks = starts.size
    return {
        "bucket": np.full(nblocks, term_bucket(term, cfg.num_buckets), np.int32),
        "term": np.full(nblocks, term, dtype=object),
        "salt": np.full(nblocks, salt, np.int64),
        "block_id": np.arange(nblocks, dtype=np.int32),
        "n": np.minimum(starts + bs, n).astype(np.int32) - starts.astype(np.int32),
        "last_doc_id": last_ids,
        "doc_ids": [
            id_buf[id_ends[starts[j]]: id_ends[min(starts[j] + bs, n)]]
            for j in range(nblocks)
        ],
        "tfs": [
            tf_buf[tf_ends[starts[j]]: tf_ends[min(starts[j] + bs, n)]]
            for j in range(nblocks)
        ],
        "max_tf_norm": block_max,
    }


_EMPTY_SEG = pd.DataFrame(
    {
        "bucket": pd.Series(dtype=np.int32),
        "term": pd.Series(dtype=object),
        "salt": pd.Series(dtype=np.int64),
        "block_id": pd.Series(dtype=np.int32),
        "n": pd.Series(dtype=np.int32),
        "last_doc_id": pd.Series(dtype=np.int64),
        "doc_ids": pd.Series(dtype=object),
        "tfs": pd.Series(dtype=object),
        "max_tf_norm": pd.Series(dtype=np.float64),
    }
)


def encode_part(batch: pa.Table, praw: str, cfg_dict: dict,
                avgdl: float) -> pd.DataFrame:
    """Stage-4 task body: encode every (term, salt) run of one pkey
    partition. Reads the partition's files directly (the shuffle already
    happened at write time); one numpy lexsort + reduceat-style slicing —
    Python is invoked per run, vectorized within."""
    import pyarrow.dataset as pads

    cfg = IndexConfig.from_dict(cfg_dict)
    frames = []
    dset = pads.dataset(praw)
    for p in batch.column("p").to_pylist():
        # use_threads=False: arrow's scanner pool would otherwise use every
        # core inside each Ray task, breaking Ray's CPU accounting (and any
        # measured scaling); Ray parallelizes across the n_parts tasks.
        tab = dset.scanner(
            columns=["term", "salt", "doc_id", "tf", "dl"],
            filter=pads.field("pkey") == p,
            use_threads=False,
        ).to_table()
        if tab.num_rows == 0:
            continue
        df = tab.to_pandas()
        order = np.lexsort(
            (df["doc_id"].to_numpy(), df["salt"].to_numpy(),
             df["term"].to_numpy())
        )
        terms = df["term"].to_numpy()[order]
        salts = df["salt"].to_numpy()[order]
        ids = df["doc_id"].to_numpy()[order]
        tfs = df["tf"].to_numpy()[order].astype(np.float64)
        dls = df["dl"].to_numpy()[order].astype(np.float64)
        # run boundaries: change of (term, salt)
        change = np.empty(terms.size, dtype=bool)
        change[0] = True
        change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
        bounds = np.flatnonzero(change).tolist() + [terms.size]
        for s, e in zip(bounds[:-1], bounds[1:]):
            frames.append(
                pd.DataFrame(
                    encode_run(
                        terms[s], int(salts[s]), ids[s:e], tfs[s:e],
                        dls[s:e], cfg, avgdl,
                    )
                )
            )
    if not frames:
        return _EMPTY_SEG.copy()
    out = pd.concat(frames, ignore_index=True)
    # bucket-sorted so the reader's bucket-filtered loads prune row groups
    return out.sort_values(["bucket", "term", "salt"], kind="mergesort",
                           ignore_index=True)


def build_index(corpus_ds, out_dir: str, cfg: IndexConfig | None = None,
                *, tokenize_batch_size: int = 512,
                tokenize_concurrency=None) -> dict:
    """Run the full checkpointed build. ``corpus_ds`` is a
    ``ray.data.Dataset`` with columns ``(doc_id:int64, text:string)``,
    already deduped/filtered (see webindex.pipelines.prepare_corpus).

    Returns the final stats dict. Safe to re-run: completed stages are
    skipped via the manifest (atomic rename checkpoints).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    # tokenize_concurrency is accepted for API stability but unused: the
    # tokenize stage runs as stateless tasks (process-global analyzer
    # cache), which scale elastically and skip actor-pool startup.
    del tokenize_concurrency
    cfg = cfg or IndexConfig()
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
            ),
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
        )
        # custom writer: one parquet ROW GROUP per pkey run within each
        # (pkey-sorted) block, so the stage-4 pkey-filtered reads prune to
        # exactly their rows via row-group statistics. Ray's stock sink
        # writes ~1M-row groups, which made every encode task re-read ~half
        # the corpus.
        ds.map_batches(
            _write_postings_block, fn_kwargs=dict(out_dir=tmp),
            batch_format="pyarrow", batch_size=None,
        ).materialize()
        return {}

    runner.run("postings_raw", stage_postings)
    praw = runner.out_dir("postings_raw")

    # ---- stage 2: global stats ------------------------------------------
    # doclens live inside postings_raw as kind=1 rows — the reader pulls
    # them with parquet predicate pushdown, so no separate copy is written.
    def stage_stats(_tmp):
        dl_ds = rd.read_parquet(
            praw, columns=["doc_id", "dl"], filter=pc.field("kind") == 1
        )
        agg = dl_ds.aggregate(
            Count(alias_name="N"), Sum("dl", alias_name="total_tokens"),
            Max("doc_id", alias_name="max_doc_id"),
        )
        stats = {
            "N": int(agg["N"]),
            "total_tokens": int(agg["total_tokens"]),
            "max_doc_id": int(agg["max_doc_id"]),
            "avgdl": float(agg["total_tokens"]) / max(1, int(agg["N"])),
        }
        atomic_write_json(stats_path, stats)
        return {"stats": stats}

    runner.run("stats", stage_stats, has_output_dir=False)
    stats = read_json(stats_path)

    # ---- stage 3: dictionary (df/cf per term) ---------------------------
    def stage_dict(tmp):
        kind0 = rd.read_parquet(
            praw, columns=["term", "tf"], filter=pc.field("kind") == 0
        )
        partial = kind0.map_batches(_partial_df, batch_format="pyarrow")
        # partials are ~vocab rows per input block: coalesce before the
        # groupby so the sort shuffle runs over a handful of fat blocks
        # instead of paying per-task overhead on dozens of tiny ones
        partial = partial.repartition(8)
        dict_ds = partial.groupby("term").aggregate(
            Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf")
        )

        def add_bucket(t: pa.Table) -> pa.Table:
            b = pa.array(
                [term_bucket(x, cfg.num_buckets) for x in t.column("term").to_pylist()],
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

    runner.run("dict", stage_dict)
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
    return read_json(stats_path)
