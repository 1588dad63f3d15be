"""Checkpointed, resumable index-build pipeline (Ray-Data-first).

Replaces the reference's opaque Elasticsearch index build (beir==0.2.3
``BM25Search.index``, invoked at
/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10 —
SURVEY.md §2.1 S8) with explicit Ray Data stages over Arrow batches:

  corpus(doc_id, text)
    -> [postings]  map_batches(TokenizeStage)     (term, doc_id, tf, dl, kind)
    -> [doclens]   filter kind=1 -> parquet; global aggregates -> stats.json
    -> [dict]      per-batch partial df/cf -> groupby(term).sum -> parquet
    -> [segments]  salt heavy terms by docID range -> groupby(term, salt)
                   .map_groups(encode: sort, delta+varbyte, block-max)
                   -> parquet partitioned by term-hash bucket

Scale properties:
- the only all-to-all shuffles are the two groupbys, both over rows already
  pre-aggregated per document (tf per (term, doc)) or per batch (partial
  df/cf) — raw tokens never cross the wire;
- stopword-scale term skew (df ~ N) is split by docID *range* salt before
  the shuffle, so no single group exceeds ~(doc-space / salt_shards)
  postings, and the per-salt encoded runs concatenate into a globally
  docID-sorted posting list with no secondary merge (SURVEY.md §7.3);
- every stage is checkpointed to parquet with an atomic rename + manifest
  + lineage record, so a restarted build skips completed stages
  (north rule: "resumable from checkpoint with per-partition lineage").
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from webindex.analyze import Analyzer
from webindex.compress import varbyte_encode
from webindex.config import IndexConfig
from webindex.scoring import idf as _idf
from webindex.scoring import term_contrib
from webindex.util import StageRunner, atomic_write_json, read_json, term_bucket

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
        ("kind", pa.int8()),  # 0 = posting, 1 = doclen marker row
    ]
)


_ANALYZER_CACHE: dict[str, Analyzer] = {}


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


def tokenize_batch(batch: pa.Table, analyzer_cfg) -> pa.Table:
    """Stateless-task tokenize stage: documents -> per-doc term counts.

    Emits postings pre-aggregated per document — the combiner that keeps
    the groupby(term) shuffle small — plus one ``kind=1`` row per doc
    carrying its length.
    """
    return TokenizeStage(analyzer_cfg, _cached=True)(batch)


class TokenizeStage:
    """Callable form of the tokenize stage (usable as an actor class too)."""

    def __init__(self, analyzer_cfg, _cached: bool = False):
        self.an = analyzer_for(analyzer_cfg) if _cached else Analyzer(analyzer_cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        terms: list[str] = []
        dids: list[int] = []
        tfs: list[int] = []
        dls: list[int] = []
        kinds: list[int] = []
        for did, txt in zip(doc_ids, texts):
            cnt = self.an.term_freqs(txt or "")
            dl = sum(cnt.values())
            for t, f in cnt.items():
                terms.append(t)
                dids.append(did)
                tfs.append(f)
                dls.append(dl)
                kinds.append(0)
            # doclen marker row — every doc, even all-stopword ones (dl may
            # be 0); keeps N and avgdl exact.
            terms.append("")
            dids.append(did)
            tfs.append(0)
            dls.append(dl)
            kinds.append(1)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(dids, pa.int64()),
                "tf": pa.array(tfs, pa.int32()),
                "dl": pa.array(dls, pa.int32()),
                "kind": pa.array(kinds, pa.int8()),
            }
        )


def _partial_df(batch: pa.Table) -> pa.Table:
    """Per-batch partial df/cf — pre-aggregation before the groupby(term)."""
    g = batch.group_by("term").aggregate([("tf", "sum"), ("tf", "count")])
    return g.rename_columns(["term", "cf_p", "df_p"])


class AddSaltStage:
    """Adds the shuffle key columns: ``salt`` (docID-range split for heavy
    terms, 0 otherwise) and nothing else; closure state is the small set of
    heavy terms (df >= df_salt_threshold) broadcast via the task closure."""

    def __init__(self, heavy_terms: set[str], salt_shift: int):
        self.heavy = heavy_terms
        self.shift = salt_shift

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        if self.heavy:
            doc_ids = batch.column("doc_id").to_numpy()
            heavy_mask = np.fromiter(
                (t in self.heavy for t in terms), dtype=bool, count=len(terms)
            )
            salt = np.where(heavy_mask, doc_ids >> self.shift, 0)
        else:
            salt = np.zeros(len(terms), dtype=np.int64)
        return batch.append_column("salt", pa.array(salt, pa.int64()))


class EncodeGroupFn:
    """``groupby(term, salt).map_groups`` body: one (term, salt) posting run
    -> delta+varbyte blocks with block-max metadata.

    Whole-run encode is a single vectorized varbyte call; block boundaries
    are recovered by byte-offset slicing (no per-posting Python loop).
    """

    def __init__(self, cfg: IndexConfig, N: int, avgdl: float,
                 heavy_df: dict[str, int]):
        self.cfg = cfg
        self.N = N
        self.avgdl = avgdl
        self.heavy_df = heavy_df

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        term = g["term"].iloc[0]
        salt = int(g["salt"].iloc[0])
        g = g.sort_values("doc_id", kind="mergesort")
        ids = g["doc_id"].to_numpy(np.int64)
        tfs = g["tf"].to_numpy(np.int64)
        dls = g["dl"].to_numpy(np.int64)
        n = ids.size
        df_global = self.heavy_df.get(term, n)
        idf_t = _idf(self.N, df_global)
        contrib = term_contrib(
            tfs.astype(np.float64), dls.astype(np.float64),
            self.avgdl, cfg.k1, cfg.b, idf_t,
        )

        bs = cfg.block_size
        starts = np.arange(0, n, bs)
        # gaps, with absolute docID at every block start
        gaps = np.empty(n, dtype=np.int64)
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
        gaps[starts] = ids[starts]
        # per-value byte counts -> block byte offsets
        id_bytes = _varbyte_sizes(gaps)
        tf_bytes = _varbyte_sizes(tfs)
        id_buf = varbyte_encode(gaps)
        tf_buf = varbyte_encode(tfs)
        id_ends = np.concatenate(([0], np.cumsum(id_bytes)))
        tf_ends = np.concatenate(([0], np.cumsum(tf_bytes)))
        block_max = np.maximum.reduceat(contrib, starts)
        last_ids = ids[np.minimum(starts + bs, n) - 1]

        nblocks = starts.size
        rows = {
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
            "max_score": block_max,
        }
        return pd.DataFrame(rows)


def _varbyte_sizes(v: np.ndarray) -> np.ndarray:
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, 9):
        nb += v >= (1 << (7 * k))
    return nb


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
            fn_kwargs=dict(analyzer_cfg=cfg.analyzer),
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
        )
        ds.write_parquet(tmp)
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
        # heavy-term list (stopword-scale df) for the salted shuffle
        import pyarrow.parquet as pq
        import pyarrow.dataset as pads

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
        atomic_write_json(stats_path, st)
        return {}

    runner.run("dict", stage_dict)
    heavy_df = {k: int(v) for k, v in
                (read_json(os.path.join(out_dir, "heavy_terms.json"), {})).items()}
    stats = read_json(stats_path)

    # ---- stage 4: encoded segments --------------------------------------
    max_doc = stats["max_doc_id"]
    salt_shift = max(
        0, int(max_doc + 1).bit_length() - int(math.ceil(math.log2(max(2, cfg.salt_shards))))
    )
    st = dict(stats)
    st.update({"salt_shift": salt_shift, "n_heavy_terms": len(heavy_df)})
    atomic_write_json(stats_path, st)

    def stage_segments(tmp):
        kind0 = rd.read_parquet(
            praw,
            columns=["term", "doc_id", "tf", "dl"],
            filter=pc.field("kind") == 0,
        )
        salted = kind0.map_batches(
            AddSaltStage(set(heavy_df), salt_shift), batch_format="pyarrow"
        )
        enc_fn = EncodeGroupFn(cfg, st["N"], st["avgdl"], heavy_df)

        def encode_group(g: pd.DataFrame) -> pd.DataFrame:
            return enc_fn(g)

        enc = salted.groupby(["term", "salt"]).map_groups(
            encode_group, batch_format="pandas"
        )
        enc.write_parquet(tmp, partition_cols=["bucket"])
        return {}

    runner.run("segments", stage_segments)
    return read_json(stats_path)
