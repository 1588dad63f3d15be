"""Multi-field ``best_fields`` scoring — the ES ``multi_match`` analog.

The reference's actual Elasticsearch query is
``multi_match{type: best_fields, fields: [title, txt], tie_breaker: 0.5}``
(/root/reference/crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10 via
the beir ``BM25Search`` wrapper — SURVEY.md §3.1/§7.0). The north rule pins
single-field BM25 for the headline engine; this module restores the
two-field surface as an option with fully pinned semantics:

- each field is a separate index over the docs where that field is
  non-empty (its own N, avgdl, df — exactly how ES scores per-field);
- per-field scores sum term contributions in ascending-term float64 order
  (the repo-wide summation pin);
- per document, ``best_fields`` with a tie breaker combines as

      score = max(s_title, s_body) + tie_breaker * min(s_title, s_body)

  with a missing field contributing 0.0 — for two fields this is exactly
  ES's ``max + tie_breaker * (sum of the others)``, written so the float64
  operations (greatest / least / fused multiply-add order) are
  reproducible one-for-one in the DuckDB oracle.

Field split: the driver's documents table has no title column, so the
split is pinned and SQL-expressible — raw whitespace tokens
(``[^ \\t\\n\\f\\r]+``, identical in Python ``re`` and DuckDB's RE2), the
first ``n_title`` tokens are the title, the rest the body.

Scale shape: combination is per-document and shards are docID ranges
(salt = doc_id >> salt_doc_shift // shards_per_salt, webindex/config.py),
so per-shard combined partial top-k rows merge exactly, the same proof as
single-field sharded serving (webindex/serve.py). Both field indexes MUST
share the salt configuration; bounds are derived from the union of both
indexes' stats so a field that is empty for the highest docIDs cannot
shrink the fan-out.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webindex.search import SEARCH_SHARDS, SHARDED_MIN_SEGMENT_BYTES
from webindex.segments import SegmentReader
from webindex.wand import _dense, _rank_topk, _zero_scratch, query_postings

# Pinned split/combine parameters (part of the spec, used by engine, SQL
# oracle and tests alike).
TITLE_TOKENS = 6
TIE_BREAKER = 0.5

# Raw pre-analysis whitespace tokenizer: [^ \t\n\f\r]+ matches DuckDB RE2's
# complement of \s exactly (Python's \S differs on \v and unicode spaces).
RAW_TOKEN_RE = re.compile(r"[^ \t\n\f\r]+")


def split_fields(text: str, n_title: int = TITLE_TOKENS) -> tuple[str, str]:
    """text -> (title, body): first ``n_title`` raw whitespace tokens vs
    the rest, each re-joined with single spaces (whitespace runs inside a
    field are not preserved — the analyzer is whitespace-insensitive and
    the single-space join is what DuckDB ``array_to_string`` produces)."""
    toks = RAW_TOKEN_RE.findall(text or "")
    return " ".join(toks[:n_title]), " ".join(toks[n_title:])


def field_corpus(docs_ds, field: str, n_title: int = TITLE_TOKENS):
    """documents(doc_id, text, ...) -> (doc_id, text) of ONE field, empty
    rows dropped (a doc without the field is absent from that field's
    index — its N/avgdl/df see only docs that have the field)."""
    if field not in ("title", "body"):
        raise ValueError(f"field must be 'title' or 'body', got {field!r}")

    def project(batch: pa.Table) -> pa.Table:
        vals = [
            split_fields(t, n_title)[0 if field == "title" else 1]
            for t in batch.column("text").to_pylist()
        ]
        out = pa.table(
            {"doc_id": batch.column("doc_id"),
             "text": pa.array(vals, pa.string())}
        )
        return out.filter(pc.not_equal(out.column("text"), ""))

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        project, batch_format="pyarrow"
    )


def field_match_scores(reader: SegmentReader, terms: list[str]):
    """Exact BM25 scores of EVERY doc matching >=1 query term in one field
    index -> (doc_ids ascending, scores). Same scatter-add kernel and
    ascending-term summation order as wand.exhaustive_topk — bit-identical
    contributions, no top-k cut (the cut happens after cross-field
    combination). Tombstoned docs (webindex.lifecycle) are excluded like
    every other query path."""
    pls = query_postings(reader, terms)
    if not pls:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    dl_ids = reader._dl_ids
    scores = _zero_scratch(reader, dl_ids.size)
    for pl in pls:  # ascending term order (query_postings sorts)
        _dense(pl, reader)
        scores[pl.dense_pos] += pl.dense_contrib
    sel = np.flatnonzero(scores)  # BM25 contribs are > 0: nonzero==match
    live = reader.live_mask()
    if live is not None:
        sel = sel[live[sel]]
    return dl_ids[sel], scores[sel].copy()  # copy: scratch is reader-owned


def combine_best_fields(ids_a, sc_a, ids_b, sc_b,
                        tie_breaker: float = TIE_BREAKER):
    """Two per-field (ids ascending, scores) match sets -> combined
    (ids ascending, scores): ``max + tie_breaker * min`` per doc, missing
    field = 0.0. Written as greatest/least (NOT max + tie*(sum-max)) so
    the float64 ops match the SQL oracle bit for bit."""
    all_ids = np.union1d(ids_a, ids_b)
    a = np.zeros(all_ids.size, dtype=np.float64)
    b = np.zeros(all_ids.size, dtype=np.float64)
    a[np.searchsorted(all_ids, ids_a)] = sc_a
    b[np.searchsorted(all_ids, ids_b)] = sc_b
    comb = np.maximum(a, b) + tie_breaker * np.minimum(a, b)
    return all_ids, comb


class MultiFieldSearcher:
    """Actor-pool stage: one resident SegmentReader per field (T4 analog),
    query batches -> best_fields runs. Both fields share one analyzer (the
    configs are asserted identical — ES would analyze the query once per
    field; with equal analyzers that is one tokenization)."""

    def __init__(self, title_dir: str, body_dir: str, top_k: int = 1000,
                 tie_breaker: float = TIE_BREAKER, preload: bool = True,
                 segments_refs=None, doc_id_range=None):
        from webindex.analyze import Analyzer

        self.readers = {}
        for field, d in (("title", title_dir), ("body", body_dir)):
            r = SegmentReader(d, doc_id_range=doc_id_range)
            if preload:
                tab = None
                if segments_refs is not None:
                    import ray

                    tab = ray.get(segments_refs[field])
                r.preload(table=tab)
            self.readers[field] = r
        ct, cb = self.readers["title"].cfg, self.readers["body"].cfg
        if ct.analyzer != cb.analyzer:
            raise ValueError("field indexes use different analyzers")
        if (ct.salt_doc_shift, ct.shards_per_salt) != (
            cb.salt_doc_shift, cb.shards_per_salt
        ):
            raise ValueError("field indexes use different salt configs")
        self.an = Analyzer(ct.analyzer)
        self.top_k = top_k
        self.tie = tie_breaker

    def search_one(self, qid: str, text: str):
        terms = self.an.tokens(text or "")
        it, st = field_match_scores(self.readers["title"], terms)
        ib, sb = field_match_scores(self.readers["body"], terms)
        ids, comb = combine_best_fields(it, st, ib, sb, self.tie)
        return _rank_topk(ids, comb, self.top_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out, id_out, sc_out, rk_out = [], [], [], []
        for qid, text in zip(
            batch.column("qid").to_pylist(), batch.column("text").to_pylist()
        ):
            ids, scores = self.search_one(qid, text)
            qids_out.extend([qid] * ids.size)
            id_out.append(ids)
            sc_out.append(scores)
            rk_out.append(np.arange(1, ids.size + 1, dtype=np.int32))
        return pa.table(
            {
                "qid": pa.array(qids_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(id_out) if id_out else np.empty(0, np.int64)
                ),
                "score": pa.array(
                    np.concatenate(sc_out) if sc_out
                    else np.empty(0, np.float64)
                ),
                "rank": pa.array(
                    np.concatenate(rk_out) if rk_out
                    else np.empty(0, np.int32)
                ),
            }
        )


def build_field_indexes(docs_ds, out_root: str, cfg=None, *,
                        n_title: int = TITLE_TOKENS) -> dict[str, str]:
    """Build (resumably) one index per field under ``out_root/{title,body}``
    from a documents(doc_id, text) Dataset. Returns {field: index_dir}."""
    import os

    from webindex.build import build_index

    dirs = {}
    for field in ("title", "body"):
        d = os.path.join(out_root, field)
        build_index(field_corpus(docs_ds, field, n_title), d, cfg)
        dirs[field] = d
    return dirs


# process-global shard-searcher cache (same worker-reuse rationale as
# webindex.search._SHARD_SEARCHERS)
_MF_SHARD_SEARCHERS: dict = {}


def _mf_shard_searcher(title_dir: str, body_dir: str, salt_lo: int,
                       salt_hi: int, top_k: int, tie_breaker: float):
    """Process-global cache of shard-restricted MultiFieldSearchers (Ray
    reuses worker processes; the resident segment subsets load once per
    worker). Keyed on both indexes' config mtimes so a rebuild at the same
    path invalidates stale readers."""
    import os

    import pyarrow.dataset as pads

    mt = os.stat(os.path.join(title_dir, "config.json")).st_mtime_ns
    mb = os.stat(os.path.join(body_dir, "config.json")).st_mtime_ns
    key = (title_dir, body_dir, mt, mb, salt_lo, salt_hi)
    s = _MF_SHARD_SEARCHERS.get(key)
    if s is None:
        for k in [
            k for k in _MF_SHARD_SEARCHERS
            if k[:2] == (title_dir, body_dir) and k[2:4] != (mt, mb)
        ]:
            del _MF_SHARD_SEARCHERS[k]
        # inclusive docID range covered by [salt_lo, salt_hi] (serve.py)
        from webindex.config import IndexConfig
        from webindex.util import read_json

        cfg = IndexConfig.from_dict(
            read_json(os.path.join(title_dir, "config.json"))
        )
        doc_lo = salt_lo * cfg.shards_per_salt << cfg.salt_doc_shift
        doc_hi = (
            ((salt_hi + 1) * cfg.shards_per_salt) << cfg.salt_doc_shift
        ) - 1
        s = MultiFieldSearcher(
            title_dir, body_dir, top_k=top_k, tie_breaker=tie_breaker,
            preload=False, doc_id_range=(doc_lo, doc_hi),
        )
        for r in s.readers.values():
            seg_root = r._seg_root
            if os.path.isdir(seg_root):
                tab = pads.dataset(seg_root).to_table(
                    filter=(pads.field("salt") >= salt_lo)
                    & (pads.field("salt") <= salt_hi)
                )
                r.preload(table=tab)
        _MF_SHARD_SEARCHERS[key] = s
    s.top_k = top_k
    return s


def multifield_search(queries_ds, title_dir: str, body_dir: str, *,
                      top_k: int = 1000, tie_breaker: float = TIE_BREAKER,
                      concurrency=None, batch_size: int = 128,
                      impl: str = "auto", n_shards: int = SEARCH_SHARDS):
    """queries(qid, text) Dataset -> best_fields runs Dataset
    (qid, doc_id, score, rank).

    Same physical routing as the single-field batch path
    (webindex.search.search_queries): above ``SHARDED_MIN_SEGMENT_BYTES``
    of combined segment data each query fans out to pinned salt-range
    shards — a shard scores BOTH its field subsets, combines per doc
    (per-document combination commutes with docID-range sharding), emits
    partial top-k — and an exact (score desc, docID asc) per-qid merge
    reassembles global runs. Below the threshold a whole-index actor pool
    serves the batch. Both impls are bit-identical.
    """
    import os

    import pandas as pd

    from webindex.serve import shard_salt_bounds

    if impl == "auto":
        nbytes = 0
        for d in (title_dir, body_dir):
            seg_root = os.path.join(d, "segments")
            if os.path.isdir(seg_root):
                for root, _, names in os.walk(seg_root):
                    for name in names:
                        nbytes += os.path.getsize(os.path.join(root, name))
        impl = "sharded" if nbytes >= SHARDED_MIN_SEGMENT_BYTES else "pool"

    if impl == "pool":
        import pyarrow.dataset as pads
        import ray

        if concurrency is None:
            concurrency = max(
                2, int(ray.cluster_resources().get("CPU", 4)) - 1
            )
        segments_refs = {}
        for field, d in (("title", title_dir), ("body", body_dir)):
            seg_root = os.path.join(d, "segments")
            segments_refs[field] = ray.put(
                pads.dataset(seg_root).to_table()
                if os.path.isdir(seg_root)
                else None
            )
        return queries_ds.map_batches(
            MultiFieldSearcher,
            fn_constructor_kwargs=dict(
                title_dir=title_dir, body_dir=body_dir, top_k=top_k,
                tie_breaker=tie_breaker, segments_refs=segments_refs,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    # sharded: bounds from the union of both indexes' doc spaces (a field
    # empty in the highest docIDs must not shrink the fan-out)
    bt = shard_salt_bounds(title_dir, n_shards)
    bb = shard_salt_bounds(body_dir, n_shards)
    bounds = bt if bt[-1][1] >= bb[-1][1] else bb

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        shard = np.repeat(np.arange(len(bounds), dtype=np.int32), n)
        return pa.table(
            {
                "shard": pa.array(shard),
                "qid": pa.concat_arrays(
                    [batch.column("qid").combine_chunks()] * len(bounds)
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * len(bounds)
                ),
            }
        )

    def score_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _mf_shard_searcher(
            title_dir, body_dir, lo, hi, top_k, tie_breaker
        )
        qid_out, id_out, sc_out = [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            ids, scores = searcher.search_one(qid, text)
            qid_out.extend([qid] * ids.size)
            id_out.append(ids)
            sc_out.append(scores)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(id_out) if id_out else np.empty(0, np.int64)
                ),
                "score": pa.array(
                    np.concatenate(sc_out) if sc_out
                    else np.empty(0, np.float64)
                ),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(top_k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "score", "rank"]]

    partial = (
        queries_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(score_shard, batch_format="pyarrow")
    )
    return partial.groupby("qid").map_groups(merge, batch_format="pandas")
