"""Multi-field scoring — the ES ``multi_match`` analogs: ``best_fields``
(dis_max with a tie breaker) and ``combined_fields`` (BM25F-style ONE BM25
over weighted per-field statistics).

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
# combined_fields (BM25F-style) weights: (title, body)
COMBINED_WEIGHTS = (2.0, 1.0)

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
    query batches -> multi-field runs. Both fields share one analyzer (the
    configs are asserted identical — ES would analyze the query once per
    field; with equal analyzers that is one tokenization).

    ``combine="best_fields"`` (default): per-doc max + tie_breaker * min
    of the per-field BM25 scores (dis_max).
    ``combine="combined_fields"`` (the ES combined_fields / BM25F-style
    query): ONE BM25 over the weighted term/length statistics —
    tf~ = w_t·tf_title + w_b·tf_body, dl~ = w_t·dl_title + w_b·dl_body,
    avgdl~ from the per-field totals, df~ = |union of the fields' posting
    docs| read from the build-time ``combined_dict`` sidecar
    (:func:`build_combined_dict`) so GLOBAL df reaches salt-range shard
    searchers (a query-time union inside a shard would see shard-local
    df and break the exact scatter-gather merge). Requires the pinned
    containment body-docs ⊆ title-docs (true by the split: a non-empty
    body implies ≥7 raw tokens, hence a non-empty title) — validated at
    construction."""

    def __init__(self, title_dir: str, body_dir: str, top_k: int = 1000,
                 tie_breaker: float = TIE_BREAKER, preload: bool = True,
                 segments_refs=None, doc_id_range=None,
                 combine: str = "best_fields",
                 weights: tuple[float, float] = COMBINED_WEIGHTS,
                 combined_dict_dir: str | None = None):
        from webindex.analyze import Analyzer

        if combine not in ("best_fields", "combined_fields"):
            raise ValueError(f"unknown combine mode {combine!r}")
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
        self.combine = combine
        if combine == "combined_fields":
            if combined_dict_dir is None:
                raise ValueError(
                    "combined_fields needs the combined_dict sidecar "
                    "(build_combined_dict) — query-time df unions are "
                    "shard-local and therefore wrong under sharding"
                )
            import pyarrow.dataset as pads

            dic = pads.dataset(combined_dict_dir).to_table(
                columns=["term", "dfu"], use_threads=False
            )
            self._cdict = dict(
                zip(dic.column("term").to_pylist(),
                    dic.column("dfu").to_pylist())
            )
            rt, rb = self.readers["title"], self.readers["body"]
            self.wt, self.wb = float(weights[0]), float(weights[1])
            # body-docs ⊆ title-docs containment (resident doclen tables
            # are equally range-restricted, so this holds per shard too)
            pos = np.searchsorted(rt._dl_ids, rb._dl_ids)
            pos_c = np.minimum(pos, max(rt._dl_ids.size - 1, 0))
            if rb._dl_ids.size and (
                rt._dl_ids.size == 0
                or not np.array_equal(rt._dl_ids[pos_c], rb._dl_ids)
            ):
                raise ValueError(
                    "combined_fields: body index contains docs absent "
                    "from the title index — not the pinned split"
                )
            # dense combined doclens over the title domain
            dl_body = np.zeros(rt._dl_ids.size, dtype=np.float64)
            if rb._dl_ids.size:
                dl_body[pos_c] = rb._dl.astype(np.float64)
            self._dl_comb = (
                self.wt * rt._dl.astype(np.float64) + self.wb * dl_body
            )
            # global N and weighted avgdl from the per-field stats
            self._n_comb = rt.N
            self._avgdl_comb = (
                self.wt * rt.stats["total_tokens"]
                + self.wb * rb.stats["total_tokens"]
            ) / rt.N

    def _combined_one(self, terms: list[str]):
        from webindex.scoring import idf as _idf
        from webindex.scoring import term_contrib

        rt, rb = self.readers["title"], self.readers["body"]
        cfg = rt.cfg
        scores = _zero_scratch(rt, rt._dl_ids.size)
        for t in sorted(set(terms)):  # ascending-term summation order
            plt = rt.postings(t)
            plb = rb.postings(t)
            if plt is None and plb is None:
                continue
            dfu = self._cdict.get(t)
            if dfu is None:
                raise ValueError(
                    f"combined_dict missing term {t!r} — rebuild the "
                    "sidecar (build_combined_dict) after index changes"
                )
            parts = []
            if plt is not None:
                _dense(plt, rt)  # dense_pos = positions in title domain
                parts.append((plt.dense_pos, self.wt, plt.tfs))
            if plb is not None:
                posb = np.searchsorted(rt._dl_ids, plb.ids)
                parts.append((posb, self.wb, plb.tfs))
            upos = (
                np.union1d(parts[0][0], parts[1][0])
                if len(parts) == 2
                else parts[0][0]
            )
            tfv = np.zeros(upos.size, dtype=np.float64)
            for pos, w, tfs in parts:  # title first, then body — pinned
                tfv[np.searchsorted(upos, pos)] += w * tfs.astype(np.float64)
            idf_t = _idf(self._n_comb, dfu)
            scores[upos] += term_contrib(
                tfv, self._dl_comb[upos], self._avgdl_comb,
                cfg.k1, cfg.b, idf_t,
            )
        sel = np.flatnonzero(scores)
        # tombstones: title mask directly; body tombstones map into the
        # title domain (delete from BOTH field indexes, like best_fields)
        lt = rt.live_mask()
        if lt is not None:
            sel = sel[lt[sel]]
        lb = rb.live_mask()
        if lb is not None and rb._dl_ids.size:
            dead_b = rb._dl_ids[~lb]
            if dead_b.size:
                posd = np.searchsorted(rt._dl_ids, dead_b)
                posd = np.minimum(posd, max(rt._dl_ids.size - 1, 0))
                dead_mask = np.ones(rt._dl_ids.size, dtype=bool)
                dead_mask[posd[rt._dl_ids[posd] == dead_b]] = False
                sel = sel[dead_mask[sel]]
        return _rank_topk(rt._dl_ids[sel], scores[sel].copy(), self.top_k)

    def search_one(self, qid: str, text: str):
        terms = self.an.tokens(text or "")
        if self.combine == "combined_fields":
            return self._combined_one(terms)
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
                        n_title: int = TITLE_TOKENS,
                        combined_dict: bool = True) -> dict[str, str]:
    """Build (resumably) one index per field under ``out_root/{title,body}``
    from a documents(doc_id, text) Dataset, plus (by default) the
    ``combined_dict`` sidecar for combined_fields scoring. Returns
    {field: index_dir, ["combined_dict": dir]}."""
    import os

    from webindex.build import build_index

    dirs = {}
    for field in ("title", "body"):
        d = os.path.join(out_root, field)
        build_index(field_corpus(docs_ds, field, n_title), d, cfg)
        dirs[field] = d
    if combined_dict:
        dirs["combined_dict"] = build_combined_dict(
            dirs["title"], dirs["body"],
            os.path.join(out_root, "combined_dict"),
        )
    return dirs


def build_combined_dict(title_dir: str, body_dir: str,
                        out_dir: str) -> str:
    """Union document frequency per term across both field indexes ->
    parquet (term, dfu) — the df the combined_fields scorer needs
    (|docs where tf~ > 0| = |title postings ∪ body postings| per term).

    Derived from the indexes' postings relays (raw (term, doc_id) rows, no
    decode): the only duplicates are docs carrying the term in BOTH
    fields, removed by a hash-partitioned distinct before a per-partition
    count — the repo's standard high-cardinality groupby shape. Atomic
    (tmp + rename); skipped when already built."""
    import os
    import shutil

    import pandas as pd
    import ray.data as rd

    from webindex.lifecycle import _relay_files
    from webindex.relational import hash_partitioned_groupby

    if os.path.isdir(out_dir):
        return out_dir
    files = [
        f
        for d in (title_dir, body_dir)
        for f in _relay_files(os.path.join(d, "postings_raw"))
    ]
    rows = rd.read_parquet(files, columns=["term", "doc_id", "kind"])
    pairs = rows.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0)).select(
            ["term", "doc_id"]
        ),
        batch_format="pyarrow",
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["term", "doc_id"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop_duplicates(["term", "doc_id"])
            .groupby("term", as_index=False)
            .agg(dfu=("doc_id", "size"))
        )

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    hash_partitioned_groupby(pairs, ["term"], partial, final).write_parquet(
        tmp
    )
    os.rename(tmp, out_dir)
    return out_dir


# process-global shard-searcher cache (same worker-reuse rationale as
# webindex.search._SHARD_SEARCHERS)
_MF_SHARD_SEARCHERS: dict = {}


def _mf_shard_searcher(title_dir: str, body_dir: str, salt_lo: int,
                       salt_hi: int, top_k: int, tie_breaker: float,
                       combine: str = "best_fields",
                       weights: tuple = COMBINED_WEIGHTS,
                       combined_dict_dir: str | None = None):
    """Process-global cache of shard-restricted MultiFieldSearchers (Ray
    reuses worker processes; the resident segment subsets load once per
    worker). Keyed on both indexes' config mtimes so a rebuild at the same
    path invalidates stale readers."""
    import os

    import pyarrow.dataset as pads

    mt = os.stat(os.path.join(title_dir, "config.json")).st_mtime_ns
    mb = os.stat(os.path.join(body_dir, "config.json")).st_mtime_ns
    key = (title_dir, body_dir, mt, mb, salt_lo, salt_hi, combine,
           tuple(weights))
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
            preload=False, doc_id_range=(doc_lo, doc_hi), combine=combine,
            weights=weights, combined_dict_dir=combined_dict_dir,
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
                      impl: str = "auto", n_shards: int = SEARCH_SHARDS,
                      combine: str = "best_fields",
                      weights: tuple = COMBINED_WEIGHTS,
                      combined_dict_dir: str | None = None):
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
                combine=combine, weights=weights,
                combined_dict_dir=combined_dict_dir,
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
            title_dir, body_dir, lo, hi, top_k, tie_breaker,
            combine=combine, weights=weights,
            combined_dict_dir=combined_dict_dir,
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
