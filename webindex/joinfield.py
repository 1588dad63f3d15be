"""ES parent-child join field: ``has_child`` / ``has_parent`` queries.

ES's ``join`` field type co-locates every child document with its parent
on one shard (custom routing by parent id) so parent-child scoring never
crosses shards. This module reproduces that design structurally: child
documents are the parent's fixed-window chunks (webindex.textstats
chunk_documents — the passage/answer granularity the ES pattern is used
for), and the child docID is ``parent_doc_id << 12 | chunk_id``. Because
the index's salt sharding is ``doc_id >> salt_doc_shift`` with
``salt_doc_shift = 40 >= 12`` (webindex/config.py), a parent's whole
child block shares one salt — per-parent aggregation is ALWAYS
shard-local, the exact invariant ES's routing provides. chunk_id must
fit 12 bits (4096 children per parent; a chunk rule violating that
raises at corpus-build time, not silently).

- ``has_child``: rank PARENTS by their matching children's BM25 scores,
  combined per ES ``score_mode`` — ``max`` / ``min`` (order-free,
  bit-exact), ``sum`` / ``avg`` (sequential left fold in ascending child
  docID; the fold order is pinned but long float folds are
  engine-specific, so combined scores are ROUNDED to 6dp and ranked on
  the rounded value with a parent-id tie-break — the bm25_scores
  contract precedent).
- ``has_parent``: return CHILDREN of each query's top-k matching
  parents, every child carrying its parent's score (ES has_parent with
  ``score=true``), ranked (parent score desc, child docID asc). Parent
  runs are query-table-sized, so the child side streams through ONE
  broadcast semi-join — never a corpus shuffle.

No counterpart exists in the reference (its joins are exact-key run/qrel
joins, SURVEY.md §2.4); this is part of the engine's ES-parity surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_CHILD_SHIFT = 12


def child_corpus(docs_ds, *, chunk_tokens: int = 20,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Parent docs -> child corpus ``(doc_id, text)`` plus the
    ``parent_id`` docvalues sidecar. Child docID packs
    ``parent << 12 | chunk_id`` (co-location invariant, module doc)."""
    from webindex.textstats import chunk_documents

    chunks = chunk_documents(
        docs_ds, max_tokens=chunk_tokens, overlap=0,
        id_col=id_col, text_col=text_col,
    )

    def pack(batch: pa.Table) -> pa.Table:
        pid = batch.column(id_col).to_numpy().astype(np.int64)
        cid = batch.column("chunk_id").to_numpy().astype(np.int64)
        if cid.size and int(cid.max()) >= (1 << _CHILD_SHIFT):
            raise ValueError(
                f"chunk_id >= {1 << _CHILD_SHIFT}: child block would "
                "cross a salt boundary (shrink docs or raise chunk size)"
            )
        if pid.size and int(pid.max()) >= (1 << 51):
            # packing headroom: parent ids already carrying salt bits
            # (url-derived 63-bit docIDs) need a salt-preserving child
            # packing instead of a plain shift
            raise ValueError("parent doc_id >= 2^51: cannot pack child ids")
        child = (pid << _CHILD_SHIFT) | cid
        return pa.table(
            {
                "doc_id": pa.array(child, pa.int64()),
                "text": batch.column("chunk_text"),
                "parent_id": pa.array(pid, pa.int64()),
            }
        )

    return chunks.map_batches(pack, batch_format="pyarrow")


def build_child_index(docs_ds, out_dir: str, cfg, **kwargs):
    """Build the child index with the parent_id docvalue attached."""
    from webindex.build import build_index

    kids = child_corpus(docs_ds, **kwargs)
    return build_index(
        kids.select_columns(["doc_id", "text"]), out_dir, cfg,
        docvalues_ds=kids.select_columns(["doc_id", "parent_id"]),
    )


def has_child_topk(queries_ds, child_index_dir: str, *, k: int = 10,
                   score_mode: str = "max", match: str = "or",
                   n_shards: int = 8):
    """queries(qid, text) -> (qid, parent_id, score, n_children, rank):
    the ES ``has_child`` query — parents ranked by their matching
    children's BM25 scores combined per ``score_mode``.

    Per shard: full exhaustive child ranking (every matching child's
    exact score), parent_id gathered from docvalues, per-parent combine
    — complete within the shard by the co-location invariant, so shard
    partials ARE the per-parent results and the global merge is a plain
    top-k. ``sum``/``avg`` fold sequentially in ascending child docID
    and the combined score rounds to 6dp (module doc); ``max``/``min``
    are bit-exact but round identically for one uniform surface."""
    from webindex.search import _qtext_explode, _shard_searcher
    from webindex.serve import shard_salt_bounds
    from webindex.wand import match_positions  # noqa: F401 (doc pointer)

    if score_mode not in ("max", "min", "sum", "avg"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    bounds = shard_salt_bounds(child_index_dir, n_shards)

    def child_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(child_index_dir, lo, hi, k, "auto",
                                   False)
        searcher.inner.set_constraints(None, match)
        s = searcher.inner
        s.reader._load_docvalues(["parent_id"])
        arr, valid = s.reader._dv["parent_id"]
        parents_np = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        dl_ids = s.reader._dl_ids
        q_out, p_out, c_out, n_out = [], [], [], []
        for qid, text in zip(
            g.column("qid").to_pylist(), g.column("text").to_pylist()
        ):
            terms = s.an.tokens(text or "")
            ids, scores = s._ranked(
                terms, max(int(dl_ids.size), 1), force_exhaustive=True
            )
            if ids.size == 0:
                continue
            pos = np.searchsorted(dl_ids, ids)
            ok = valid[pos]
            ids, scores, pos = ids[ok], scores[ok], pos[ok]
            if ids.size == 0:
                continue
            pids = parents_np[pos]
            order = np.argsort(ids)  # ascending child docID fold order
            ids, scores, pids = ids[order], scores[order], pids[order]
            # group boundaries over parent (children contiguous: child
            # docIDs of one parent form one block)
            starts = np.flatnonzero(
                np.concatenate(([True], pids[1:] != pids[:-1]))
            )
            ends = np.concatenate((starts[1:], [pids.size]))
            for st, en in zip(starts, ends):
                seg = scores[st:en]
                if score_mode == "max":
                    comb = float(seg.max())
                elif score_mode == "min":
                    comb = float(seg.min())
                else:
                    acc = 0.0
                    for x in seg:  # sequential left fold (pinned order)
                        acc += float(x)
                    comb = acc / seg.size if score_mode == "avg" else acc
                q_out.append(qid)
                p_out.append(int(pids[st]))
                c_out.append(round(comb, 6))
                n_out.append(int(en - st))
        return pa.table(
            {
                "qid": pa.array(q_out, pa.string()),
                "parent_id": pa.array(p_out, pa.int64()),
                "score": pa.array(c_out, pa.float64()),
                "n_children": pa.array(n_out, pa.int64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "parent_id"], ascending=[False, True],
            kind="mergesort",
        ).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "parent_id", "score", "n_children", "rank"]]

    return (
        queries_ds.map_batches(_qtext_explode(bounds),
                               batch_format="pyarrow")
        .groupby("shard")
        .map_groups(child_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )


def has_parent_children(queries_ds, parent_index_dir: str, docs_ds, *,
                        parent_k: int = 5, chunk_tokens: int = 20):
    """queries(qid, text) -> (qid, doc_id, parent_id, parent_score,
    rank): the ES ``has_parent`` query with ``score=true`` — every CHILD
    of each query's top-``parent_k`` matching parents, carrying its
    parent's BM25 score, ranked (parent score desc, child docID asc).

    Parent runs are (queries x k)-sized: broadcast once via ``ray.put``;
    the child corpus (re-derived from the parent docs by the same
    chunk rule) streams through ONE stateless semi-join batch pass —
    the corpus never shuffles."""
    import ray

    from webindex.search import search_queries

    runs = search_queries(
        queries_ds, parent_index_dir, top_k=parent_k
    ).to_pandas()
    # {parent: [(qid, score), ...]} — query-table-sized
    pmap: dict[int, list] = {}
    for _, r in runs.iterrows():
        # 6dp surface: per-doc BM25 folds are rounded wherever they must
        # hash-match the SQL oracle (bm25_scores precedent); ranking uses
        # the rounded value in BOTH engines so ties agree
        pmap.setdefault(int(r["doc_id"]), []).append(
            (r["qid"], round(float(r["score"]), 6))
        )
    pref = ray.put(pmap)

    kids = child_corpus(docs_ds, chunk_tokens=chunk_tokens)

    def semi(batch: pa.Table) -> pa.Table:
        m = ray.get(pref)
        pids = batch.column("parent_id").to_numpy().astype(np.int64)
        cids = batch.column("doc_id").to_numpy().astype(np.int64)
        q_out, c_out, p_out, s_out = [], [], [], []
        for cid, pid in zip(cids, pids):
            hits = m.get(int(pid))
            if not hits:
                continue
            for qid, sc in hits:
                q_out.append(qid)
                c_out.append(int(cid))
                p_out.append(int(pid))
                s_out.append(sc)
        return pa.table(
            {
                "qid": pa.array(q_out, pa.string()),
                "doc_id": pa.array(c_out, pa.int64()),
                "parent_id": pa.array(p_out, pa.int64()),
                "parent_score": pa.array(s_out, pa.float64()),
            }
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["parent_score", "doc_id"], ascending=[False, True],
            kind="mergesort",
        ).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["qid", "doc_id", "parent_id", "parent_score", "rank"]]

    return (
        kids.map_batches(semi, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(rank, batch_format="pandas")
    )
