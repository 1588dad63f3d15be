"""Anchor-text propagation: build a per-page ANCHOR field from the text
of pages that link to it — the classic web-search signal (Brin & Page
1998 §2.2; ES/Lucene index it as just another analyzed field). Not in
the reference (flat BEIR corpora have no links); at CC scale this is a
first-class index-build stage.

Pipeline shape (all Ray-Data): one stateless pass over the documents
table emits (dst, src, anchor) rows along the deterministic synthetic
link rule (webindex.graph.synth_links — the contract oracle re-derives
it); a per-batch LOCAL cap cut bounds shuffle traffic; ONE dst-hash
shuffle orders each target's in-link anchors by ascending src and
concatenates. The result is a (doc_id, text) corpus fed to the standard
index builder — anchor search is then ordinary BM25 over the anchor
field with that field's own statistics.

Skew is the real-world problem this operator must survive: a popular
page has millions of in-links. ``max_inlinks`` keeps only the lowest
``k`` source docIDs per target — a DETERMINISTIC cut (total order on
src), enforced per batch before the shuffle: any src in the global
lowest-k is in its own batch's lowest-k, so the per-batch cut is a
valid superset and at most k rows per (batch, dst) cross the wire.
Real engines cap anchor text the same way (bounded per-page anchor
budget); the cap is part of the pinned spec the SQL oracle replays
(row_number() OVER (PARTITION BY dst ORDER BY src) <= k).

Anchor snippet rule (pinned, SQL-expressible): a source page's anchor
is its first ``n_tokens`` lowercase ``[a-z0-9]+`` tokens, space-joined;
sources with no tokens emit no anchors. The target's anchor document is
the space-join of kept anchors in ascending-src order — exact string
identity between engine and oracle (contract entry ``anchor_docs``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from webindex.graph import LINK_OFFSETS


def anchor_corpus(docs_ds, n_docs: int, *, n_tokens: int = 4,
                  max_inlinks: int = 256, n_parts: int = 64):
    """documents(doc_id, text, n_chars) -> (doc_id, text, n_anchors):
    the anchor-field corpus (see module docstring for the pinned spec).
    Targets with no tokenized in-links are absent (no anchor field)."""
    from webindex.relational import hash_partitioned_groupby_arrow
    from webindex.textstats import _ASCII_TOK_RE

    def emit(batch: pa.Table) -> pa.Table:
        src = batch.column("doc_id").to_numpy().astype(np.int64)
        nch = batch.column("n_chars").to_numpy().astype(np.int64)
        texts = batch.column("text").to_pylist()
        anchors = np.array(
            [" ".join(_ASCII_TOK_RE.findall((t or "").lower())[:n_tokens])
             for t in texts],
            dtype=object,
        )
        has_tok = anchors != ""
        outs, outd = [], []
        for off in LINK_OFFSETS:
            dst = (src + off + nch) % n_docs
            keep = (dst != src) & has_tok
            outs.append(np.flatnonzero(keep))
            outd.append(dst[keep])
        si = np.concatenate(outs)
        d = np.concatenate(outd)
        s = src[si]
        # dedup parallel edges (same rule as graph.synth_links)
        order = np.lexsort((d, s))
        si, s, d = si[order], s[order], d[order]
        keep = np.ones(s.size, dtype=bool)
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        return pa.table(
            {"dst": pa.array(d[keep], pa.int64()),
             "src": pa.array(s[keep], pa.int64()),
             "anchor": pa.array(anchors[si[keep]], pa.string())}
        )

    rows = docs_ds.map_batches(emit, batch_format="pyarrow")

    def _group_slices(t: pa.Table):
        """(sorted table, group-start idx, per-group kept count) under
        the (dst, src) order + max_inlinks cut."""
        d = t.column("dst").to_numpy()
        s = t.column("src").to_numpy()
        order = np.lexsort((s, d))
        d2 = d[order]
        new = np.ones(d2.size, dtype=bool)
        new[1:] = d2[1:] != d2[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, d2.size))
        return t.take(pa.array(order)), d2, starts, np.minimum(
            lens, max_inlinks
        )

    def local_cut(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t2, d2, starts, cut = _group_slices(t)
        idx = np.arange(d2.size) - np.repeat(
            starts, np.diff(np.append(starts, d2.size))
        )
        return t2.filter(pa.array(idx < max_inlinks))

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "text": pa.array([], pa.string()),
                 "n_anchors": pa.array([], pa.int64())}
            )
        t2, d2, starts, cut = _group_slices(t)
        anchors = t2.column("anchor").to_pylist()
        texts = [
            " ".join(anchors[a: a + c]) for a, c in zip(starts, cut)
        ]
        return pa.table(
            {"doc_id": pa.array(d2[starts], pa.int64()),
             "text": pa.array(texts, pa.string()),
             "n_anchors": pa.array(cut.astype(np.int64), pa.int64())}
        )

    return hash_partitioned_groupby_arrow(rows, ["dst"], local_cut, final,
                                          n_parts=n_parts)


def anchor_corpus_reference(docs: list[tuple[int, str, int]], n_docs: int,
                            *, n_tokens: int = 4, max_inlinks: int = 256
                            ) -> dict[int, tuple[str, int]]:
    """Single-threaded replay of the pinned spec (test oracle):
    [(doc_id, text, n_chars)] -> {doc_id: (anchor_text, n_anchors)}."""
    import re

    tok = re.compile(r"[a-z0-9]+")
    edges: set[tuple[int, int]] = set()
    snip: dict[int, str] = {}
    for did, text, nch in docs:
        toks = tok.findall((text or "").lower())
        if not toks:
            continue
        snip[did] = " ".join(toks[:n_tokens])
        for off in LINK_OFFSETS:
            dst = (did + off + nch) % n_docs
            if dst != did:
                edges.add((did, dst))
    by_dst: dict[int, list[int]] = {}
    for s, d in edges:
        by_dst.setdefault(d, []).append(s)
    out = {}
    for d, srcs in by_dst.items():
        kept = sorted(srcs)[:max_inlinks]
        out[d] = (" ".join(snip[s] for s in kept), len(kept))
    return out
