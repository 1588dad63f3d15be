"""Lucene/ES ``intervals`` query family over the positional index.

The modern replacement for the span family (Lucene 7.4+, the ES
``intervals`` query): a small algebra over MINIMAL intervals —

    match(terms, ordered, max_gaps)      leaf rule
    any_of(sources)                      union
    all_of(sources, ordered, max_gaps)   composition
    filter: containing / not_containing / contained_by /
            not_contained_by / overlapping / not_overlapping /
            before / after

Semantics pinned here (and replayed by the driver's DuckDB oracles):

- An interval is a closed position range [s, e]. A doc matches a node
  when the node's MINIMAL interval set is non-empty. Minimal = the
  antichain under containment ([s,e] ⊇ [s',e'] when s<=s' and e'<=e);
  minimality is load-bearing for the NOT-filters (a doc matches
  ``not_containing`` when SOME minimal source interval avoids the
  filter, even if a larger enclosing one would contain it).
- ``match`` ordered: occurrences at strictly increasing positions, one
  per query term in order; gaps = (e - s) - (m - 1). Unordered: any
  window holding one occurrence of each DISTINCT term; gaps =
  (e - s + 1) - m. ``max_gaps < 0`` means unbounded (ES default -1).
- ``all_of`` ordered: one interval per source, each starting strictly
  after the previous one ends; gaps = envelope size minus the summed
  child sizes (positions inside the envelope covered by no child).
  Existence is EXHAUSTIVE over child-interval chains (bounded DFS), so
  the oracle's plain EXISTS join replays it; a greedy chain would not
  commute with the gaps cut (a shorter child can reach the same
  envelope with more gaps). ``all_of`` unordered: the window covering
  one interval per source (overlaps allowed, Lucene UNORDERED);
  ``max_gaps`` must be -1 (coverage is ambiguous under overlap).
- Matching docs are scored exactly like the repo's span family: the
  ordinary OR-match BM25 sum of the PRESENT leaf terms in ascending
  unicode order (positional._score_matched convention), so rankings are
  bit-identical to the ``match`` path and SQL-checkable through the
  shared scores CTE.

Scale shape: per-query shard fan-out over pinned salt ranges (the
decay_queries pattern) — candidate docs per shard come from posting-list
set algebra, position blobs are gathered once per (term, candidate set)
with the vectorized ragged gather, and only the per-doc interval algebra
(tiny arrays: a doc's occurrences of the query terms) runs doc-at-a-time.
Reference analog: ES interval search SGPT's BM25 baselines delegate to
Elasticsearch (SURVEY.md §2.6); sibling of webindex/positional.py.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

_BIG = np.int64(np.iinfo(np.int64).max)
# per-doc, per-level cap on the vectorized all_of chain expansion (numpy
# rows, not Python recursion) — a memory guard for pathological queries
# (several stopword-frequency children under one ordered all_of)
_MAX_CHAINS = 20_000_000

_FILTER_KINDS = (
    "containing", "not_containing", "contained_by", "not_contained_by",
    "overlapping", "not_overlapping", "before", "after",
)


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


class _Node:
    __slots__ = ("kind", "terms", "ordered", "max_gaps", "children",
                 "fkind", "fnode")

    def __init__(self, kind, *, terms=(), ordered=False, max_gaps=-1,
                 children=(), fkind=None, fnode=None):
        self.kind = kind
        self.terms = tuple(terms)
        self.ordered = bool(ordered)
        self.max_gaps = int(max_gaps)
        self.children = tuple(children)
        self.fkind = fkind
        self.fnode = fnode


def parse_intervals(spec: dict, analyzer) -> _Node:
    """ES intervals-JSON ``{"match": {...}} | {"any_of": ...} |
    {"all_of": ...}`` -> validated AST; query text is analyzed with the
    index's analyzer (one rule per ES convention)."""
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError("intervals spec must be a single-rule dict")
    (kind, body), = spec.items()
    flt = body.get("filter")
    fkind = fnode = None
    if flt is not None:
        if not isinstance(flt, dict) or len(flt) != 1:
            raise ValueError("filter must be a single-kind dict")
        (fkind, fspec), = flt.items()
        if fkind not in _FILTER_KINDS:
            raise ValueError(f"unknown intervals filter {fkind!r}")
        fnode = parse_intervals(fspec, analyzer)
    if kind == "match":
        terms = analyzer.tokens(body["query"])
        if not terms:
            raise ValueError("match rule analyzed to zero terms")
        ordered = bool(body.get("ordered", False))
        if not ordered and len(set(terms)) != len(terms):
            raise ValueError(
                "unordered match does not support duplicate terms"
            )
        node = _Node("match", terms=terms, ordered=ordered,
                     max_gaps=body.get("max_gaps", -1))
    elif kind in ("any_of", "all_of"):
        children = [parse_intervals(c, analyzer)
                    for c in body["intervals"]]
        if not children:
            raise ValueError(f"{kind} needs at least one source")
        mg = int(body.get("max_gaps", -1))
        ordered = bool(body.get("ordered", False))
        if kind == "all_of" and not ordered and mg >= 0:
            raise ValueError(
                "all_of(ordered=false) supports only max_gaps=-1 "
                "(coverage is ambiguous under overlap)"
            )
        node = _Node(kind, children=children, ordered=ordered, max_gaps=mg)
    else:
        raise ValueError(f"unknown intervals rule {kind!r}")
    node.fkind, node.fnode = fkind, fnode
    return node


def leaf_terms(node: _Node) -> list[str]:
    """All leaf terms (source AND filter sides), ascending unique."""
    out = set()

    def walk(n):
        out.update(n.terms)
        for c in n.children:
            walk(c)
        if n.fnode is not None:
            walk(n.fnode)

    walk(node)
    return sorted(out)


# ---------------------------------------------------------------------------
# minimal-interval algebra (per-doc; tiny int64 arrays)
# ---------------------------------------------------------------------------


def _minimalize(s: np.ndarray, e: np.ndarray):
    """Antichain under containment: drop any interval containing another
    (or duplicating one). Process in (e asc, s desc) order keeping
    intervals whose start strictly exceeds every kept start so far."""
    if s.size <= 1:
        return s, e
    order = np.lexsort((-s, e))
    s, e = s[order], e[order]
    keep = np.zeros(s.size, dtype=bool)
    max_s = -1
    for i in range(s.size):
        if s[i] > max_s:
            keep[i] = True
            max_s = s[i]
    s, e = s[keep], e[keep]
    order = np.argsort(s)
    return s[order], e[order]


_EMPTY_IV = (np.empty(0, np.int64), np.empty(0, np.int64))


def _match_ordered(plists, max_gaps: int):
    """Minimal ordered chains: greedy min-next from every first-term
    occurrence, then the antichain + gaps cut."""
    m = len(plists)
    if m == 1:
        s = plists[0]
        return s, s.copy()
    starts, ends = [], []
    for p0 in plists[0].tolist():
        prev = p0
        ok = True
        for j in range(1, m):
            lst = plists[j]
            i = int(np.searchsorted(lst, prev + 1, side="left"))
            if i == lst.size:
                ok = False
                break
            prev = int(lst[i])
        if ok:
            starts.append(p0)
            ends.append(prev)
    if not starts:
        return _EMPTY_IV
    s, e = _minimalize(np.array(starts, np.int64), np.array(ends, np.int64))
    if max_gaps >= 0:
        keep = (e - s) - (m - 1) <= max_gaps
        s, e = s[keep], e[keep]
    return s, e


def _match_unordered(plists, max_gaps: int):
    """Minimal windows holding one occurrence of each term (any order):
    the classic advance-the-minimum sweep, then antichain + gaps cut."""
    m = len(plists)
    if m == 1:
        s = plists[0]
        return s, s.copy()
    if any(lst.size == 0 for lst in plists):
        return _EMPTY_IV
    ptr = [0] * m
    cur = [int(lst[0]) for lst in plists]
    starts, ends = [], []
    while True:
        lo = min(cur)
        hi = max(cur)
        starts.append(lo)
        ends.append(hi)
        j = cur.index(lo)
        ptr[j] += 1
        if ptr[j] == plists[j].size:
            break
        cur[j] = int(plists[j][ptr[j]])
    s, e = _minimalize(np.array(starts, np.int64), np.array(ends, np.int64))
    if max_gaps >= 0:
        keep = (e - s + 1) - m <= max_gaps
        s, e = s[keep], e[keep]
    return s, e


def _allof_ordered(child_ivs, max_gaps: int):
    """Exact level-wise VECTORIZED expansion of one-interval-per-child
    chains (s_{j+1} > e_j) with per-start Pareto pruning; gaps =
    envelope size - covered positions. Exhaustive over the qualifying
    envelope set (not greedy — a shorter child can reach the same
    envelope with more gaps), so existence equals the oracle's plain
    EXISTS join.

    Pruning is lossless for the emitted MINIMAL set: partial chains with
    the same start keep, per envelope end, only the max coverage, then
    only the (end asc, coverage strictly asc) Pareto frontier — a
    dominated partial (same start, later end, no more coverage) can only
    produce finals with the same start, a later final end and no better
    gaps, which the dominating partial's finals already shadow in the
    (min qualifying end per start) antichain. This replaces a DFS that
    was exponential on stopword-frequency children (found by driving
    all_of('the','and') over a real crawl page)."""
    m = len(child_ivs)
    if any(c[0].size == 0 for c in child_ivs):
        return _EMPTY_IV
    s0, e0 = child_ivs[0]
    S, E = s0.copy(), e0.copy()
    COV = e0 - s0 + 1
    for cs, ce in child_ivs[1:]:
        clen = ce - cs + 1
        i0 = np.searchsorted(cs, E + 1, side="left")
        counts = cs.size - i0
        alive = counts > 0
        if not alive.any():
            return _EMPTY_IV
        S, COV, i0, counts = S[alive], COV[alive], i0[alive], counts[alive]
        total = int(counts.sum())
        if total > _MAX_CHAINS:
            raise RuntimeError(
                "intervals all_of expansion exceeded the per-doc bound "
                f"({total} > {_MAX_CHAINS})"
            )
        rep = np.repeat(np.arange(S.size), counts)
        offs = np.arange(total) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        ci = i0[rep] + offs
        S = S[rep]
        COV = COV[rep] + clen[ci]
        E = ce[ci]
        # per (S, E) keep max COV, then per S the (E asc, COV strictly
        # asc) Pareto frontier — see docstring for the exactness proof
        order = np.lexsort((-COV, E, S))
        S, E, COV = S[order], E[order], COV[order]
        first = np.ones(S.size, dtype=bool)
        first[1:] = (S[1:] != S[:-1]) | (E[1:] != E[:-1])
        S, E, COV = S[first], E[first], COV[first]
        newgrp = np.ones(S.size, dtype=bool)
        newgrp[1:] = S[1:] != S[:-1]
        grp = np.cumsum(newgrp) - 1
        big = np.int64(1) << 40  # > any coverage (positions are < 2^32)
        cm_incl = np.maximum.accumulate(COV + grp * big) - grp * big
        cm_excl = np.concatenate(([np.int64(-1)], cm_incl[:-1]))
        cm_excl[newgrp] = -1
        keep = COV > cm_excl
        S, E, COV = S[keep], E[keep], COV[keep]
    if max_gaps >= 0:
        ok = (E - S + 1) - COV <= max_gaps
        S, E = S[ok], E[ok]
    return _minimalize(S, E)


def _allof_unordered(child_ivs):
    """Window covering one interval per child (overlaps allowed):
    advance-the-minimum over child lists ordered by start."""
    m = len(child_ivs)
    if any(c[0].size == 0 for c in child_ivs):
        return _EMPTY_IV
    ptr = [0] * m
    starts, ends = [], []
    while True:
        lo_s = min(int(child_ivs[j][0][ptr[j]]) for j in range(m))
        hi_e = max(int(child_ivs[j][1][ptr[j]]) for j in range(m))
        starts.append(lo_s)
        ends.append(hi_e)
        j = min(range(m), key=lambda j: int(child_ivs[j][0][ptr[j]]))
        ptr[j] += 1
        if ptr[j] == child_ivs[j][0].size:
            break
    return _minimalize(np.array(starts, np.int64),
                       np.array(ends, np.int64))


def _apply_filter(src, fkind: str, flt):
    s, e = src
    fs, fe = flt
    if s.size == 0:
        return src
    if fkind in ("containing", "not_containing"):
        if fs.size == 0:
            hit = np.zeros(s.size, dtype=bool)
        else:
            # exists f: f.s >= I.s and f.e <= I.e  (suffix-min of f.e)
            suf_min = np.minimum.accumulate(fe[::-1])[::-1]
            i0 = np.searchsorted(fs, s, side="left")
            hit = (i0 < fs.size) & (
                suf_min[np.minimum(i0, fs.size - 1)] <= e
            )
        keep = hit if fkind == "containing" else ~hit
    elif fkind in ("contained_by", "not_contained_by"):
        if fs.size == 0:
            hit = np.zeros(s.size, dtype=bool)
        else:
            # exists f: f.s <= I.s and f.e >= I.e  (prefix-max of f.e)
            pre_max = np.maximum.accumulate(fe)
            i1 = np.searchsorted(fs, s, side="right") - 1
            hit = (i1 >= 0) & (pre_max[np.maximum(i1, 0)] >= e)
        keep = hit if fkind == "contained_by" else ~hit
    elif fkind in ("overlapping", "not_overlapping"):
        if fs.size == 0:
            hit = np.zeros(s.size, dtype=bool)
        else:
            # exists f: f.s <= I.e and f.e >= I.s  (prefix-max of f.e)
            pre_max = np.maximum.accumulate(fe)
            i1 = np.searchsorted(fs, e, side="right") - 1
            hit = (i1 >= 0) & (pre_max[np.maximum(i1, 0)] >= s)
        keep = hit if fkind == "overlapping" else ~hit
    elif fkind == "before":
        # exists f starting after I ends
        keep = (e < (fs.max() if fs.size else -_BIG))
    else:  # after: exists f ending before I starts
        keep = (s > (fe.min() if fe.size else _BIG))
    return s[keep], e[keep]


def eval_node(node: _Node, posmap: dict) -> tuple:
    """Minimal interval set of ``node`` for one doc. ``posmap`` maps
    term -> ascending int64 position array (missing terms absent)."""
    if node.kind == "match":
        plists = []
        for t in node.terms:
            p = posmap.get(t)
            if p is None or p.size == 0:
                iv = _EMPTY_IV
                break
            plists.append(p)
        else:
            if node.ordered:
                iv = _match_ordered(plists, node.max_gaps)
            else:
                iv = _match_unordered(plists, node.max_gaps)
    elif node.kind == "any_of":
        parts = [eval_node(c, posmap) for c in node.children]
        s = np.concatenate([p[0] for p in parts])
        e = np.concatenate([p[1] for p in parts])
        iv = _minimalize(s, e)
    else:  # all_of
        child_ivs = [eval_node(c, posmap) for c in node.children]
        if node.ordered:
            iv = _allof_ordered(child_ivs, node.max_gaps)
        else:
            iv = _allof_unordered(child_ivs)
    if node.fnode is not None and iv[0].size:
        iv = _apply_filter(iv, node.fkind, eval_node(node.fnode, posmap))
    return iv


# ---------------------------------------------------------------------------
# index-backed evaluation
# ---------------------------------------------------------------------------


def _candidates(node: _Node, reader) -> np.ndarray:
    """Candidate docIDs from posting-list set algebra (a superset of the
    true match set — position checks happen per doc)."""
    def ids(term):
        pl = reader.postings(term)
        return pl.ids if pl is not None else np.empty(0, np.int64)

    if node.kind == "match":
        cand = ids(node.terms[0])
        for t in node.terms[1:]:
            cand = np.intersect1d(cand, ids(t), assume_unique=True)
    elif node.kind == "any_of":
        cand = np.empty(0, np.int64)
        for c in node.children:
            cand = np.union1d(cand, _candidates(c, reader))
    else:
        cand = _candidates(node.children[0], reader)
        for c in node.children[1:]:
            cand = np.intersect1d(cand, _candidates(c, reader),
                                  assume_unique=True)
    if node.fkind in ("containing", "contained_by", "overlapping",
                      "before", "after"):
        cand = np.intersect1d(cand, _candidates(node.fnode, reader),
                              assume_unique=True)
    return cand


def intervals_topk(reader, node: _Node, k: int):
    """Top-k docs matching the intervals AST, scored by the OR-match
    BM25 sum of the present leaf terms (positional-family convention).
    Position blobs are gathered ONCE per (term, candidate set) with the
    vectorized ragged gather, then sliced per doc."""
    from webindex.positional import _EMPTY, _gather_positions
    from webindex.wand import _dense, _rank_topk

    cand = _candidates(node, reader)
    if cand.size == 0:
        return _EMPTY
    terms = leaf_terms(node)
    # per-term, per-candidate position slices
    percand: list[dict] = [dict() for _ in range(cand.size)]
    pls = []
    for t in terms:
        pl = reader.postings(t)
        if pl is None:
            continue
        if pl.pos_blocks is None:
            raise ValueError(
                "index has no positions (built without store_positions)"
            )
        pls.append(pl)
        rows = np.searchsorted(pl.ids, cand)
        ok = rows < pl.ids.size
        ok[ok] &= pl.ids[np.minimum(rows, pl.ids.size - 1)][ok] == cand[ok]
        rows_ok = rows[ok]
        if rows_ok.size == 0:
            continue
        pos_vals, pos_ends = reader.positions(t)
        flat_pos, row_of = _gather_positions(
            pos_vals, pos_ends, pl.tfs.astype(np.int64), rows_ok
        )
        lens = pl.tfs.astype(np.int64)[rows_ok]
        bounds = np.cumsum(lens)[:-1]
        cand_idx = np.flatnonzero(ok)
        for ci, chunk in zip(cand_idx, np.split(flat_pos, bounds)):
            percand[ci][t] = chunk
    matched = [
        did for did, posmap in zip(cand.tolist(), percand)
        if eval_node(node, posmap)[0].size
    ]
    if not matched:
        return _EMPTY
    matched = np.array(matched, np.int64)
    # OR-match BM25 over present leaf terms, ascending-term fold
    scores = np.zeros(matched.size, dtype=np.float64)
    for pl in pls:
        idx = np.searchsorted(pl.ids, matched)
        ok = idx < pl.ids.size
        ok[ok] &= pl.ids[np.minimum(idx, pl.ids.size - 1)][ok] == matched[ok]
        _dense(pl, reader)
        scores[ok] += pl.dense_contrib[idx[ok]]
    return _rank_topk(matched, scores, k)


def intervals_search(query_specs, index_dir: str, *, top_k: int = 10,
                     n_shards: int | None = None):
    """[(qid, spec_dict)] -> runs Dataset (qid, doc_id, score, rank).

    Shard fan-out over pinned salt ranges with an exact per-qid
    (score desc, docID asc) scatter-gather merge — matching is a
    per-document property, so the decay_queries merge proof applies."""
    import pandas as pd
    import ray.data as rd

    from webindex.search import SEARCH_SHARDS, _qtext_explode, \
        _shard_searcher
    from webindex.serve import shard_salt_bounds

    n_shards = n_shards or SEARCH_SHARDS
    bounds = shard_salt_bounds(index_dir, n_shards)
    qds = rd.from_arrow(pa.table({
        "qid": pa.array([q for q, _ in query_specs]),
        "text": pa.array([json.dumps(s, sort_keys=True)
                          for _, s in query_specs]),
    }))

    def iv_shard(g: pa.Table) -> pa.Table:
        sid = g.column("shard")[0].as_py()
        lo, hi = bounds[sid]
        searcher = _shard_searcher(index_dir, lo, hi, top_k, "auto", False)
        s = searcher.inner
        qid_out, id_out, sc_out = [], [], []
        for qid, spec in zip(g.column("qid").to_pylist(),
                             g.column("text").to_pylist()):
            node = parse_intervals(json.loads(spec), s.an)
            ids, scores = intervals_topk(s.reader, node, top_k)
            qid_out.extend([qid] * ids.size)
            id_out.append(ids)
            sc_out.append(scores)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(id_out) if id_out
                    else np.empty(0, np.int64)
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

    return (
        qds.map_batches(_qtext_explode(bounds), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(iv_shard, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge, batch_format="pandas")
    )
