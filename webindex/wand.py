"""Top-k BM25 query execution: exhaustive (vectorized) and Block-Max WAND.

The reference's core top-k operator is chunked scoring with a heap merge
(/root/reference/biencoder/beir/custommodels/exact_search.py:80-132 —
SURVEY.md §2.6 K1). Here the exhaustive scorer is its vectorized analog
(numpy scatter-add over decoded postings) and ``block_max_wand`` is the
pruned engine path: document-at-a-time pivoting over block-max skip
metadata with a bounded min-heap, exact (not approximate) because block
maxima are exact per-block score bounds computed at build time.

Determinism: both paths sum per-doc contributions in ascending unicode
order of the query's unique terms (float64) and rank by
(score desc, docID asc) — bit-identical to each other and to the
pure-Python oracle (webindex/oracle.py).
"""

from __future__ import annotations

import heapq

import numpy as np

from webindex.scoring import term_contrib
from webindex.segments import PostingList, SegmentReader


def query_postings(reader: SegmentReader, terms: list[str]) -> list[PostingList]:
    """Unique query terms in ascending order -> their posting lists."""
    out = []
    for t in sorted(set(terms)):
        pl = reader.postings(t)
        if pl is not None:
            out.append(pl)
    return out


def _rank_topk(ids: np.ndarray, scores: np.ndarray, k: int):
    """(score desc, docID asc) top-k."""
    if ids.size > 4 * k:
        # partial select then exact sort of the k candidates (with ties kept
        # via threshold re-scan to preserve docID tie-breaks)
        part = np.argpartition(-scores, k - 1)[:k]
        thresh = scores[part].min()
        cand = np.nonzero(scores >= thresh)[0]
    else:
        cand = np.arange(ids.size)
    order = np.lexsort((ids[cand], -scores[cand]))[:k]
    sel = cand[order]
    return ids[sel], scores[sel]


def exhaustive_topk(reader: SegmentReader, terms: list[str], k: int):
    """Score every doc containing any query term; exact top-k.

    Accumulates into a dense array indexed by the doc's position in the
    (sorted) doclen table — one searchsorted per term, no concat/unique of
    the candidate union (which dominated at millions of candidates).
    Summation stays ascending-term per doc (bit-identical to the oracle);
    positions within one posting list are unique, so the fancy-indexed
    ``+=`` is safe.
    """
    pls = query_postings(reader, terms)
    if not pls:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    cfg = reader.cfg
    dl_ids = reader._dl_ids
    dls = reader._dl

    def _dense(pl):
        if pl.dense_pos is None:
            # per-term, query-INDEPENDENT: BM25 contribution and doclen
            # position depend only on (term, doc); computed once per
            # posting-list load, reused by every query
            pl.dense_pos = np.searchsorted(dl_ids, pl.ids)
            pl.dense_contrib = term_contrib(
                pl.tfs.astype(np.float64),
                dls[pl.dense_pos].astype(np.float64),
                reader.avgdl, cfg.k1, cfg.b, pl.idf,
            )
        return pl

    # MAXSCORE candidate pruning (term-level upper bounds): a doc appearing
    # ONLY in non-essential terms — those whose summed max_score stays
    # below a top-k lower bound θ — can never reach the top k. θ comes
    # from the k-th best contribution of the highest-impact term (a valid
    # lower bound of the final k-th score: that term alone gives k docs
    # whose final scores are >= their own contribution >= θ).
    theta = None
    ess = non_ess = None
    if len(pls) > 1 and k < dl_ids.size:
        by_max = sorted(pls, key=lambda p: -p.max_score)
        top = _dense(by_max[0])
        if top.dense_contrib.size > k:
            # query-independent per (term, k): cache the kth-best contrib
            cache = getattr(top, "kth_cache", None)
            if cache is None:
                cache = top.kth_cache = {}
            theta = cache.get(k)
            if theta is None:
                theta = cache[k] = float(
                    np.partition(
                        top.dense_contrib, top.dense_contrib.size - k
                    )[top.dense_contrib.size - k]
                )
            suffix = np.cumsum(
                [p.max_score for p in by_max][::-1]
            )[::-1]
            # the prunable set is the maximal suffix J with Σ_J max < θ —
            # i.e. all j with suffix[j] < θ; a doc appearing only in J
            # cannot reach θ. Essential terms are the rest. (j=0 is always
            # essential: θ ≤ max_score_0 ≤ suffix[0].)
            ess = [p for j, p in enumerate(by_max) if suffix[j] >= theta]
            non_ess = [p for j, p in enumerate(by_max) if suffix[j] < theta]

    total_postings = sum(p.ids.size for p in pls)
    if non_ess and sum(p.ids.size for p in ess) * len(pls) < total_postings:
        # two-phase MAXSCORE: (A) scatter-add ONLY the essential lists
        # (typically the rare, high-idf terms — the stopword-scale lists
        # are never scatter-added) into a bound array; a candidate must
        # satisfy ess_score + Σ non-ess max >= θ. (B) rescore candidates
        # EXACTLY, per-term in ascending unicode order via searchsorted
        # into each (sorted) posting list — the same additions in the
        # same order as the unpruned path, so scores are bit-identical.
        # Routing guard: candidates ⊆ essential postings, so phase-B cost
        # is bounded by |ess postings| x n_terms lookups — only take this
        # path when that beats the full scatter. (Checked again on the
        # true candidate count below.)
        bound = np.zeros(dl_ids.size, dtype=np.float64)
        for p in ess:
            _dense(p)
            bound[p.dense_pos] += p.dense_contrib
        ub_non = float(np.sum([p.max_score for p in non_ess]))
        # a candidate must be in >=1 essential list (bound > 0) AND able
        # to reach θ with every non-essential upper bound granted
        if theta - ub_non > 0:
            cand_pos = np.flatnonzero(bound >= theta - ub_non)
        else:
            cand_pos = np.flatnonzero(bound)
        if cand_pos.size * len(pls) < total_postings:
            scores = np.zeros(cand_pos.size, dtype=np.float64)
            for pl in pls:  # ascending term order (query_postings sorts)
                _dense(pl)
                idx = np.searchsorted(pl.dense_pos, cand_pos)
                idx = np.minimum(idx, pl.dense_pos.size - 1)
                match = pl.dense_pos[idx] == cand_pos
                scores[match] += pl.dense_contrib[idx[match]]
            keep = scores >= theta
            return _rank_topk(dl_ids[cand_pos[keep]], scores[keep], k)
        # candidates not sparse enough: the full scatter-add is cheaper

    scores = np.zeros(dl_ids.size, dtype=np.float64)
    for pl in pls:  # ascending term order (query_postings sorts)
        _dense(pl)
        scores[pl.dense_pos] += pl.dense_contrib
    if theta is not None:
        nz = np.flatnonzero(scores >= theta)  # top-k all score >= θ
    else:
        nz = np.flatnonzero(scores)  # BM25 contribs are > 0: nonzero==match
    return _rank_topk(dl_ids[nz], scores[nz], k)


def block_max_wand(reader: SegmentReader, terms: list[str], k: int):
    """Block-Max WAND top-k (exact)."""
    pls = query_postings(reader, terms)
    if not pls:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    cfg = reader.cfg
    k1, b, avgdl = cfg.k1, cfg.b, reader.avgdl
    nt = len(pls)

    pos = [0] * nt                      # cursor: index into pl.ids
    blk = [0] * nt                      # cursor: current block index
    ub = [pl.max_score for pl in pls]   # global term upper bounds
    exhausted = [False] * nt

    # heap of (score, -doc_id); worst kept at heap[0]
    heap: list[tuple[float, int]] = []

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else -1.0

    def cur_doc(i: int) -> int:
        return pls[i].ids[pos[i]]

    def seek(i: int, target: int):
        """Advance cursor i to first doc >= target."""
        pl = pls[i]
        p = int(np.searchsorted(pl.ids, target, side="left"))
        if p >= pl.ids.size:
            exhausted[i] = True
            pos[i] = pl.ids.size
        else:
            pos[i] = p
            blk[i] = int(
                np.searchsorted(pl.block_starts, p, side="right") - 1
            )

    def score_doc(d: int) -> float:
        """Full score of doc d, summing in ascending-term order."""
        s = 0.0
        dl = float(reader.doclen(np.array([d], dtype=np.int64))[0])
        for i in range(nt):
            if not exhausted[i] and cur_doc(i) == d:
                tf = float(pls[i].tfs[pos[i]])
                s += term_contrib(tf, dl, avgdl, k1, b, pls[i].idf)
        return s

    while True:
        # order live terms by current doc
        live = [i for i in range(nt) if not exhausted[i]]
        if not live:
            break
        live.sort(key=cur_doc)
        # find pivot: smallest prefix whose UB sum reaches the threshold
        theta = threshold()
        acc = 0.0
        pivot = -1
        for j, i in enumerate(live):
            acc += ub[i]
            if acc >= theta:
                pivot = j
                break
        if pivot < 0:
            break  # even the full UB sum cannot reach the heap threshold
        d_pivot = cur_doc(live[pivot])

        if cur_doc(live[0]) == d_pivot:
            # all preceding cursors aligned on the pivot doc: block-max check
            bub = 0.0
            for i in live[: pivot + 1]:
                pl = pls[i]
                # ensure block cursor covers d_pivot
                while pl.block_last[blk[i]] < d_pivot:
                    blk[i] += 1
                bub += pl.block_max[blk[i]]
            j = pivot + 1
            while j < len(live) and cur_doc(live[j]) == d_pivot:
                i = live[j]
                pl = pls[i]
                while pl.block_last[blk[i]] < d_pivot:
                    blk[i] += 1
                bub += pl.block_max[blk[i]]
                j += 1
            if bub >= theta:
                s = score_doc(d_pivot)
                if len(heap) < k:
                    heapq.heappush(heap, (s, -d_pivot))
                elif (s, -d_pivot) > heap[0]:
                    heapq.heapreplace(heap, (s, -d_pivot))
            # advance every cursor sitting on the pivot doc
            for i in live:
                if not exhausted[i] and cur_doc(i) == d_pivot:
                    seek(i, d_pivot + 1)
        else:
            # advance the preceding term with the largest UB among those
            # strictly before the pivot doc (guarantees progress)
            behind = [i for i in live[:pivot] if cur_doc(i) < d_pivot]
            pick = max(behind, key=lambda i: ub[i])
            seek(pick, d_pivot)

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    ids = np.array([-d for _, d in out], dtype=np.int64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return ids, scores
