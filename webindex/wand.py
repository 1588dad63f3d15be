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


# empirical per-element cost of the two-phase MAXSCORE rescore relative
# to one dense scatter-add (see routing comment in exhaustive_topk)
_PHASE_B_COST = 4


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


def _dense(pl: PostingList, reader: SegmentReader):
    """Per-term, query-INDEPENDENT dense arrays: doclen-table positions and
    BM25 contributions (computed once per posting-list load, reused by
    every query and by both the exhaustive and block-max paths)."""
    if pl.dense_pos is None:
        cfg = reader.cfg
        pl.dense_pos = np.searchsorted(reader._dl_ids, pl.ids)
        pl.dense_contrib = term_contrib(
            pl.tfs.astype(np.float64),
            reader._dl[pl.dense_pos].astype(np.float64),
            reader.avgdl, cfg.k1, cfg.b, pl.idf,
        )
    return pl


def _theta_seed(top: PostingList, k: int):
    """Query-independent per (term, k): the k-th best contribution of the
    term AND the (sorted) doclen positions of its k best docs — the seed
    set used to tighten θ to an exact k-th-score lower bound. Cached on
    the posting list."""
    cache = getattr(top, "kth_cache", None)
    if cache is None:
        cache = top.kth_cache = {}
    ent = cache.get(k)
    if ent is None:
        part = np.argpartition(
            top.dense_contrib, top.dense_contrib.size - k
        )[top.dense_contrib.size - k:]
        kth = float(top.dense_contrib[part].min())
        seed_pos = np.sort(top.dense_pos[part])
        ent = cache[k] = (kth, seed_pos)
    return ent


def _refined_theta(pls, k: int, base_theta: float,
                   mask: np.ndarray | None = None) -> float:
    """Tighten θ to the k-th best EXACT score over the union of every
    term's top-k seed docs.

    The k-th best score of ANY ≥k-doc subset is a valid lower bound of
    the final k-th score, and this union (docs strong in at least one
    term) tracks the true top-k far better than a single term's seed —
    measured on the 3.1M-page bench corpus it cuts the θ-survivor set
    for stopword-scale multi-term queries from ~2.5M docs to ~k.
    Seeds are cached per (term, k); the union costs one small unique +
    one searchsorted per term. Exact seed scores are summed in the same
    ascending-term order as the main scoring paths.

    Under ``mask`` (live/filter bitset over doclen positions) the seed
    pool is restricted to docs PASSING the mask, so the k-th best seed
    score is a valid lower bound of the FILTERED k-th score (every seed
    is an attainable filtered result). ``base_theta`` must then come
    from masked scores too — callers pass -inf."""
    seeds = []
    for pl in pls:
        if pl.dense_contrib.size > k:
            seeds.append(_theta_seed(pl, k)[1])
        else:
            seeds.append(pl.dense_pos)
    seed_pos = np.unique(np.concatenate(seeds))
    if mask is not None:
        seed_pos = seed_pos[mask[seed_pos]]
    if seed_pos.size < k:
        return base_theta
    seed_sc = np.zeros(seed_pos.size, dtype=np.float64)
    for pl in pls:  # ascending term order (query_postings sorts)
        idx = np.searchsorted(pl.dense_pos, seed_pos)
        idx = np.minimum(idx, pl.dense_pos.size - 1)
        match = pl.dense_pos[idx] == seed_pos
        seed_sc[match] += pl.dense_contrib[idx[match]]
    kth = float(np.partition(seed_sc, seed_sc.size - k)[seed_sc.size - k])
    return max(base_theta, kth)


def _zero_scratch(reader: SegmentReader, n: int) -> np.ndarray:
    """Reader-owned reusable dense accumulator (zeroed slice of length n).

    A fresh 25 MB ``np.zeros`` per query re-mmaps every time, and on
    this host a large fresh allocation sporadically stalls for SECONDS
    (transparent-hugepage compaction under a multi-GB resident cache;
    a first-touch of 128 MB measured 11 s vs 0.1 s steady). One resident
    buffer + an explicit memset (~3 ms for 25 MB) makes latency stable.
    Callers are single-threaded per searcher and never hold the scratch
    across calls (results are gathered out by fancy indexing)."""
    buf = getattr(reader, "_dense_scratch", None)
    if buf is None or buf.size < n:
        buf = reader._dense_scratch = np.empty(n, dtype=np.float64)
    out = buf[:n]
    out.fill(0.0)
    return out


# --------------------------------------------------------------------------
# quantized-impact first pass (the dense-query fast path)
# --------------------------------------------------------------------------

#: uint16 accumulator budget for a query's summed quantized impacts —
#: headroom below 65535 for the +1-per-term ceil excess
_IMPACT_BUDGET = 60000
_IMPACT_MAX_TERMS = 8
#: per-posting-list cap on cached impact grids (each is 2 B/posting)
_IMPACT_CACHE_CAP = 4


def _impact_exponent(pls) -> int:
    """Smallest power-of-two grid 2**e such that the query's summed
    per-term quantized impacts fit the uint16 budget:
    Σ_t ceil(max_t / 2**e) <= Σ_t max_t / 2**e + n_terms <= BUDGET.

    A query-ADAPTIVE scale is what makes the first pass sharp: dense
    low-idf terms have max contributions ~100x below the index-wide idf
    bound, so an index-global grid wastes almost all of the integer
    range (measured: 220k candidates at the global grid vs ~6k here).
    Snapping to powers of two keeps the per-term quantized arrays
    cacheable — a term meets only a handful of distinct exponents
    across all queries."""
    import math

    summax = sum(p.max_score for p in pls)
    e = math.ceil(math.log2(summax / (_IMPACT_BUDGET - len(pls))))
    # exact overflow check on the true per-term ceils (the log bound
    # ignores flooring): bump until the worst-case sum fits
    while sum(math.ceil(p.max_score / 2.0 ** e) for p in pls) > 65535:
        e += 1
    return e


def _impacts(pl: PostingList, reader: SegmentReader, e: int) -> np.ndarray:
    """uint16 CEIL-quantized contributions on the 2**e grid (cached on
    the posting list per exponent, like the dense arrays — query-
    independent given e). iq * 2**e >= contrib, so integer sums are
    score upper bounds."""
    cache = getattr(pl, "impact_q", None)
    if cache is None:
        cache = pl.impact_q = {}
    arr = cache.get(e)
    if arr is None:
        if len(cache) >= _IMPACT_CACHE_CAP:
            cache.pop(next(iter(cache)))
        arr = cache[e] = np.ceil(
            pl.dense_contrib / 2.0 ** e
        ).astype(np.uint16)
    return arr


def _u16_scratch(reader: SegmentReader, n: int) -> np.ndarray:
    """Reader-owned reusable uint16 impact accumulator (same resident-
    buffer rationale as _zero_scratch; a 2-byte slot quarters the
    scatter's memory traffic vs the float64 dense array)."""
    buf = getattr(reader, "_impact_scratch", None)
    if buf is None or buf.size < n:
        buf = reader._impact_scratch = np.empty(n, dtype=np.uint16)
    out = buf[:n]
    out.fill(0)
    return out


#: byte budget for a reader's resident contribution-lookup tables (each
#: costs 2 bytes per resident doc, so the table COUNT scales inversely
#: with corpus size: ~80 tables at 3.2M docs, thousands at bench scale;
#: shard-scoped readers get proportionally more tables per byte)
_CONTRIB_LUT_BYTES = 512 * 2**20


def _contrib_lut_cap(dl_size: int) -> int:
    return max(8, _CONTRIB_LUT_BYTES // max(2 * dl_size, 1))


#: bound on the reader-level strike/backoff bookkeeping dict (~50 B per
#: term); a term evicted from it restarts at strike 1, which only costs
#: one extra deferred build — never correctness
_LUT_STRIKES_CAP = 1 << 16


def _contrib_lut(pl: PostingList, reader: SegmentReader):
    """(uint16 position->code table, distinct contribs) for a term, or
    None when the table isn't (yet) worth holding.

    BM25 contributions are highly discrete (dense web terms measure ~1k
    distinct values: tf and doclen are small ints), so a
    corpus-position-indexed uint16 code table decodes a term's exact
    contribution with ONE linear gather — replacing the per-candidate
    binary search in the tie-plateau rescore (measured 37 -> ~6 ms at
    200k candidates). BUT a table costs ~120 ms to build (np.unique
    over the postings) and only pays through REUSE, so:

    - a term must be rescored twice before its table is built (strike
      counter — the binary-search fallback serves the first hit);
    - the reader-level LRU bounds resident bytes (2 B/doc per table;
      shard-scoped readers bound table size like the dense arrays);
    - an EVICTED term's strike requirement doubles each rebuild
      (exponential backoff), so a workload whose hot-term set exceeds
      the cap degrades to the binary-search path instead of thrashing
      rebuild-per-query (measured: p95 261 ms under a 50-query mixed
      load vs 38 ms same-query repeats before this guard).

    Strike/backoff counters live on the READER keyed by term (not on
    the transient PostingList): a PL evicted from the postings cache
    and reloaded must resume at its true strike level, not restart at
    strike 2 with a fresh backoff — and the LRU is touched on HITS so
    eviction order is least-recently-USED, not build order."""
    ent = getattr(pl, "contrib_lut", None)
    if ent is not None:
        if ent == "none":
            return None
        lru = getattr(reader, "_contrib_lut_lru", None)
        if lru is not None and lru.get(pl.term) is pl:
            lru.move_to_end(pl.term)
        return ent
    st = getattr(reader, "_lut_strikes", None)
    if st is None:
        st = reader._lut_strikes = {}
    rec = st.get(pl.term)
    if rec == "none":  # distinct-value overflow is a property of the term
        pl.contrib_lut = "none"
        return None
    if rec is None:
        rec = st[pl.term] = [1, 0]  # [builds, hits]
        if len(st) > _LUT_STRIKES_CAP:
            st.pop(next(iter(st)))
    rec[1] += 1
    if rec[1] < 2 ** rec[0]:
        return None
    uniq, codes = np.unique(pl.dense_contrib, return_inverse=True)
    if uniq.size > 65534:
        pl.contrib_lut = "none"
        st[pl.term] = "none"
        return None
    lru = getattr(reader, "_contrib_lut_lru", None)
    if lru is None:
        from collections import OrderedDict

        lru = reader._contrib_lut_lru = OrderedDict()
    lut = np.zeros(reader._dl_ids.size, dtype=np.uint16)
    lut[pl.dense_pos] = codes.astype(np.uint16) + 1  # 0 = term absent
    ent = pl.contrib_lut = (lut, uniq)
    rec[0] += 1
    rec[1] = 0
    stale = lru.pop(pl.term, None)
    if stale is not None and stale is not pl:
        stale.contrib_lut = None  # reloaded term: release the stale table
    lru[pl.term] = pl
    if len(lru) > _contrib_lut_cap(reader._dl_ids.size):
        _, old = lru.popitem(last=False)
        old.contrib_lut = None  # rebuildable; frees the byte table
    return ent


def _rescore_exact(pls, cand_pos: np.ndarray,
                   reader: SegmentReader | None = None) -> np.ndarray:
    """Exact float64 scores of candidate doclen positions, summed
    per-term in ascending unicode order (``pls`` comes from
    query_postings, already sorted) — bit-identical to the dense
    scatter path and the pure-Python oracle.

    Per term, the contribution-lookup byte table (:func:`_contrib_lut`)
    answers candidates with one gather over SORTED positions; terms
    with too many distinct contributions fall back to per-candidate
    binary search (which measures faster here than rank-table or
    membership gathers — sorted candidates give the probe sequence
    high locality)."""
    scores = np.zeros(cand_pos.size, dtype=np.float64)
    for pl in pls:
        ent = _contrib_lut(pl, reader) if reader is not None else None
        if ent is not None:
            lut, uniq = ent
            codes = lut[cand_pos]
            m = codes > 0
            scores[m] += uniq[codes[m] - 1]
            continue
        idx = np.searchsorted(pl.dense_pos, cand_pos)
        idx = np.minimum(idx, pl.dense_pos.size - 1)
        match = pl.dense_pos[idx] == cand_pos
        scores[match] += pl.dense_contrib[idx[match]]
    return scores


def _quantized_topk(reader: SegmentReader, pls, k: int, theta: float,
                    mask: np.ndarray | None):
    """Dense-query top-k via a quantized-impact integer first pass.

    The float64 full scatter is memory-bound (8-byte read-modify-write
    per posting into a corpus-sized array); accumulating cached uint16
    ceil-quantized impacts instead quarters that traffic. The integer
    sum is a per-doc score UPPER bound (each iq * scale >= contrib), so
    ``acc >= floor(θ/scale)`` selects a superset of every doc with true
    score >= θ; the superset is tiny (quantization slack is
    n_terms * 2**e ≈ n_terms * Σ max_t / 60000 BM25 points) and gets
    exact-rescored in pinned ascending-term order — final scores and
    ranks bit-identical to the unquantized path. Returns None when the
    integer threshold degenerates so the caller falls back."""
    e = _impact_exponent(pls)
    s = 2.0 ** e
    T = int(theta / s)  # floor: acc >= T is a superset of acc*s >= θ
    if T < 1:
        return None
    dl_ids = reader._dl_ids
    acc = _u16_scratch(reader, dl_ids.size)
    for pl in pls:
        acc[pl.dense_pos] += _impacts(pl, reader, e)
    cand_pos = np.flatnonzero(acc >= T)
    if mask is not None:
        cand_pos = cand_pos[mask[cand_pos]]
    scores = _rescore_exact(pls, cand_pos, reader)
    keep = scores >= theta
    return _rank_topk(dl_ids[cand_pos[keep]], scores[keep], k)


def exhaustive_constrained(reader: SegmentReader, terms: list[str], k: int,
                           mask: np.ndarray | None = None,
                           require_all: bool = False,
                           min_match: int | None = None,
                           boosts: dict[str, float] | None = None,
                           neg_terms: list[str] | None = None,
                           neg_boost: tuple[list[str], float] | None = None,
                           field_factor=None,
                           dis_max: float | None = None):
    """Filtered / conjunctive exhaustive top-k (the ES bool-query analog:
    ``match`` + ``filter`` context, ``operator: and``,
    ``minimum_should_match`` and per-term query boosts — the query
    surface the reference's BM25 runs sit on top of, SURVEY.md §2.6 K6).

    Identical per-term contributions and ascending-unicode summation order
    as :func:`exhaustive_topk`; candidate selection additionally requires
    ``mask`` (a docvalues predicate bitset aligned to the reader's doclen
    table, see ``SegmentReader.filter_mask``), presence of EVERY distinct
    query term (``require_all``) or of at least ``min_match`` of them, and
    ``boosts`` scales each term's contribution ((idf·tf_norm)·boost,
    boosts must be > 0 — the pinned float-op order the SQL oracle
    reproduces). MAXSCORE/WAND pruning is
    deliberately OFF here: θ bounds derive from *unfiltered* top-k scores
    and are not valid lower bounds for the filtered k-th score — pruning
    with them could drop qualifying docs. Cost is one scatter-add over the
    query's postings, the same as the unpruned exhaustive path.
    """
    if boosts and any(b <= 0 for b in boosts.values()):
        raise ValueError("boosts must be > 0 (scores stay positive — the "
                         "match set is the nonzero-score set)")
    if dis_max is not None and not 0.0 <= dis_max <= 1.0:
        raise ValueError("dis_max tie_breaker must be in [0, 1]")
    uniq = sorted(set(terms))
    pls = query_postings(reader, uniq)
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    if not pls:
        return empty
    need = len(uniq) if require_all else max(1, int(min_match or 1))
    if len(pls) < need:
        return empty  # too many query terms match no document at all
    dl_ids = reader._dl_ids
    scores = _zero_scratch(reader, dl_ids.size)
    hits = None
    if need > 1 and len(pls) > 1:
        # reader-owned reusable hit counter (same fresh-allocation stall
        # rationale as _zero_scratch)
        buf = getattr(reader, "_hits_scratch", None)
        if buf is None or buf.size < dl_ids.size:
            buf = reader._hits_scratch = np.empty(dl_ids.size, np.int16)
        hits = buf[: dl_ids.size]
        hits.fill(0)
    maxsc = (
        np.zeros(dl_ids.size, dtype=np.float64) if dis_max is not None
        else None
    )
    for pl in pls:  # ascending term order (query_postings sorts)
        _dense(pl, reader)
        contrib = pl.dense_contrib
        if boosts:
            b = boosts.get(pl.term, 1.0)
            if b != 1.0:
                contrib = contrib * b
        scores[pl.dense_pos] += contrib
        if maxsc is not None:
            # per-term best clause for the dis_max combine below
            maxsc[pl.dense_pos] = np.maximum(maxsc[pl.dense_pos], contrib)
        if hits is not None:
            hits[pl.dense_pos] += 1
    sel = np.flatnonzero(scores)  # BM25 contribs are > 0: nonzero==match
    if hits is not None:
        sel = sel[hits[sel] >= need]
    if mask is not None:
        sel = sel[mask[sel]]
    if neg_terms:
        # must_not (ES bool negation): drop docs containing ANY negative
        # term; exclusion is per-document, so it composes exactly with
        # the sharded scatter-gather merge. Survivor scores are the
        # positive clauses' sums, untouched (ES semantics: must_not is a
        # filter-context clause, it never contributes to the score).
        excl = np.zeros(dl_ids.size, dtype=bool)
        for pl in query_postings(reader, sorted(set(neg_terms))):
            _dense(pl, reader)
            excl[pl.dense_pos] = True
        sel = sel[~excl[sel]]
    vals = scores[sel]
    if maxsc is not None:
        # ES dis_max query: score = best clause + tie_breaker * (sum of
        # the other clauses). Computed as max + tb * (sum - max) with the
        # pinned ascending-term sum — the float-op order the SQL oracle
        # reproduces (list_max + tb * (list_sum - list_max)).
        mx = maxsc[sel]
        vals = mx + dis_max * (vals - mx)
    if neg_boost is not None:
        # ES boosting query: DEMOTE (not exclude) docs containing any
        # negative term — one multiply of the summed score by the
        # negative_boost factor (per-document, so the sharded merge
        # composes; the pinned summation order is untouched)
        nb_terms, factor = neg_boost
        demote = np.zeros(dl_ids.size, dtype=bool)
        for pl in query_postings(reader, sorted(set(nb_terms))):
            _dense(pl, reader)
            demote[pl.dense_pos] = True
        vals = np.where(demote[sel], vals * factor, vals)
    if field_factor is not None:
        # ES function_score field_value_factor (score_mode=multiply):
        # final = score * (1.0 + weight * docvalue). Pinned float-op
        # order (w*v, 1+x, score*f — all exact IEEE doubles) so the SQL
        # oracle reproduces it bit for bit; per-document, so the sharded
        # merge composes. Docs lacking the docvalue use missing=0 (ES
        # ``missing`` param) -> factor 1.0.
        col, w = field_factor
        reader._load_docvalues([col])
        arr, valid = reader._dv[col]
        dv = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        fac = 1.0 + w * np.where(valid[sel], dv[sel], 0.0)
        vals = vals * fac
    return _rank_topk(dl_ids[sel], vals, k)


def match_positions(reader: SegmentReader, terms: list[str],
                    mask: np.ndarray | None = None,
                    require_all: bool = False) -> np.ndarray:
    """Dense doclen-table positions of ALL docs matching the query (OR or
    AND semantics), respecting an optional docvalues mask — the candidate
    set behind faceted aggregations (no scoring). One int16 scatter-add
    over the query's postings."""
    uniq = sorted(set(terms))
    pls = query_postings(reader, uniq)
    if not pls or (require_all and len(pls) < len(uniq)):
        return np.empty(0, np.int64)
    n = reader._dl_ids.size
    hits = np.zeros(n, dtype=np.int16)
    for pl in pls:
        _dense(pl, reader)
        hits[pl.dense_pos] += 1
    need = len(pls) if require_all else 1
    sel = np.flatnonzero(hits >= need)
    if mask is not None:
        sel = sel[mask[sel]]
    return sel


def exhaustive_topk(reader: SegmentReader, terms: list[str], k: int,
                    mask: np.ndarray | None = None):
    """Score every doc containing any query term; exact top-k.

    Accumulates into a dense array indexed by the doc's position in the
    (sorted) doclen table — one searchsorted per term, no concat/unique of
    the candidate union (which dominated at millions of candidates).
    Summation stays ascending-term per doc (bit-identical to the oracle);
    positions within one posting list are unique, so the fancy-indexed
    ``+=`` is safe.

    ``mask`` (optional live/predicate bitset over doclen positions)
    keeps PRUNING valid under filtering: θ derives from masked seed
    scores only (every seed an attainable filtered result — see
    _refined_theta), candidates are mask-filtered before exact rescore,
    and survivor scores are the same ascending-term sums — bit-identical
    to exhaustive_constrained(mask=...) for the pure-filter case, which
    previously had no pruned path at all (every query on an index with
    tombstones paid the full scatter).
    """
    pls = query_postings(reader, terms)
    if not pls:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    dl_ids = reader._dl_ids

    if len(pls) == 1:
        # single term: the posting list IS the score vector — no dense
        # accumulator, no candidate scan, just top-k over contributions
        # (identical values/order to the scatter path by construction)
        pl = _dense(pls[0], reader)
        if mask is None:
            return _rank_topk(pl.ids, pl.dense_contrib, k)
        keep = mask[pl.dense_pos]
        return _rank_topk(pl.ids[keep], pl.dense_contrib[keep], k)

    # MAXSCORE candidate pruning (term-level upper bounds): a doc appearing
    # ONLY in non-essential terms — those whose summed max_score stays
    # below a top-k lower bound θ — can never reach the top k. θ comes
    # from the k-th best contribution of the highest-impact term (a valid
    # lower bound of the final k-th score: that term alone gives k docs
    # whose final scores are >= their own contribution >= θ).
    theta = None
    ess = non_ess = None
    if k < dl_ids.size:
        by_max = sorted(pls, key=lambda p: -p.max_score)
        top = _dense(by_max[0], reader)
        if top.dense_contrib.size > k:
            for pl in pls:
                _dense(pl, reader)
            # θ refinement: k-th best exact score over the union of all
            # terms' seed docs (see _refined_theta). Under a mask the
            # top term's unmasked k-th contribution is NOT a valid
            # filtered bound — seed from -inf and let the masked seed
            # set provide (or withhold) the bound.
            if mask is None:
                theta = _refined_theta(pls, k, _theta_seed(top, k)[0])
            else:
                theta = _refined_theta(pls, k, -np.inf, mask=mask)
                if not np.isfinite(theta):
                    theta = None
        if theta is not None:
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
    # phase A pays only when the essential lists are genuinely sparse:
    # its worst-case candidate set is the essential postings themselves,
    # so charge the full phase-B rate up front — borderline-dense
    # queries otherwise burn a float64 scatter here and STILL fall
    # through to the quantized pass below (measured ~20 ms wasted)
    if non_ess and (sum(p.ids.size for p in ess) * len(pls)
                    * _PHASE_B_COST < total_postings):
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
        bound = _zero_scratch(reader, dl_ids.size)
        for p in ess:
            _dense(p, reader)
            bound[p.dense_pos] += p.dense_contrib
        ub_non = float(np.sum([p.max_score for p in non_ess]))
        # a candidate must be in >=1 essential list (bound > 0) AND able
        # to reach θ with every non-essential upper bound granted. The
        # threshold gets a relative float slack: `bound` sums essential
        # contributions in max-score order while θ comes from exact
        # ascending-term sums, so a doc tied exactly at θ could sit one
        # ulp below the unslacked cut — extra candidates are harmless
        # (phase B rescores exactly and re-filters on θ), missing ones
        # would break bit-identity with the full-scatter path.
        thr = theta - ub_non - 1e-9 * abs(theta)
        if thr > 0:
            cand_pos = np.flatnonzero(bound >= thr)
        else:
            cand_pos = np.flatnonzero(bound)
        if mask is not None:
            cand_pos = cand_pos[mask[cand_pos]]
        # Routing cost model: one phase-B candidate costs ~4-5x one
        # scatter-added posting (searchsorted binary probes + compare +
        # two gathers + masked add, measured 53ns/lookup vs 9ns/posting
        # on the 3.1M-doc bench index), so a marginal candidate set must
        # fall through to the full scatter — an all-stopword query with
        # cand ~= ess postings ran 480ms two-phase vs 76ms scatter.
        if cand_pos.size * len(pls) * _PHASE_B_COST < total_postings:
            scores = _rescore_exact(pls, cand_pos, reader)
            keep = scores >= theta
            return _rank_topk(dl_ids[cand_pos[keep]], scores[keep], k)
        # candidates not sparse enough: the full scatter-add is cheaper

    # quantized-impact pass: quarter-traffic uint16 scatter selecting a
    # tiny exact-rescored superset — the dense-query path where MAXSCORE
    # term pruning degenerates (all terms essential). Falls through to
    # the float64 scatter when no θ exists, the term count exceeds the
    # accumulator's overflow budget, or the query is SMALL — below
    # ~500k postings the plain scatter is already sub-millisecond and
    # the pass's fixed costs (θ seeds, impact/LUT cache builds, second
    # candidate scan) dominate (measured: sf0.1 bench query p50 doubled
    # with the pass unconditionally on).
    if (theta is not None and len(pls) <= _IMPACT_MAX_TERMS
            and total_postings >= 500_000):
        for pl in pls:
            _dense(pl, reader)
        res = _quantized_topk(reader, pls, k, theta, mask)
        if res is not None:
            return res

    # (reuses — and re-zeros — the same scratch `bound` may occupy;
    # `bound` is never read past this point)
    scores = _zero_scratch(reader, dl_ids.size)
    for pl in pls:  # ascending term order (query_postings sorts)
        _dense(pl, reader)
        scores[pl.dense_pos] += pl.dense_contrib
    if theta is not None:
        nz = np.flatnonzero(scores >= theta)  # top-k all score >= θ
    else:
        nz = np.flatnonzero(scores)  # BM25 contribs are > 0: nonzero==match
    if mask is not None:
        nz = nz[mask[nz]]
    return _rank_topk(dl_ids[nz], scores[nz], k)


def block_max_wand(reader: SegmentReader, terms: list[str], k: int,
                   stats: dict | None = None,
                   mask: np.ndarray | None = None):
    """Block-Max top-k (exact), fully vectorized — no per-document and no
    per-interval Python loop.

    The docID space is cut at the union of every term's block boundaries;
    sparse terms additionally contribute per-posting boundaries (d-1, d),
    so the gaps BETWEEN rare-term postings form their own intervals — the
    vectorized analog of WAND's doc-at-a-time pivoting on rare terms.
    Within one interval each term's postings share one covering block, so
    the interval's score upper bound is the sum of the covering block
    maxima of terms that actually have a posting there.

    θ = the k-th best contribution of the highest-impact term (cached,
    query-independent): a valid lower bound of the final k-th score.
    Every interval with UB < θ is pruned wholesale; the surviving
    intervals' postings are gathered per term and scored EXACTLY with
    per-doc sums in ascending-term order — bit-identical to the
    exhaustive path and the pure-Python oracle. All stages are numpy
    kernels whose cost is proportional to posting counts, never to the
    corpus size.

    ``stats`` (optional) receives {"n_scored": docs fully scored,
    "n_candidates": OR-set size bound, "n_intervals": intervals kept}.

    ``mask`` (live/predicate bitset) composes the same way as in
    :func:`exhaustive_topk`: masked θ seeds, candidates mask-filtered
    before exact scoring — results bit-identical to
    exhaustive_constrained(mask=...) for the pure-filter case.
    """
    pls = query_postings(reader, terms)
    if not pls:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    dl_ids = reader._dl_ids
    for pl in pls:
        _dense(pl, reader)

    # θ from the top term's k-th best contribution (same bound the
    # exhaustive MAXSCORE path uses; cached per (term, k)); under a mask
    # the bound must come from masked seed scores (see exhaustive_topk)
    by_max = sorted(pls, key=lambda p: -p.max_score)
    top = by_max[0]
    theta = None
    if len(pls) > 1 and top.dense_contrib.size > k:
        if mask is None:
            theta = _refined_theta(pls, k, _theta_seed(top, k)[0])
        else:
            theta = _refined_theta(pls, k, -np.inf, mask=mask)
            if not np.isfinite(theta):
                theta = None
    if len(pls) == 1:
        # single term: no cross-term bound to prune with — the dense
        # exhaustive scorer is the right kernel
        ids, scores = exhaustive_topk(reader, terms, k, mask=mask)
        if stats is not None:
            stats["n_scored"] = int(sum(pl.ids.size for pl in pls))
            stats["n_intervals"] = 0
            stats["n_candidates"] = stats["n_scored"]
        return ids, scores
    if theta is None:
        theta = -np.inf  # seeded from exact scores of the top-UB prefix

    # interval ends = union of block-last docIDs + per-posting boundaries
    # of sparse terms ("sparse" = posting count comparable to the total
    # block count, so the added boundaries cost no more than the block
    # boundaries already do)
    n_blocks_total = sum(p.block_last.size for p in pls)
    pieces = [pl.block_last for pl in pls]
    for pl in pls:
        if pl.ids.size <= 4 * n_blocks_total:
            pieces.append(pl.ids)
            pieces.append(pl.ids - 1)
    ends = np.union1d(np.concatenate(pieces), np.empty(0, np.int64))
    ends = ends[ends >= 0]
    n_int = ends.size
    starts_doc = np.concatenate(([0], ends[:-1] + 1))  # interval start docID

    # Per-term, at INTERVAL granularity (O(n_int log postings), never
    # O(postings)): posting-count per interval via two searchsorted cuts,
    # and the covering block's max charged ONLY to intervals that contain
    # a posting (a sparse term's block can span a huge docID range;
    # charging its max everywhere would destroy pruning). Intervals never
    # straddle a term's block boundary, so the covering block is unique.
    ub = np.zeros(n_int, dtype=np.float64)
    cnt_int = np.zeros(n_int, dtype=np.int64)
    cuts_all = []
    for pl in pls:
        cuts = np.searchsorted(pl.ids, np.append(starts_doc, ends[-1] + 1))
        cuts_all.append(cuts)
        cnt_t = np.diff(cuts)
        bidx = np.minimum(
            np.searchsorted(pl.block_last, starts_doc, side="left"),
            pl.block_last.size - 1,
        )
        ub += np.where(cnt_t > 0, pl.block_max[bidx], 0.0)
        cnt_int += cnt_t

    def _score_intervals(keep_int: np.ndarray):
        """Exactly score every doc lying in a kept interval.

        Every posting of a doc shares the doc's interval, so kept docs
        are scored on ALL their terms, per-doc in ascending-term order —
        bit-identical to the exhaustive path. The per-term gather is a
        vectorized multi-slice (no Python loop over intervals).
        """
        kept = np.flatnonzero(keep_int)
        sel = []
        for pl, cuts in zip(pls, cuts_all):
            s_ = cuts[kept]
            e_ = cuts[kept + 1]
            lens = e_ - s_
            tot = int(lens.sum())
            if tot == 0:
                sel.append(np.empty(0, np.int64))
                continue
            nz = lens > 0
            s_nz, lens_nz = s_[nz], lens[nz]
            off = np.concatenate(([0], np.cumsum(lens_nz)[:-1]))
            idx = np.arange(tot) + np.repeat(s_nz - off, lens_nz)
            sel.append(idx)
        if not any(x.size for x in sel):
            return (np.empty(0, np.int64), np.empty(0, np.float64))
        cand_pos = np.unique(
            np.concatenate([pl.dense_pos[x] for pl, x in zip(pls, sel)
                            if x.size])
        )
        if mask is not None:
            # masked-out docs never score (θ comes from masked seeds, so
            # dropping them before the scatter keeps k-th bounds valid)
            cand_pos = cand_pos[mask[cand_pos]]
            if cand_pos.size == 0:
                return (np.empty(0, np.int64), np.empty(0, np.float64))
        sc = np.zeros(cand_pos.size, dtype=np.float64)
        for pl, x in zip(pls, sel):
            if x.size == 0:
                continue  # ascending term order preserved (zip keeps order)
            dpos = pl.dense_pos[x]
            at = np.searchsorted(cand_pos, dpos)
            if mask is not None:
                # some gathered postings belong to masked-out docs and
                # are absent from cand_pos — guard the scatter
                at = np.minimum(at, cand_pos.size - 1)
                ok = cand_pos[at] == dpos
                sc[at[ok]] += pl.dense_contrib[x][ok]
            else:
                sc[at] += pl.dense_contrib[x]
        return cand_pos, sc

    # Round 1: exactly score the highest-UB interval prefix (enough
    # postings to surely cover >= k docs) and tighten θ to the k-th best
    # EXACT score found — this seeds pruning even when no single term is
    # long enough to provide an a-priori bound.
    kept0 = ub >= theta
    cand_ints = np.flatnonzero(kept0)
    order = cand_ints[
        np.lexsort((cand_ints, -ub[cand_ints]))
    ]  # UB desc, stable
    cum = np.cumsum(cnt_int[order])
    seed_n = int(np.searchsorted(cum, max(4 * k, 256))) + 1
    seed_ints = order[:seed_n]
    seed_mask = np.zeros(n_int, dtype=bool)
    seed_mask[seed_ints] = True
    pos_a, sc_a = _score_intervals(seed_mask)
    if sc_a.size >= k:
        kth = float(
            np.partition(sc_a, sc_a.size - k)[sc_a.size - k]
        )
        theta = max(theta, kth)

    # Round 2: remaining intervals must beat the tightened θ
    rest_mask = kept0 & ~seed_mask & (ub >= theta)
    pos_b, sc_b = _score_intervals(rest_mask)
    cand_pos = np.concatenate([pos_a, pos_b])
    scores = np.concatenate([sc_a, sc_b])
    if stats is not None:
        stats["n_scored"] = int(cand_pos.size)
        stats["n_intervals"] = int(seed_mask.sum() + rest_mask.sum())
        stats["n_candidates"] = int(sum(pl.ids.size for pl in pls))
    return _rank_topk(dl_ids[cand_pos], scores, k)
