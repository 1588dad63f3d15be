"""Index-only phrase queries over a positional index (the Lucene/ES
``match_phrase`` execution model: postings store term positions, so a
phrase is answered from the index alone — no corpus access).

Built on ``IndexConfig(store_positions=True)`` postings
(webindex/build.py: per-posting delta+varbyte position runs riding the
same checkpoint-relay shuffle as docIDs/tfs) and decoded by
``SegmentReader.positions``. The matching kernel is fully vectorized
across ALL candidate docs at once:

1. conjunctive candidates = sorted intersection of the phrase terms'
   posting docID arrays (cost bounded by the rarest term's df);
2. for every (term, phrase-offset) pair, build 64-bit keys
   ``cand_rank << 32 | (position - offset)`` over the candidates'
   positions (one multi-slice gather per term, shared across its
   offsets) — a key names "phrase could start at this position in this
   doc, as witnessed by this term";
3. phrase starts = ``np.intersect1d`` across all (term, offset) key
   sets; matched docs = unique high halves.

Scores are the BM25 sums of the phrase's unique terms in ascending
unicode order — bit-identical to the ``match``/lazy-verify paths
(webindex/phrase.py), which tests/test_query_lang.py asserts.

Position values must fit 32 bits (docs shorter than 2^32 tokens — 4
orders of magnitude above any web page).
"""

from __future__ import annotations

import numpy as np

from webindex.segments import SegmentReader
from webindex.wand import _dense, _rank_topk

_EMPTY = (np.empty(0, np.int64), np.empty(0, np.float64))


def _gather_positions(pos_vals: np.ndarray, pos_ends: np.ndarray,
                      tfs: np.ndarray, rows: np.ndarray):
    """Multi-slice gather: positions of posting-rows ``rows`` flattened,
    plus the candidate-rank of each gathered position."""
    lens = tfs[rows]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = (pos_ends[rows] - lens).astype(np.int64)
    # flat[i] = starts[row(i)] + (i - first_i_of_row): standard vectorized
    # ragged gather
    row_of = np.repeat(np.arange(rows.size), lens)
    first = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idx = starts[row_of] + (np.arange(total) - first[row_of])
    return pos_vals[idx], row_of


def phrase_topk(reader: SegmentReader, phrase_tokens: list[str], k: int,
                mask: np.ndarray | None = None):
    """Exact top-k docs containing ``phrase_tokens`` consecutively in
    order, scored by BM25 over the phrase's unique terms. ``mask`` is an
    optional docvalues bitset (``SegmentReader.filter_mask``) — filtered
    phrase queries compose for free because matching is per-document."""
    if not phrase_tokens:
        return _EMPTY
    uniq = sorted(set(phrase_tokens))
    pls = []
    for t in uniq:
        pl = reader.postings(t)
        if pl is None:
            return _EMPTY  # a phrase term matches no document
        if pl.pos_blocks is None:
            raise ValueError(
                "index has no positions (built without store_positions); "
                "use webindex.phrase.phrase_search lazy verification"
            )
        pls.append(pl)
    # conjunctive candidate docs (all arrays ascending + unique)
    cand = pls[0].ids
    for pl in pls[1:]:
        cand = np.intersect1d(cand, pl.ids, assume_unique=True)
        if cand.size == 0:
            return _EMPTY

    offsets: dict[str, list[int]] = {}
    for j, t in enumerate(phrase_tokens):
        offsets.setdefault(t, []).append(j)

    survivors = None
    for t, pl in zip(uniq, pls):
        pos_vals, pos_ends = reader.positions(t)
        rows = np.searchsorted(pl.ids, cand)  # every cand is present
        flat_pos, row_of = _gather_positions(
            pos_vals, pos_ends, pl.tfs.astype(np.int64), rows
        )
        for off in offsets[t]:
            ok = flat_pos >= off
            keys = (row_of[ok].astype(np.int64) << 32) | (
                flat_pos[ok] - off
            )
            survivors = (
                keys
                if survivors is None
                else np.intersect1d(survivors, keys, assume_unique=True)
            )
            if survivors.size == 0:
                return _EMPTY
    matched = cand[np.unique(survivors >> 32)]
    return _score_matched(reader, pls, matched, k, mask)


def _score_matched(reader: SegmentReader, pls, matched: np.ndarray, k: int,
                   mask: np.ndarray | None):
    """Mask filter + exact BM25 scores over ``pls`` (ascending-term order)
    for the matched docs — shared by the phrase and span_near kernels so
    their rankings are bit-identical to the ``match`` paths."""
    if mask is not None:
        pos_in_dl = np.searchsorted(reader._dl_ids, matched)
        matched = matched[mask[pos_in_dl]]
    if matched.size == 0:
        return _EMPTY
    # exact scores: ascending-term sums (bit-identical to the match path)
    scores = np.zeros(matched.size, dtype=np.float64)
    for pl in pls:  # callers pass posting lists in ascending term order
        _dense(pl, reader)
        idx = np.searchsorted(pl.ids, matched)
        scores += pl.dense_contrib[idx]
    return _rank_topk(matched, scores, k)


def span_first_topk(reader: SegmentReader, token: str, k: int, *,
                    end: int = 10, mask: np.ndarray | None = None):
    """ES/Lucene ``span_first``: docs where ``token`` occurs at a
    position STRICTLY BEFORE ``end`` (a match within the document's
    opening window — title-ish relevance without a separate field).
    Scored like the other positional kernels: the term's own BM25
    contribution. One posting-list scan + one vectorized positions
    gather; candidates whose earliest occurrence is late are dropped
    without touching scores."""
    if end <= 0:
        return _EMPTY
    pl = reader.postings(token)
    if pl is None:
        return _EMPTY
    if pl.pos_blocks is None:
        raise ValueError(
            "index has no positions (built without store_positions)"
        )
    pos_vals, pos_ends = reader.positions(token)
    rows = np.arange(pl.ids.size)
    flat_pos, row_of = _gather_positions(
        pos_vals, pos_ends, pl.tfs.astype(np.int64), rows
    )
    hit_rows = np.unique(row_of[flat_pos < end])
    matched = pl.ids[hit_rows]
    return _score_matched(reader, [pl], matched, k, mask)


def span_near_topk(reader: SegmentReader, tokens: list[str], k: int, *,
                   slop: int = 0, mask: np.ndarray | None = None):
    """ES/Lucene ``span_near(in_order=true, slop=N)`` — exact top-k docs
    containing the tokens IN ORDER at strictly increasing positions
    p0 < p1 < ... < p_{m-1} with total stretch
    ``(p_{m-1} - p0) - (m - 1) <= slop`` (Lucene's span-extent slop;
    ``slop=0`` is exactly ``match_phrase``). Scored like the phrase
    kernels: BM25 sums of the unique terms, ascending unicode order.

    Kernel: greedy chain, fully vectorized across every start position of
    every candidate doc at once. For each occurrence of ``tokens[0]``
    (64-bit keys ``cand_rank << 32 | position``), each subsequent term
    advances to its smallest position strictly after the current chain
    end (one ``np.searchsorted`` per term over that term's key array) —
    greedy minimizes the chain end for a given start, so a start matches
    iff its greedy chain spans within the window (exchange argument).
    Cost: (m - 1) searchsorted rounds over |starts| keys, bounded by the
    rarest term's df like the exact-phrase kernel."""
    if not tokens:
        return _EMPTY
    if slop == 0:
        return phrase_topk(reader, tokens, k, mask=mask)
    uniq = sorted(set(tokens))
    pls = []
    for t in uniq:
        pl = reader.postings(t)
        if pl is None:
            return _EMPTY
        if pl.pos_blocks is None:
            raise ValueError(
                "index has no positions (built without store_positions)"
            )
        pls.append(pl)
    cand = pls[0].ids
    for pl in pls[1:]:
        cand = np.intersect1d(cand, pl.ids, assume_unique=True)
        if cand.size == 0:
            return _EMPTY

    # per-unique-term key arrays over the candidates (ascending: row_of is
    # grouped ascending and positions ascend within each posting)
    keys: dict[str, np.ndarray] = {}
    for t, pl in zip(uniq, pls):
        pos_vals, pos_ends = reader.positions(t)
        rows = np.searchsorted(pl.ids, cand)
        flat_pos, row_of = _gather_positions(
            pos_vals, pos_ends, pl.tfs.astype(np.int64), rows
        )
        keys[t] = (row_of.astype(np.int64) << 32) | flat_pos

    m = len(tokens)
    cur = keys[tokens[0]]
    start_pos = cur & 0xFFFFFFFF
    for t in tokens[1:]:
        if cur.size == 0:
            return _EMPTY
        b = keys[t]
        idx = np.searchsorted(b, cur + 1)
        ok = idx < b.size
        nxt = b[np.minimum(idx, max(b.size - 1, 0))]
        ok &= (nxt >> 32) == (cur >> 32)  # stay within the same doc
        cur, start_pos, nxt = cur[ok], start_pos[ok], nxt[ok]
        cur = nxt
    if cur.size == 0:
        return _EMPTY
    within = ((cur & 0xFFFFFFFF) - start_pos) <= (m - 1 + slop)
    ranks = np.unique(cur[within] >> 32)
    if ranks.size == 0:
        return _EMPTY
    return _score_matched(reader, pls, cand[ranks], k, mask)


def span_near_unordered_topk(reader: SegmentReader, tokens: list[str],
                             k: int, *, slop: int = 0,
                             mask: np.ndarray | None = None):
    """ES/Lucene ``span_near(in_order=false, slop=N)`` — exact top-k docs
    containing ALL tokens in ANY order within a window of extent
    ``(max_pos - min_pos) - (m - 1) <= slop`` (the same span-extent slop
    as the ordered kernel). Clause terms must be DISTINCT (each token
    position holds one term, so position-distinctness of the matched set
    is automatic); scored like the other positional kernels.

    Kernel: window-existence test vectorized over every occurrence of
    every term as the candidate window MINIMUM. A valid unordered match
    with min position p implies the anchor at p succeeds, and any anchor
    that succeeds exhibits a valid match — so doc matches iff some
    anchor passes "every term has an occurrence in [p, p + W]" with
    ``W = m - 1 + slop``: one ``np.searchsorted`` per term over that
    term's (doc << 32 | pos) key array, no per-doc loop. Cost: m rounds
    over the total occurrence count of the candidate docs — same order
    as the ordered kernel's chain."""
    if not tokens:
        return _EMPTY
    uniq = sorted(set(tokens))
    if len(uniq) != len(tokens):
        raise ValueError(
            "span_near(in_order=false) requires distinct clause terms"
        )
    pls = []
    for t in uniq:
        pl = reader.postings(t)
        if pl is None:
            return _EMPTY
        if pl.pos_blocks is None:
            raise ValueError(
                "index has no positions (built without store_positions)"
            )
        pls.append(pl)
    cand = pls[0].ids
    for pl in pls[1:]:
        cand = np.intersect1d(cand, pl.ids, assume_unique=True)
        if cand.size == 0:
            return _EMPTY

    keys: dict[str, np.ndarray] = {}
    for t, pl in zip(uniq, pls):
        pos_vals, pos_ends = reader.positions(t)
        rows = np.searchsorted(pl.ids, cand)
        flat_pos, row_of = _gather_positions(
            pos_vals, pos_ends, pl.tfs.astype(np.int64), rows
        )
        keys[t] = (row_of.astype(np.int64) << 32) | flat_pos

    w = len(tokens) - 1 + slop
    anchors = np.concatenate([keys[t] for t in uniq])
    ok = np.ones(anchors.size, dtype=bool)
    for t in uniq:
        b = keys[t]
        if b.size == 0:
            return _EMPTY
        idx = np.searchsorted(b, anchors)
        valid = idx < b.size
        nxt = b[np.minimum(idx, b.size - 1)]
        ok &= valid
        ok &= (nxt >> 32) == (anchors >> 32)
        ok &= (nxt & 0xFFFFFFFF) <= (anchors & 0xFFFFFFFF) + w
    ranks = np.unique(anchors[ok] >> 32)
    if ranks.size == 0:
        return _EMPTY
    return _score_matched(reader, pls, cand[ranks], k, mask)


def _term_keys_over(reader: SegmentReader, token: str,
                    cand: np.ndarray) -> np.ndarray:
    """Ascending ``cand_rank << 32 | position`` keys of ``token``'s
    occurrences within the candidate docs. The token need NOT cover
    every candidate (unlike the conjunctive kernels): absent docs simply
    contribute no keys. Empty array when the term is unindexed."""
    pl = reader.postings(token)
    if pl is None:
        return np.empty(0, np.int64)
    if pl.pos_blocks is None:
        raise ValueError(
            "index has no positions (built without store_positions)"
        )
    pos_in = np.searchsorted(pl.ids, cand)
    present = pos_in < pl.ids.size
    present[present] &= pl.ids[np.minimum(pos_in, pl.ids.size - 1)][
        present
    ] == cand[present]
    ranks = np.nonzero(present)[0]
    if ranks.size == 0:
        return np.empty(0, np.int64)
    rows = pos_in[present]
    pos_vals, pos_ends = reader.positions(token)
    flat_pos, row_of = _gather_positions(
        pos_vals, pos_ends, pl.tfs.astype(np.int64), rows
    )
    # rows follow cand order, positions ascend within each row -> keys
    # are already ascending
    return (ranks[row_of].astype(np.int64) << 32) | flat_pos


def span_not_topk(reader: SegmentReader, phrase_tokens: list[str],
                  exclude: str, k: int, *, pre: int = 0, post: int = 0,
                  mask: np.ndarray | None = None):
    """ES/Lucene ``span_not`` with the ``pre``/``dist`` window: docs
    where the include phrase occurs at some position whose span
    ``[start − pre, start + m − 1 + post]`` contains NO occurrence of
    ``exclude`` (Lucene rejects include spans overlapping the exclusion,
    widened by pre/post; pre = post = 0 is plain span overlap for a
    one-term exclusion). Scored like ``phrase_topk`` — the include
    clause's unique terms (Lucene scores the include spans; the
    exclusion is match-only).

    Kernel: the exact-phrase survivor keys (start positions, one
    ``intersect1d`` round per term-offset like phrase_topk), then ONE
    vectorized interval-emptiness test per surviving start — two
    ``searchsorted`` calls over the exclusion term's ascending
    ``rank << 32 | pos`` keys."""
    if not phrase_tokens:
        return _EMPTY
    uniq = sorted(set(phrase_tokens))
    pls = []
    for t in uniq:
        pl = reader.postings(t)
        if pl is None:
            return _EMPTY
        if pl.pos_blocks is None:
            raise ValueError(
                "index has no positions (built without store_positions)"
            )
        pls.append(pl)
    cand = pls[0].ids
    for pl in pls[1:]:
        cand = np.intersect1d(cand, pl.ids, assume_unique=True)
        if cand.size == 0:
            return _EMPTY

    offsets: dict[str, list[int]] = {}
    for j, t in enumerate(phrase_tokens):
        offsets.setdefault(t, []).append(j)
    survivors = None
    for t, pl in zip(uniq, pls):
        pos_vals, pos_ends = reader.positions(t)
        rows = np.searchsorted(pl.ids, cand)
        flat_pos, row_of = _gather_positions(
            pos_vals, pos_ends, pl.tfs.astype(np.int64), rows
        )
        for off in offsets[t]:
            ok = flat_pos >= off
            keys = (row_of[ok].astype(np.int64) << 32) | (flat_pos[ok] - off)
            survivors = (
                keys if survivors is None
                else np.intersect1d(survivors, keys, assume_unique=True)
            )
            if survivors.size == 0:
                return _EMPTY

    ex_keys = _term_keys_over(reader, exclude, cand)
    if ex_keys.size:
        m = len(phrase_tokens)
        ranks = survivors >> 32
        starts = survivors & 0xFFFFFFFF
        lo = (ranks << 32) | np.maximum(starts - pre, 0)
        hi = (ranks << 32) | (starts + (m - 1) + post)
        n_ex = (
            np.searchsorted(ex_keys, hi, side="right")
            - np.searchsorted(ex_keys, lo, side="left")
        )
        survivors = survivors[n_ex == 0]
    if survivors.size == 0:
        return _EMPTY
    matched = cand[np.unique(survivors >> 32)]
    return _score_matched(reader, pls, matched, k, mask)


def span_containing_topk(reader: SegmentReader, big: tuple[str, str],
                         little: str, k: int, *, slop: int = 0,
                         mask: np.ndarray | None = None):
    """ES/Lucene ``span_containing``: docs with a match of the big span
    — ``span_near(in_order=true, slop)`` over the two-term clause
    ``big = (a, b)`` — that CONTAINS an occurrence of ``little``
    (a < little-position < b within the big span; Lucene containment is
    big.start <= little.start and little.end <= big.end). The three
    terms must be distinct. Scored over all three clause terms
    (conjunctive — every matched doc contains them all), ascending
    unicode order, bit-identical to the match paths.

    Kernel: vectorized tightest-pair test anchored at every ``little``
    occurrence q — the closest ``a`` at-or-before q and closest ``b``
    at-or-after q minimize the enclosing extent, so q is contained in
    SOME valid big span iff the tightest pair satisfies the slop
    (exchange argument). One ``searchsorted`` per side over ascending
    per-term key arrays; no per-doc loop."""
    a, b = big
    if len({a, b, little}) != 3:
        raise ValueError("span_containing clause terms must be distinct")
    uniq = sorted({a, b, little})
    pls = []
    for t in uniq:
        pl = reader.postings(t)
        if pl is None:
            return _EMPTY
        if pl.pos_blocks is None:
            raise ValueError(
                "index has no positions (built without store_positions)"
            )
        pls.append(pl)
    cand = pls[0].ids
    for pl in pls[1:]:
        cand = np.intersect1d(cand, pl.ids, assume_unique=True)
        if cand.size == 0:
            return _EMPTY
    keys_a = _term_keys_over(reader, a, cand)
    keys_b = _term_keys_over(reader, b, cand)
    keys_l = _term_keys_over(reader, little, cand)
    if min(keys_a.size, keys_b.size, keys_l.size) == 0:
        return _EMPTY

    ia = np.searchsorted(keys_a, keys_l, side="right") - 1
    ok = ia >= 0
    pa_ = keys_a[np.maximum(ia, 0)]
    ok &= (pa_ >> 32) == (keys_l >> 32)  # an `a` at-or-before q, same doc
    ib = np.searchsorted(keys_b, keys_l, side="left")
    okb = ib < keys_b.size
    pb = keys_b[np.minimum(ib, keys_b.size - 1)]
    ok &= okb & ((pb >> 32) == (keys_l >> 32))  # a `b` at-or-after q
    p0 = pa_ & 0xFFFFFFFF
    p1 = pb & 0xFFFFFFFF
    ok &= (p1 > p0) & ((p1 - p0) - 1 <= slop)
    ranks = np.unique(keys_l[ok] >> 32)
    if ranks.size == 0:
        return _EMPTY
    return _score_matched(reader, pls, cand[ranks], k, mask)


def _score_matched_or(reader: SegmentReader, pls, matched: np.ndarray,
                      k: int, mask: np.ndarray | None):
    """OR-style exact scores: each posting list contributes only to the
    matched docs it CONTAINS (the scatter-add semantics of the match
    path) — for kernels whose matched docs need not hold every term
    (span_or alternatives). Callers pass ``pls`` ascending by term."""
    if mask is not None:
        pos_in_dl = np.searchsorted(reader._dl_ids, matched)
        matched = matched[mask[pos_in_dl]]
    if matched.size == 0:
        return _EMPTY
    scores = np.zeros(matched.size, dtype=np.float64)
    for pl in pls:
        _dense(pl, reader)
        idx = np.searchsorted(pl.ids, matched)
        present = idx < pl.ids.size
        present[present] &= pl.ids[np.minimum(idx, pl.ids.size - 1)][
            present
        ] == matched[present]
        scores[present] += pl.dense_contrib[idx[present]]
    return _rank_topk(matched, scores, k)


def span_or_near_topk(reader: SegmentReader, slots: list[list[str]],
                      k: int, *, slop: int = 0,
                      mask: np.ndarray | None = None):
    """ES/Lucene ``span_near(in_order=true, slop)`` whose clauses are
    ``span_or`` alternatives: slot i matches ANY of ``slots[i]``'s terms,
    slots must match at strictly increasing positions with span extent
    ``(p_last − p_first) − (m − 1) <= slop``. This is the composition
    Lucene builds span_or for — an OR of terms inside a proximity
    clause. Scored OR-style over the union of all slot terms, each term
    contributing only to docs that contain it (ascending unicode order,
    bit-identical to the match path's scatter-add).

    Kernel: per slot, one ascending key array = sorted union of the
    member terms' ``rank << 32 | pos`` keys; then the span_near greedy
    chain (one ``searchsorted`` per slot), which stays exact because
    greedily minimizing the chain end is alternative-agnostic."""
    if not slots or any(not s for s in slots):
        return _EMPTY
    uniq = sorted({t for s in slots for t in s})
    by_term = {}
    for t in uniq:
        pl = reader.postings(t)
        if pl is not None and pl.pos_blocks is None:
            raise ValueError(
                "index has no positions (built without store_positions)"
            )
        by_term[t] = pl
    # candidates: docs holding >=1 alternative of EVERY slot
    cand = None
    for s in slots:
        ids = [by_term[t].ids for t in set(s) if by_term[t] is not None]
        if not ids:
            return _EMPTY
        u = ids[0]
        for arr in ids[1:]:
            u = np.union1d(u, arr)
        cand = u if cand is None else np.intersect1d(
            cand, u, assume_unique=True
        )
        if cand.size == 0:
            return _EMPTY

    term_keys = {
        t: _term_keys_over(reader, t, cand)
        for t in uniq if by_term[t] is not None
    }
    slot_keys = []
    for s in slots:
        parts = [term_keys[t] for t in sorted(set(s)) if t in term_keys]
        merged = (
            np.sort(np.concatenate(parts)) if parts
            else np.empty(0, np.int64)
        )
        if merged.size == 0:
            return _EMPTY
        slot_keys.append(merged)

    m = len(slots)
    cur = slot_keys[0]
    start_pos = cur & 0xFFFFFFFF
    for b in slot_keys[1:]:
        if cur.size == 0:
            return _EMPTY
        idx = np.searchsorted(b, cur + 1)
        ok = idx < b.size
        nxt = b[np.minimum(idx, max(b.size - 1, 0))]
        ok &= (nxt >> 32) == (cur >> 32)
        cur, start_pos, nxt = cur[ok], start_pos[ok], nxt[ok]
        cur = nxt
    if cur.size == 0:
        return _EMPTY
    within = ((cur & 0xFFFFFFFF) - start_pos) <= (m - 1 + slop)
    ranks = np.unique(cur[within] >> 32)
    if ranks.size == 0:
        return _EMPTY
    pls = [by_term[t] for t in uniq if by_term[t] is not None]
    return _score_matched_or(reader, pls, cand[ranks], k, mask)
