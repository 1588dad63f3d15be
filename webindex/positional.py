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
