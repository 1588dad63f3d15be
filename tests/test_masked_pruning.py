"""Masked pruning + the quantized-impact pass must be invisible.

An index with tombstones (or a docvalues filter) now routes to the
pruned kernels with the mask passed through; results must stay
bit-identical to exhaustive_constrained(mask=...) — the previous
only-path — and to a brute per-doc oracle over live docs. The
quantized-impact uint16 first pass must likewise be invisible: it only
SELECTS candidates, exact scores come from the pinned ascending-term
rescore.
"""

import numpy as np
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.oracle import OracleBM25

CFG = IndexConfig(num_buckets=4, n_parts=4,
                  analyzer=AnalyzerConfig(remove_stopwords=False))


@pytest.fixture(scope="module")
def masked_idx(tmp_path_factory, ray_session):
    import pyarrow as pa
    import ray.data as rd

    from webindex.build import build_index

    rng = np.random.default_rng(23)
    common = ["alpha", "beta", "gamma", "delta"]
    rare = [f"rare{i}" for i in range(30)]
    docs = []
    for i in range(500):
        words = list(rng.choice(common, size=rng.integers(3, 10)))
        if i % 9 == 0:
            words += list(rng.choice(rare, size=2))
        rng.shuffle(words)
        docs.append((i, " ".join(words)))

    idx = str(tmp_path_factory.mktemp("masked") / "idx")
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(3)
    build_index(ds, idx, CFG)

    # tombstone every 7th doc
    from webindex.lifecycle import delete_docs

    dead = [d for d, _ in docs if d % 7 == 0]
    delete_docs(idx, dead)
    live_docs = [(d, t) for d, t in docs if d % 7 != 0]
    return idx, docs, live_docs, set(dead)


QUERIES = [
    "alpha rare3",
    "alpha beta gamma delta",   # all dense: the quantized-pass regime
    "rare1 rare2 alpha beta",
    "beta",                     # single term under mask
    "alpha gamma",
]


def test_masked_kernels_bit_identical(masked_idx, ray_session):
    from webindex.search import SearcherActor
    from webindex.wand import (block_max_wand, exhaustive_constrained,
                               exhaustive_topk)

    idx, docs, _live_docs, dead = masked_idx
    s = SearcherActor(idx, top_k=20, mode="auto", request_cache=False)
    mask = s._mask()
    assert mask is not None and not mask.all()
    # pinned tombstone semantics: deleted docs are FILTERED but df/avgdl
    # still count them (lifecycle.delete_docs docstring) — so the oracle
    # scores on the full corpus and drops dead docs from the ranking
    oracle = OracleBM25(docs, CFG)
    for q in QUERIES:
        terms = s.an.tokens(q)
        i1, s1 = exhaustive_constrained(s.reader, terms, 20, mask=mask)
        i2, s2 = exhaustive_topk(s.reader, terms, 20, mask=mask)
        i3, s3 = block_max_wand(s.reader, terms, 20, mask=mask)
        assert np.array_equal(i1, i2) and np.array_equal(s1, s2), q
        assert np.array_equal(i1, i3) and np.array_equal(s1, s3), q
        # and the routed searcher equals the brute oracle over live docs
        ids, scores = s.search_one("q", q)
        want = [
            (d, sc) for d, sc in oracle.topk(q, len(docs))
            if d not in dead
        ][:20]
        assert ids.tolist() == [d for d, _ in want], q
        assert np.allclose(scores, [sc for _, sc in want], atol=1e-12), q


def test_quantized_pass_engages_and_is_exact(masked_idx, ray_session):
    """Force the quantized path (bypass two-phase routing) and check it
    returns exactly the unquantized result, mask on and off."""
    from webindex.search import SearcherActor
    from webindex.wand import (_dense, _quantized_topk, _refined_theta,
                               exhaustive_constrained, query_postings)

    idx, docs, _live, _dead = masked_idx
    s = SearcherActor(idx, top_k=15, mode="auto", request_cache=False)
    reader = s.reader
    mask = s._mask()
    for q in ["alpha beta gamma delta", "alpha gamma"]:
        terms = sorted(set(s.an.tokens(q)))
        pls = query_postings(reader, terms)
        for pl in pls:
            _dense(pl, reader)
        for m in (None, mask):
            theta = _refined_theta(pls, 15, -np.inf, mask=m)
            assert np.isfinite(theta) and theta > 0
            res = _quantized_topk(reader, pls, 15, theta, m)
            assert res is not None, (q, m is None)
            want = exhaustive_constrained(reader, terms, 15, mask=m)
            assert np.array_equal(res[0], want[0]), q
            assert np.array_equal(res[1], want[1]), q


def test_impact_exponent_overflow_budget(masked_idx, ray_session):
    """Summed per-term ceil-quantized maxima always fit uint16."""
    import math

    from webindex.search import SearcherActor
    from webindex.wand import _dense, _impact_exponent, _impacts, \
        query_postings

    idx, _docs, _live, _dead = masked_idx
    s = SearcherActor(idx, top_k=5, mode="auto", request_cache=False)
    reader = s.reader
    terms = sorted(set(s.an.tokens("alpha beta gamma delta rare1 rare2")))
    pls = query_postings(reader, terms)
    for pl in pls:
        _dense(pl, reader)
    e = _impact_exponent(pls)
    assert sum(
        math.ceil(p.max_score / 2.0 ** e) for p in pls
    ) <= 65535
    for pl in pls:
        iq = _impacts(pl, reader, e)
        assert iq.dtype == np.uint16
        # ceil quantization: iq * 2**e is an upper bound, within one step
        assert (iq * 2.0 ** e >= pl.dense_contrib).all()
        assert (iq * 2.0 ** e <= pl.dense_contrib + 2.0 ** e).all()


def test_contrib_lut_strike_and_backoff(masked_idx, ray_session,
                                        monkeypatch):
    """The lookup-table policy: no build on a term's first rescore, a
    build on the second, and bounded rebuilds under an over-budget LRU
    (exponential backoff — no rebuild-per-query thrash)."""
    import webindex.wand as wand
    from webindex.search import SearcherActor
    from webindex.wand import _contrib_lut, _dense, query_postings

    idx, _docs, _live, _dead = masked_idx
    s = SearcherActor(idx, top_k=10, mode="auto", request_cache=False)
    reader = s.reader
    pls = query_postings(reader, ["alpha", "beta", "gamma", "delta"])
    for pl in pls:
        _dense(pl, reader)
        pl.contrib_lut = None
    reader._lut_strikes = {}
    # strike 1: no table; strike 2: built
    assert _contrib_lut(pls[0], reader) is None
    assert _contrib_lut(pls[0], reader) is not None
    assert pls[0].contrib_lut not in (None, "none")

    # counters are READER state keyed by term: a PostingList cycled out
    # of the postings cache and reloaded must resume its strike level,
    # not restart (ADVICE r3 — postings-cache churn resets backoff)
    reader._lut_strikes = {}
    reader._contrib_lut_lru = None
    pls[1].contrib_lut = None
    assert _contrib_lut(pls[1], reader) is None  # strike 1
    # simulate churn: evict + reload the same term
    reader._postings.pop(pls[1].term, None)
    repl = query_postings(reader, [pls[1].term])[0]
    assert repl is not pls[1]
    _dense(repl, reader)
    assert _contrib_lut(repl, reader) is not None  # strike 2 survives churn

    # hit path refreshes LRU recency: after hitting term A, inserting
    # one-over-cap evicts the non-hit term, not A (ADVICE r3 — eviction
    # was build-order)
    monkeypatch.setattr(wand, "_CONTRIB_LUT_BYTES", 1)
    assert wand._contrib_lut_cap(reader._dl_ids.size) == 8
    cyc = query_postings(
        reader, ["alpha", "beta", "gamma", "delta"]
        + [f"rare{i}" for i in range(12)],
    )[: 8 + 1]
    assert len(cyc) == 9
    for pl in cyc:
        _dense(pl, reader)
        pl.contrib_lut = None
    reader._lut_strikes = {t.term: [1, 1] for t in cyc}  # next hit builds
    reader._contrib_lut_lru = None
    for pl in cyc[:8]:  # fill the LRU exactly to cap, build order 0..7
        assert _contrib_lut(pl, reader) is not None
    assert _contrib_lut(cyc[0], reader) is not None  # HIT oldest-built
    assert _contrib_lut(cyc[8], reader) is not None  # push one over cap
    assert cyc[0].contrib_lut not in (None, "none")  # survived (was hit)
    assert cyc[1].contrib_lut is None  # least-recently-USED got evicted

    # over-budget LRU (cap floors at 8 via a tiny byte budget; cycle 16
    # terms so eviction genuinely engages): round-robin sweeps must not
    # rebuild every encounter — each term's strike requirement doubles
    # per rebuild
    many = query_postings(
        reader,
        ["alpha", "beta", "gamma", "delta"]
        + [f"rare{i}" for i in range(12)],
    )
    assert len(many) > wand._contrib_lut_cap(reader._dl_ids.size)
    for pl in many:
        _dense(pl, reader)
        pl.contrib_lut = None
    reader._lut_strikes = {}
    reader._contrib_lut_lru = None
    builds = 0
    for _ in range(32):  # 32 round-robin sweeps = 512 encounters
        for pl in many:
            before = pl.contrib_lut is not None
            ent = _contrib_lut(pl, reader)
            if ent is not None and not before:
                builds += 1
    # unbounded thrash would be ~#encounters (32 * len(many)); backoff
    # keeps the total build count ~log2(32 sweeps) per term
    assert builds <= len(many) * 6

    # a stats override bakes NEW contributions: strike/backoff records
    # (and 'none' overflow markers) from the old stats must clear with
    # the postings + LUT caches
    assert reader._lut_strikes
    reader.set_stats_override(
        {"N": reader.N + 1, "avgdl": reader.avgdl, "dfs": {}}
    )
    assert not reader._lut_strikes
