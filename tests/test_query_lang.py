"""Query language: filtered search (docvalues), AND match, phrase queries.

Brute-force oracles computed independently of the engine: all BM25 scores
from OracleBM25, then the filter / conjunction / adjacency constraint
applied in plain Python. Both batch impls (shard fan-out and actor pool)
must agree with the oracle exactly — (score desc, docID asc), scores to
1e-12 — since constraints are per-document properties that compose with
the exact scatter-gather merge.
"""

import numpy as np
import pyarrow as pa
import pytest

from webindex.analyze import Analyzer
from webindex.build import build_index
from webindex.config import IndexConfig
from webindex.oracle import OracleBM25
from webindex.phrase import contains_phrase, phrase_search
from webindex.search import SearcherActor, search_queries

CFG = IndexConfig(num_buckets=8, df_salt_threshold=60, salt_shards=2,
                  block_size=32)

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "rare1 rare2").split()
N_DOCS = 160
QUERIES = [
    ("q1", "alpha beta"),
    ("q2", "rare1 gamma"),
    ("q3", "alpha beta gamma delta"),
    ("q4", "rare2"),
    ("q5", "alpha nosuchterm"),
]
PHRASES = [
    ("p1", "alpha beta"),
    ("p2", "beta beta"),
    ("p3", "gamma delta epsilon"),
    ("p4", "alpha nosuchterm"),
]


def _make_docs():
    rng = np.random.default_rng(17)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(8, 40))
        words = [VOCAB[int(j)] for j in rng.integers(0, 10, size=n)]
        if i % 13 == 0:
            words.append("rare1")
        if i % 29 == 0:
            words.append("rare2")
        text = " ".join(words)
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": ["en", "fr", "de"][i % 3],
                "n_chars": len(text),
            }
        )
    return rows


DOCS = _make_docs()


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("qidx") / "docs_index")
    tab = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
            "text": pa.array([d["text"] for d in DOCS]),
            "lang": pa.array([d["lang"] for d in DOCS]),
            "n_chars": pa.array([d["n_chars"] for d in DOCS], pa.int64()),
        }
    )
    ds = rd.from_arrow(tab)
    build_index(
        ds.select_columns(["doc_id", "text"]), out, CFG,
        docvalues_ds=ds.select_columns(["doc_id", "lang", "n_chars"]),
    )
    return out


@pytest.fixture(scope="module")
def oracle():
    return OracleBM25([(d["doc_id"], d["text"]) for d in DOCS], CFG)


def _oracle_all_scores(oracle, query):
    """{doc_id: score} for every matching doc (same fixed-order sums)."""
    return dict(oracle.topk(query, 10**9))


def _oracle_constrained(oracle, query, k, *, allowed=None, require_all=False):
    an = oracle.an
    terms = sorted(set(an.tokens(query)))
    scores = _oracle_all_scores(oracle, query)
    out = []
    doc_tokens = {d["doc_id"]: set(an.tokens(d["text"])) for d in DOCS}
    for doc_id, sc in scores.items():
        if allowed is not None and doc_id not in allowed:
            continue
        if require_all and not all(t in doc_tokens[doc_id] for t in terms):
            continue
        out.append((doc_id, sc))
    out.sort(key=lambda e: (-e[1], e[0]))
    return out[:k]


def _runs_rows(runs_ds):
    df = runs_ds.to_pandas().sort_values(["qid", "rank"])
    return {
        qid: [(int(d), float(s)) for d, s in zip(g["doc_id"], g["score"])]
        for qid, g in df.groupby("qid")
    }


def _queries_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "qid": pa.array([q for q, _ in pairs]),
                "text": pa.array([t for _, t in pairs]),
            }
        )
    )


def _assert_matches(got, want_by_qid):
    assert set(got) | set(want_by_qid.keys()) == set(want_by_qid.keys())
    for qid, want in want_by_qid.items():
        rows = got.get(qid, [])
        assert [d for d, _ in rows] == [d for d, _ in want], qid
        for (_, gs), (_, ws) in zip(rows, want):
            assert abs(gs - ws) < 1e-12, qid


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_filtered_search_matches_oracle(index_dir, oracle, impl):
    pred = (("lang", "==", "en"), ("n_chars", ">=", 60))
    allowed = {
        d["doc_id"] for d in DOCS
        if d["lang"] == "en" and d["n_chars"] >= 60
    }
    runs = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=7, impl=impl,
        filter_pred=pred, concurrency=2, batch_size=4,
    )
    want = {
        qid: _oracle_constrained(oracle, text, 7, allowed=allowed)
        for qid, text in QUERIES
    }
    want = {q: w for q, w in want.items() if w}
    _assert_matches(_runs_rows(runs), want)


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_and_match_matches_oracle(index_dir, oracle, impl):
    runs = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=7, impl=impl,
        match="and", concurrency=2, batch_size=4,
    )
    want = {
        qid: _oracle_constrained(oracle, text, 7, require_all=True)
        for qid, text in QUERIES
    }
    want = {q: w for q, w in want.items() if w}
    got = _runs_rows(runs)
    # q5 contains a term absent from the corpus: AND must return nothing
    assert "q5" not in got
    _assert_matches(got, want)


def test_filtered_and_combined(index_dir, oracle):
    pred = (("lang", "in", ("en", "fr")),)
    allowed = {d["doc_id"] for d in DOCS if d["lang"] in ("en", "fr")}
    runs = search_queries(
        _queries_ds(QUERIES[:3]), index_dir, top_k=5, impl="pool",
        filter_pred=pred, match="and", concurrency=2, batch_size=4,
    )
    want = {
        qid: _oracle_constrained(
            oracle, text, 5, allowed=allowed, require_all=True
        )
        for qid, text in QUERIES[:3]
    }
    want = {q: w for q, w in want.items() if w}
    _assert_matches(_runs_rows(runs), want)


def test_filter_without_docvalues_raises(ray_session, tmp_path, oracle):
    import ray.data as rd

    out = str(tmp_path / "nodv_index")
    tab = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
            "text": pa.array([d["text"] for d in DOCS]),
        }
    )
    build_index(rd.from_arrow(tab), out, CFG)
    s = SearcherActor(out, top_k=5, filter_pred=(("lang", "==", "en"),))
    with pytest.raises(FileNotFoundError, match="docvalues"):
        s.search_one("q", "alpha beta")


def test_contains_phrase_unit():
    toks = "a b a b c".split()
    assert contains_phrase(toks, ("a", "b"))
    assert contains_phrase(toks, ("a", "b", "c"))
    assert contains_phrase(toks, ("b", "a"))
    assert not contains_phrase(toks, ("c", "a"))
    assert not contains_phrase(toks, ("a", "c"))
    assert not contains_phrase([], ("a",))
    assert not contains_phrase(toks, ())
    assert contains_phrase(["x"], ("x",))


def _oracle_phrase(oracle, phrase_text, k):
    an = oracle.an
    ph = tuple(an.tokens(phrase_text))
    scores = _oracle_all_scores(oracle, phrase_text)
    out = [
        (d["doc_id"], scores[d["doc_id"]])
        for d in DOCS
        if d["doc_id"] in scores
        and contains_phrase(an.tokens(d["text"]), ph)
    ]
    out.sort(key=lambda e: (-e[1], e[0]))
    return out[:k]


@pytest.mark.parametrize("broadcast_limit", [100_000, 0])
def test_phrase_search_matches_oracle(index_dir, oracle, broadcast_limit):
    """broadcast_limit=0 forces the hash-partitioned join fallback — both
    join paths must be result-identical."""
    import ray.data as rd

    docs_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
                "text": pa.array([d["text"] for d in DOCS]),
            }
        )
    )
    runs = phrase_search(
        _queries_ds(PHRASES), index_dir, docs_ds, top_k=6,
        broadcast_limit=broadcast_limit,
    )
    got = _runs_rows(runs)
    want = {
        qid: _oracle_phrase(oracle, text, 6) for qid, text in PHRASES
    }
    want = {q: w for q, w in want.items() if w}
    # p4 contains a term absent from the corpus: no phrase match possible
    assert "p4" not in got
    _assert_matches(got, want)
    # the fixture must actually exercise matches and non-trivial filtering
    assert any(len(w) > 0 for w in want.values())


@pytest.fixture(scope="module")
def pos_index_dir(ray_session, tmp_path_factory):
    """Same corpus, positional postings (store_positions=True)."""
    import dataclasses

    import ray.data as rd

    out = str(tmp_path_factory.mktemp("qidx") / "pos_index")
    tab = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
            "text": pa.array([d["text"] for d in DOCS]),
        }
    )
    ds = rd.from_arrow(tab)
    build_index(
        ds, out, dataclasses.replace(CFG, store_positions=True),
        docvalues_ds=rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(
                        [d["doc_id"] for d in DOCS], pa.int64()
                    ),
                    "lang": pa.array([d["lang"] for d in DOCS]),
                }
            )
        ),
    )
    return out


def test_positional_phrase_matches_oracle(pos_index_dir, oracle):
    runs = phrase_search(_queries_ds(PHRASES), pos_index_dir, top_k=6)
    got = _runs_rows(runs)
    want = {qid: _oracle_phrase(oracle, text, 6) for qid, text in PHRASES}
    want = {q: w for q, w in want.items() if w}
    assert "p4" not in got
    _assert_matches(got, want)


def test_positional_phrase_single_term_and_reader(pos_index_dir, oracle):
    from webindex.positional import phrase_topk
    from webindex.segments import SegmentReader

    r = SegmentReader(pos_index_dir)
    r.preload()
    # decoded positions must equal the analyzer's token positions
    an = oracle.an
    pos_vals, pos_ends = r.positions("alpha")
    pl = r.postings("alpha")
    for i in [0, len(pl.ids) // 2, len(pl.ids) - 1]:
        did = int(pl.ids[i])
        toks = an.tokens(DOCS[did]["text"])
        want = [j for j, t in enumerate(toks) if t == "alpha"]
        lo = int(pos_ends[i] - pl.tfs[i])
        assert pos_vals[lo: int(pos_ends[i])].tolist() == want
    # single-token phrase == single-term match
    ids, scores = phrase_topk(r, ["rare2"], 5)
    want_top = _oracle_constrained(oracle, "rare2", 5)
    assert ids.tolist() == [d for d, _ in want_top]
    for g, (_, w) in zip(scores.tolist(), want_top):
        assert abs(g - w) < 1e-12


def test_positional_phrase_filtered(pos_index_dir, oracle):
    """Filtered phrase queries compose: docvalues mask over phrase hits."""
    allowed = {d["doc_id"] for d in DOCS if d["lang"] == "en"}
    runs = phrase_search(
        _queries_ds(PHRASES[:2]), pos_index_dir, top_k=6
    )
    # reference: unfiltered indexed phrase results, then filter by lang
    from webindex.search import search_queries

    filt = search_queries(
        _queries_ds(PHRASES[:2]), pos_index_dir, top_k=6,
        query_kind="phrase", filter_pred=(("lang", "==", "en"),),
        impl="pool", concurrency=2,
    )
    got = _runs_rows(filt)
    base = _runs_rows(runs)
    for qid, rows in got.items():
        want = [(d, s) for d, s in
                [(d, s) for d, s in _oracle_phrase(
                    oracle, dict(PHRASES)[qid], 10**9)]
                if d in allowed][:6]
        assert [d for d, _ in rows] == [d for d, _ in want], qid
    # and every filtered hit is an unfiltered hit in allowed
    for qid, rows in got.items():
        assert all(d in allowed for d, _ in rows)
        assert set(d for d, _ in rows) <= set(
            d for d, _ in _oracle_phrase(oracle, dict(PHRASES)[qid], 10**9)
        )
    assert base  # fixture sanity


def test_phrase_on_positionless_index_raises(index_dir):
    from webindex.positional import phrase_topk
    from webindex.segments import SegmentReader

    r = SegmentReader(index_dir)
    r.preload()
    with pytest.raises(ValueError, match="no positions"):
        phrase_topk(r, ["alpha", "beta"], 5)


def test_phrase_no_candidates_empty(index_dir):
    import ray.data as rd

    docs_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
                "text": pa.array([d["text"] for d in DOCS]),
            }
        )
    )
    runs = phrase_search(
        _queries_ds([("px", "nosuchterm missingterm")]), index_dir,
        docs_ds, top_k=5,
    )
    assert runs.count() == 0


def test_facet_counts_matches_brute(index_dir, oracle):
    """ES terms-aggregation analog: value counts over the full match set,
    composing with AND match and the docvalues filter."""
    import collections

    from webindex.search import facet_counts

    an = oracle.an
    doc_tokens = {d["doc_id"]: set(an.tokens(d["text"])) for d in DOCS}

    def brute(query, *, require_all=False, pred=None):
        terms = sorted(set(an.tokens(query)))
        terms = [t for t in terms]
        out = collections.Counter()
        for d in DOCS:
            toks = doc_tokens[d["doc_id"]]
            present = [t for t in terms if t in toks]
            if require_all:
                if len(present) != len(terms) or not terms:
                    continue
            elif not present:
                continue
            if pred and not pred(d):
                continue
            out[d["lang"]] += 1
        return dict(out)

    got = facet_counts(
        _queries_ds(QUERIES), index_dir, ["lang"]
    ).to_pandas()
    for qid, text in QUERIES:
        g = got[got["qid"] == qid]
        want = brute(text)
        assert dict(zip(g["value"], g["cnt"])) == want, qid

    got2 = facet_counts(
        _queries_ds(QUERIES[:2]), index_dir, ["lang"], match="and",
        filter_pred=(("n_chars", ">=", 60),),
    ).to_pandas()
    for qid, text in QUERIES[:2]:
        g = got2[got2["qid"] == qid]
        want = brute(text, require_all=True,
                     pred=lambda d: d["n_chars"] >= 60)
        assert dict(zip(g["value"], g["cnt"])) == want, qid


def _match_doc_rows(oracle, query):
    """Brute OR match set: docs containing any analyzed query term."""
    an = oracle.an
    terms = sorted(set(an.tokens(query)))
    return [
        d for d in DOCS
        if any(t in set(an.tokens(d["text"])) for t in terms)
    ]


def test_facet_weighted_avg_matches_brute(index_dir, oracle):
    """ES weighted_avg: n_chars weighted by doc token length over the
    match set — exact int sums, one float division."""
    from webindex.search import facet_weighted_avg

    an = oracle.an
    got = facet_weighted_avg(
        _queries_ds(QUERIES), index_dir, "n_chars"
    ).to_pandas()
    for qid, text in QUERIES:
        m = _match_doc_rows(oracle, text)
        g = got[got["qid"] == qid]
        assert len(g) == (1 if m else 0), qid
        if not m:
            continue
        sum_vw = sum(d["n_chars"] * len(an.tokens(d["text"])) for d in m)
        sum_w = sum(len(an.tokens(d["text"])) for d in m)
        assert int(g["sum_vw"].iloc[0]) == sum_vw, qid
        assert int(g["sum_w"].iloc[0]) == sum_w, qid
        assert float(g["weighted_avg"].iloc[0]) == sum_vw / sum_w, qid


def test_facet_percentile_ranks_matches_brute(index_dir, oracle):
    """ES percentile_ranks, exact: % of matches with n_chars <= probe."""
    from webindex.search import facet_percentile_ranks

    probes = [60, 120, 200]
    got = facet_percentile_ranks(
        _queries_ds(QUERIES), index_dir, "n_chars", probes
    ).to_pandas()
    for qid, text in QUERIES:
        m = _match_doc_rows(oracle, text)
        g = got[got["qid"] == qid].sort_values("value")
        assert len(g) == (len(probes) if m else 0), qid
        if not m:
            continue
        for probe, pct in zip(g["value"], g["pct"]):
            le = sum(1 for d in m if d["n_chars"] <= probe)
            assert float(pct) == (100.0 * le) / len(m), (qid, probe)


FILTERS = {
    "en": (("lang", "==", "en"),),
    "big": (("n_chars", ">=", 100),),
    "both": (("lang", "==", "fr"), ("n_chars", "<", 100)),
}


def _filter_fns():
    return {
        "en": lambda d: d["lang"] == "en",
        "big": lambda d: d["n_chars"] >= 100,
        "both": lambda d: d["lang"] == "fr" and d["n_chars"] < 100,
    }


def test_facet_filters_matches_brute(index_dir, oracle):
    """ES filters agg: every named bucket returned, zeros included."""
    from webindex.search import facet_filters

    fns = _filter_fns()
    got = facet_filters(_queries_ds(QUERIES), index_dir, FILTERS).to_pandas()
    for qid, text in QUERIES:
        m = _match_doc_rows(oracle, text)
        g = got[got["qid"] == qid]
        # the bucket set is caller-fixed: always all names, even with no
        # matches at all
        assert sorted(g["filter"]) == sorted(FILTERS), qid
        for name, fn in fns.items():
            want = sum(1 for d in m if fn(d))
            assert int(g[g["filter"] == name]["cnt"].iloc[0]) == want, (
                qid, name,
            )


def test_adjacency_matrix_matches_brute(index_dir, oracle):
    """ES adjacency_matrix: singles + 'a&b' pairwise intersections over
    the match set; empty buckets omitted."""
    from webindex.search import adjacency_matrix

    fns = _filter_fns()
    names = sorted(fns)
    got = adjacency_matrix(
        _queries_ds(QUERIES), index_dir, FILTERS
    ).to_pandas()
    for qid, text in QUERIES:
        m = _match_doc_rows(oracle, text)
        want = {}
        for i, na in enumerate(names):
            n = sum(1 for d in m if fns[na](d))
            if n:
                want[na] = n
            for nb in names[i + 1:]:
                n2 = sum(1 for d in m if fns[na](d) and fns[nb](d))
                if n2:
                    want[f"{na}&{nb}"] = n2
        g = got[got["qid"] == qid]
        assert dict(zip(g["key"], (int(c) for c in g["cnt"]))) == want, qid


def test_best_window_unit():
    from webindex.snippet import best_window

    toks = "x x alpha x beta x x gamma alpha x".split()
    # width 3: [alpha x beta] covers 2 distinct terms at start 2;
    # [gamma alpha x] also covers 2 at start 7 -> earliest wins
    s, win = best_window(toks, {"alpha", "beta", "gamma"}, 3)
    assert (s, win) == (2, ["alpha", "x", "beta"])
    # doc shorter than window -> whole doc
    assert best_window(["a", "b"], {"b"}, 8) == (0, ["a", "b"])
    assert best_window([], {"a"}, 4) == (0, [])
    # no query terms present -> earliest window (all-zero coverage)
    s, win = best_window(toks, {"nosuch"}, 4)
    assert s == 0 and win == toks[:4]


def test_snippet_runs_brute(index_dir, oracle):
    import ray.data as rd

    from webindex.search import search_queries
    from webindex.snippet import best_window, snippet_runs

    docs_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
                "text": pa.array([d["text"] for d in DOCS]),
            }
        )
    )
    runs = search_queries(
        _queries_ds(QUERIES[:3]), index_dir, top_k=5, impl="pool",
        concurrency=2,
    )
    out = snippet_runs(
        runs, docs_ds, _queries_ds(QUERIES[:3]), window=6,
        index_dir=index_dir,
    ).to_pandas()
    an = oracle.an
    texts = {d["doc_id"]: d["text"] for d in DOCS}
    qmap = dict(QUERIES[:3])
    assert len(out) == runs.count()
    for qid, did, snip in zip(out["qid"], out["doc_id"], out["snippet"]):
        toks = an.tokens(texts[int(did)])
        want = " ".join(
            best_window(toks, set(an.tokens(qmap[qid])), 6)[1]
        )
        assert snip == want, (qid, did)


def test_filter_with_sparse_docvalues_range(ray_session, tmp_path):
    """A docvalues sidecar covering only part of the docID space: docs
    (or whole shard ranges) without rows are non-matching, never a crash."""
    import ray.data as rd

    from webindex.segments import SegmentReader

    out = str(tmp_path / "sparse_dv_index")
    tab = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
            "text": pa.array([d["text"] for d in DOCS]),
        }
    )
    # docvalues only for even doc_ids
    dv = pa.table(
        {
            "doc_id": pa.array(
                [d["doc_id"] for d in DOCS if d["doc_id"] % 2 == 0],
                pa.int64(),
            ),
            "lang": pa.array(
                [d["lang"] for d in DOCS if d["doc_id"] % 2 == 0]
            ),
        }
    )
    build_index(rd.from_arrow(tab), out, CFG, docvalues_ds=rd.from_arrow(dv))
    s = SearcherActor(out, top_k=50, filter_pred=(("lang", "==", "en"),))
    ids, _ = s.search_one("q", "alpha")
    assert ids.size > 0
    assert all(i % 2 == 0 and DOCS[i]["lang"] == "en" for i in ids.tolist())
    # a reader restricted to a range with NO docvalues rows: empty, no crash
    odd_ids = [d["doc_id"] for d in DOCS if d["doc_id"] % 2 == 1]
    r = SegmentReader(out, doc_id_range=(1, 1))
    r.preload()
    mask = r.filter_mask((("lang", "==", "en"),))
    assert mask.sum() == 0
    assert odd_ids  # fixture sanity


# ---------------------------------------------------------------------------
# minimum_should_match + per-term boosts (ES bool.should / ^boost)
# ---------------------------------------------------------------------------


def _oracle_min_match(oracle, query, k, m):
    an = oracle.an
    terms = sorted(set(an.tokens(query)))
    doc_tokens = {d["doc_id"]: set(an.tokens(d["text"])) for d in DOCS}
    out = [
        (d, s) for d, s in _oracle_all_scores(oracle, query).items()
        if sum(t in doc_tokens[d] for t in terms) >= m
    ]
    out.sort(key=lambda e: (-e[1], e[0]))
    return out[:k]


def _oracle_boosted(oracle, query, k, boosts):
    terms = sorted(set(oracle.an.tokens(query)))
    cfg = oracle.cfg
    scores = {}
    for t in terms:  # ascending-term sums, like the engine
        plist = oracle.postings.get(t)
        if not plist:
            continue
        idf_t = oracle.idf(t)
        b = boosts.get(t, 1.0)
        for d, tf in plist.items():
            dl = oracle.dl[d]
            denom = tf + cfg.k1 * (1.0 - cfg.b + cfg.b * (dl / oracle.avgdl))
            scores[d] = scores.get(d, 0.0) + (idf_t * (tf / denom)) * b
    out = sorted(scores.items(), key=lambda e: (-e[1], e[0]))
    return out[:k]


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_min_match_matches_oracle(index_dir, oracle, impl):
    runs = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=7, impl=impl,
        min_match=2, concurrency=2, batch_size=4,
    )
    want = {
        qid: _oracle_min_match(oracle, text, 7, 2)
        for qid, text in QUERIES
    }
    want = {q: w for q, w in want.items() if w}
    got = _runs_rows(runs)
    # single-term q4 and half-dead q5 can never reach 2 matched terms...
    assert "q4" not in got
    # ...except q5's live term alone cannot satisfy min_match=2 either
    assert "q5" not in got
    _assert_matches(got, want)
    # min_match must actually prune relative to plain OR somewhere
    plain = _runs_rows(
        search_queries(_queries_ds(QUERIES), index_dir, top_k=7,
                       impl="pool", concurrency=2, batch_size=4)
    )
    assert any(len(got.get(q, [])) != len(plain.get(q, []))
               or got.get(q) != plain.get(q) for q in plain)


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_boosts_match_oracle(index_dir, oracle, impl):
    boosts = {"beta": 3.0, "rare1": 0.5, "gamma": 2.0}
    runs = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=7, impl=impl,
        boosts=boosts, concurrency=2, batch_size=4,
    )
    want = {
        qid: _oracle_boosted(oracle, text, 7, boosts)
        for qid, text in QUERIES
    }
    want = {q: w for q, w in want.items() if w}
    got = _runs_rows(runs)
    _assert_matches(got, want)
    # the boost must actually reorder at least one query vs plain BM25
    plain = {
        qid: [d for d, _ in oracle.topk(text, 7)] for qid, text in QUERIES
    }
    assert any(
        [d for d, _ in got.get(q, [])] != plain[q] for q in plain
    )


def test_boosts_compose_with_filter_and_min_match(index_dir, oracle):
    boosts = {"alpha": 4.0}
    pred = (("lang", "==", "en"),)
    allowed = {d["doc_id"] for d in DOCS if d["lang"] == "en"}
    an = oracle.an
    doc_tokens = {d["doc_id"]: set(an.tokens(d["text"])) for d in DOCS}
    runs = search_queries(
        _queries_ds(QUERIES[:3]), index_dir, top_k=5, impl="pool",
        boosts=boosts, filter_pred=pred, min_match=2,
        concurrency=2, batch_size=4,
    )
    want = {}
    for qid, text in QUERIES[:3]:
        terms = sorted(set(an.tokens(text)))
        rows = [
            (d, s) for d, s in _oracle_boosted(oracle, text, 10**9, boosts)
            if d in allowed
            and sum(t in doc_tokens[d] for t in terms) >= 2
        ]
        if rows:
            want[qid] = rows[:5]
    assert want
    _assert_matches(_runs_rows(runs), want)


def test_invalid_boost_and_phrase_combination(index_dir):
    with pytest.raises(ValueError, match="boosts must be > 0"):
        s = SearcherActor(index_dir, top_k=5, boosts={"alpha": -1.0})
        s.search_one("q", "alpha beta")
    with pytest.raises(ValueError, match="phrase"):
        SearcherActor(index_dir, top_k=5, query_kind="phrase",
                      boosts={"alpha": 2.0})


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_must_not_matches_oracle(index_dir, oracle, impl):
    # negate a mid-frequency word: survivors' scores must be EXACTLY the
    # unconstrained scores (must_not is filter-context), and no survivor
    # may contain a negated term
    neg = ["gamma", "rare1"]
    an = oracle.an
    neg_terms = {t for m in neg for t in an.tokens(m)}
    banned = {
        d["doc_id"] for d in DOCS
        if neg_terms & set(an.tokens(d["text"]))
    }
    allowed = {d["doc_id"] for d in DOCS} - banned
    assert banned and allowed  # fixture must exercise both sides
    runs = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=7, impl=impl,
        must_not=neg, concurrency=2, batch_size=4,
    )
    want = {
        qid: _oracle_constrained(oracle, text, 7, allowed=allowed)
        for qid, text in QUERIES
    }
    want = {q: w for q, w in want.items() if w}
    _assert_matches(_runs_rows(runs), want)


def test_facet_stats_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import facet_stats

    out = facet_stats(
        _queries_ds(QUERIES), index_dir, "n_chars"
    ).to_pandas().set_index("qid")
    an = oracle.an
    nchars = {d["doc_id"]: d["n_chars"] for d in DOCS}
    for qid, text in QUERIES:
        terms = set(an.tokens(text))
        match = {
            d["doc_id"] for d in DOCS
            if terms & set(an.tokens(d["text"]))
        }
        if not match:
            assert qid not in out.index
            continue
        vals = [nchars[d] for d in match]
        row = out.loc[qid]
        assert int(row["count"]) == len(vals)
        assert int(row["sum"]) == sum(vals)
        assert int(row["min"]) == min(vals)
        assert int(row["max"]) == max(vals)
        assert float(row["avg"]) == sum(vals) / len(vals)


def test_scan_matches_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import scan_matches

    out = scan_matches(_queries_ds(QUERIES), index_dir).to_pandas()
    got = {
        qid: set(g["doc_id"].astype(int))
        for qid, g in out.groupby("qid")
    }
    for qid, text in QUERIES:
        want = set(_oracle_all_scores(oracle, text))
        if not want:
            assert qid not in got, qid
            continue
        assert got[qid] == want, qid


def test_sort_by_field_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import sort_by_field

    nchars = {d["doc_id"]: d["n_chars"] for d in DOCS}
    an = oracle.an
    for desc in (True, False):
        out = sort_by_field(
            _queries_ds(QUERIES), index_dir, "n_chars", top_k=6,
            descending=desc,
        ).to_pandas()
        for qid, text in QUERIES:
            terms = set(an.tokens(text))
            match = {
                d["doc_id"] for d in DOCS
                if terms & set(an.tokens(d["text"]))
            }
            want = sorted(
                ((nchars[d], d) for d in match),
                key=lambda e: (-e[0], e[1]) if desc else (e[0], e[1]),
            )[:6]
            sub = out[out["qid"] == qid].sort_values("rank")
            got = [(int(v), int(d))
                   for v, d in zip(sub["sortval"], sub["doc_id"])]
            assert got == want, (desc, qid)


def test_facet_cardinality_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import facet_cardinality

    out = facet_cardinality(
        _queries_ds(QUERIES), index_dir, "lang"
    ).to_pandas().set_index("qid")
    an = oracle.an
    langs = {d["doc_id"]: d["lang"] for d in DOCS}
    for qid, text in QUERIES:
        terms = set(an.tokens(text))
        match = {
            d["doc_id"] for d in DOCS
            if terms & set(an.tokens(d["text"]))
        }
        if not match:
            assert qid not in out.index
            continue
        assert int(out.loc[qid, "cardinality"]) == len(
            {langs[d] for d in match}
        ), qid


def test_facet_cardinality_approx_and_guard(index_dir, oracle,
                                            ray_session):
    import pytest as _pytest
    import ray

    from webindex.search import facet_cardinality

    # approx=True (HLL sketch): at tiny cardinality the linear-counting
    # regime rounds to the exact answer, and the max-merged registers
    # are deterministic — so the estimate must EQUAL the exact path here
    exact = facet_cardinality(
        _queries_ds(QUERIES), index_dir, "lang"
    ).to_pandas().set_index("qid")
    approx = facet_cardinality(
        _queries_ds(QUERIES), index_dir, "lang", approx=True
    ).to_pandas().set_index("qid")
    assert sorted(exact.index) == sorted(approx.index)
    for qid in exact.index:
        assert int(approx.loc[qid, "cardinality"]) == int(
            exact.loc[qid, "cardinality"]
        ), qid

    # the exact path's circuit breaker: a max_distinct below the true
    # per-shard distinct count must raise and point at approx=True
    with _pytest.raises(ray.exceptions.RayTaskError,
                        match="approx=True"):
        facet_cardinality(
            _queries_ds(QUERIES), index_dir, "lang", max_distinct=1
        ).to_pandas()


def test_hll_sketch_accuracy_and_merge():
    """HLL registers: max-merge of split sketches == sketch of the
    union, and the estimate is within ~3 sigma at realistic scale."""
    import numpy as np

    from webindex.search import _hll_estimate, _hll_registers
    from webindex.util import stable_hash64

    n, p = 50_000, 14
    hs = np.fromiter(
        (stable_hash64(f"value-{i}") for i in range(n)),
        dtype=np.uint64, count=n,
    )
    whole = _hll_registers(hs, p)
    merged = np.maximum(_hll_registers(hs[: n // 3], p),
                        _hll_registers(hs[n // 3:], p))
    assert np.array_equal(whole, merged)
    est = _hll_estimate(whole)
    assert abs(est - n) / n < 3 * 1.04 / (1 << p) ** 0.5


def test_facet_multi_terms_matches_brute(index_dir, oracle, ray_session):
    """ES multi_terms: composite (lang, source) buckets over the match
    set; a doc missing either key field joins no bucket."""
    from collections import Counter

    from webindex.search import facet_multi_terms

    out = facet_multi_terms(
        _queries_ds(QUERIES), index_dir, ["lang", "n_chars"]
    ).to_pandas()
    an = oracle.an
    for qid, text in QUERIES:
        terms = set(an.tokens(text))
        want = Counter(
            (d["lang"], str(d["n_chars"])) for d in DOCS
            if terms & set(an.tokens(d["text"]))
        )
        sub = out[out["qid"] == qid]
        got = {
            (r.lang, r.n_chars): int(r.cnt) for r in sub.itertuples()
        }
        assert got == dict(want), qid


def test_facet_rare_terms_matches_brute(index_dir, oracle, ray_session):
    """ES rare_terms: only buckets with global count <= max_doc_count
    survive; the cut runs after the cross-shard merge."""
    from collections import Counter

    from webindex.search import facet_rare_terms

    for mdc in (1, 2, 40):
        out = facet_rare_terms(
            _queries_ds(QUERIES), index_dir, "lang", max_doc_count=mdc
        ).to_pandas()
        an = oracle.an
        any_want = False
        for qid, text in QUERIES:
            terms = set(an.tokens(text))
            cnt = Counter(
                d["lang"] for d in DOCS
                if terms & set(an.tokens(d["text"]))
            )
            want = {v: c for v, c in cnt.items() if c <= mdc}
            any_want = any_want or bool(want)
            if out.empty:
                assert want == {}, (qid, mdc)
                continue
            sub = out[out["qid"] == qid]
            got = dict(zip(sub["value"], sub["cnt"].astype(int)))
            assert got == want, (qid, mdc)
        if mdc == 40:
            assert any_want  # the permissive cut must keep buckets


def test_facet_histogram_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import facet_histogram

    interval = 50
    out = facet_histogram(
        _queries_ds(QUERIES), index_dir, "n_chars", interval
    ).to_pandas()
    an = oracle.an
    nchars = {d["doc_id"]: d["n_chars"] for d in DOCS}
    for qid, text in QUERIES:
        terms = set(an.tokens(text))
        match = {
            d["doc_id"] for d in DOCS
            if terms & set(an.tokens(d["text"]))
        }
        sub = out[out["qid"] == qid]
        if not match:
            assert sub.empty
            continue
        from collections import Counter

        want = Counter((nchars[d] // interval) * interval for d in match)
        got = dict(zip(sub["bucket"].astype(int), sub["cnt"].astype(int)))
        assert got == dict(want), qid


def test_facet_percentiles_matches_brute(index_dir, oracle, ray_session):
    import math

    from webindex.search import facet_percentiles

    ps = (10, 50, 90)
    out = facet_percentiles(
        _queries_ds(QUERIES), index_dir, "n_chars", ps=ps
    ).to_pandas()
    an = oracle.an
    nchars = {d["doc_id"]: d["n_chars"] for d in DOCS}
    for qid, text in QUERIES:
        terms = set(an.tokens(text))
        vals = sorted(
            nchars[d["doc_id"]] for d in DOCS
            if terms & set(an.tokens(d["text"]))
        )
        sub = out[out["qid"] == qid].set_index("p")
        if not vals:
            assert sub.empty
            continue
        n = len(vals)
        for p in ps:
            k = min(max(math.ceil(p * n / 100), 1), n)
            assert int(sub.loc[p, "value"]) == vals[k - 1], (qid, p)


def test_collapse_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import collapse_queries

    out = collapse_queries(
        _queries_ds(QUERIES), index_dir, "lang", top_k=4
    ).to_pandas()
    an = oracle.an
    langs = {d["doc_id"]: d["lang"] for d in DOCS}
    for qid, text in QUERIES:
        scores = _oracle_all_scores(oracle, text)
        ranked = sorted(scores.items(), key=lambda e: (-e[1], e[0]))
        seen, want = set(), []
        for did, sc in ranked:
            k = langs[did]
            if k in seen:
                continue
            seen.add(k)
            want.append((did, k))
            if len(want) == 4:
                break
        sub = out[out["qid"] == qid].sort_values("rank")
        got = list(zip(sub["doc_id"].astype(int), sub["ckey"]))
        assert got == want, qid
        # one hit per collapse key
        assert sub["ckey"].is_unique


def _brute_span_near(tokens, doc_tokens, slop):
    """In-order span_near: exists p0 < ... < p_{m-1}, token i at p_i,
    (p_{m-1} - p0) - (m-1) <= slop. Exhaustive over ALL position
    combinations (independent of the engine's greedy-chain kernel)."""
    from itertools import product

    m = len(tokens)
    occ = [
        [i for i, t in enumerate(doc_tokens) if t == tok] for tok in tokens
    ]
    for combo in product(*occ):
        if all(a < b for a, b in zip(combo, combo[1:])) and (
            (combo[-1] - combo[0]) - (m - 1) <= slop
        ):
            return True
    return False


SPANS = [
    ("s1", "alpha gamma", 1),
    ("s2", "alpha beta", 2),
    ("s3", "gamma delta epsilon", 2),
    ("s4", "beta beta", 1),
    ("s5", "alpha nosuchterm", 3),
]


def test_span_near_matches_brute(pos_index_dir, oracle, ray_session):
    from webindex.search import search_queries

    an = oracle.an
    toks = {d["doc_id"]: an.tokens(d["text"]) for d in DOCS}
    for qid, text, slop in SPANS:
        runs = search_queries(
            _queries_ds([(qid, text)]), pos_index_dir, top_k=8,
            query_kind="phrase", slop=slop,
        )
        tokens = an.tokens(text)
        matched = {
            d for d, tl in toks.items()
            if tokens and _brute_span_near(tokens, tl, slop)
        }
        want = _oracle_constrained(oracle, text, 8, allowed=matched,
                                   require_all=True)
        df = runs.to_pandas()
        if not want:
            assert df.empty, qid
            continue
        got = {
            q: [(int(d), float(s)) for d, s in zip(g["doc_id"], g["score"])]
            for q, g in df.sort_values(["qid", "rank"]).groupby("qid")
        }
        assert got[qid] == want, qid


def _brute_span_unordered(tokens, doc_tokens, slop):
    """Any-order window: exists one position per (distinct) token with
    (max - min) - (m-1) <= slop. Exhaustive over ALL combinations."""
    from itertools import product

    m = len(tokens)
    occ = [
        [i for i, t in enumerate(doc_tokens) if t == tok] for tok in tokens
    ]
    for combo in product(*occ):
        if (max(combo) - min(combo)) - (m - 1) <= slop:
            return True
    return False


def test_span_near_unordered_matches_brute(pos_index_dir, oracle,
                                           ray_session):
    from webindex.search import search_queries

    an = oracle.an
    toks = {d["doc_id"]: an.tokens(d["text"]) for d in DOCS}
    for qid, text, slop in SPANS:
        tokens = an.tokens(text)
        if len(set(tokens)) != len(tokens):
            continue  # distinct-clause requirement (s4)
        runs = search_queries(
            _queries_ds([(qid, text)]), pos_index_dir, top_k=8,
            query_kind="phrase", slop=slop, in_order=False,
        )
        matched = {
            d for d, tl in toks.items()
            if tokens and _brute_span_unordered(tokens, tl, slop)
        }
        want = _oracle_constrained(oracle, text, 8, allowed=matched,
                                   require_all=True)
        df = runs.to_pandas()
        if not want:
            assert df.empty, qid
            continue
        got = {
            q: [(int(d), float(s)) for d, s in zip(g["doc_id"], g["score"])]
            for q, g in df.sort_values(["qid", "rank"]).groupby("qid")
        }
        assert got[qid] == want, qid


def test_span_unordered_superset_of_ordered(pos_index_dir, oracle):
    from webindex.positional import span_near_topk, span_near_unordered_topk
    from webindex.segments import SegmentReader

    r = SegmentReader(pos_index_dir)
    r.preload()
    for qid, text, slop in SPANS:
        tokens = oracle.an.tokens(text)
        if len(set(tokens)) != len(tokens):
            import pytest as _pytest

            with _pytest.raises(ValueError, match="distinct"):
                span_near_unordered_topk(r, tokens, 10, slop=slop)
            continue
        o_ids, _ = span_near_topk(r, tokens, 10**6, slop=slop)
        u_ids, _ = span_near_unordered_topk(r, tokens, 10**6, slop=slop)
        assert set(o_ids.tolist()) <= set(u_ids.tolist()), qid


def test_span_near_slop0_is_exact_phrase(pos_index_dir, oracle):
    from webindex.positional import phrase_topk, span_near_topk
    from webindex.segments import SegmentReader

    r = SegmentReader(pos_index_dir)
    r.preload()
    for _qid, text in PHRASES:
        tokens = oracle.an.tokens(text)
        a_ids, a_sc = phrase_topk(r, tokens, 10)
        b_ids, b_sc = span_near_topk(r, tokens, 10, slop=0)
        assert a_ids.tolist() == b_ids.tolist()
        assert a_sc.tolist() == b_sc.tolist()


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_field_value_factor_matches_oracle(index_dir, oracle, impl):
    """ES function_score field_value_factor: score * (1 + w * docvalue),
    same float-op order as the engine."""
    w = 0.001
    nchars = {d["doc_id"]: d["n_chars"] for d in DOCS}
    runs = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=7, impl=impl,
        field_factor=("n_chars", w), concurrency=2, batch_size=4,
    )
    got = _runs_rows(runs)
    for qid, text in QUERIES:
        scores = _oracle_all_scores(oracle, text)
        want = sorted(
            ((d, s * (1.0 + w * nchars[d])) for d, s in scores.items()),
            key=lambda e: (-e[1], e[0]),
        )[:7]
        if not want:
            assert qid not in got
            continue
        assert got[qid] == want, (impl, qid)


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_dis_max_matches_oracle(index_dir, oracle, impl):
    """ES dis_max: score = best clause + tie_breaker * (sum of others),
    computed as max + tb * (sum - max) with the pinned term sum."""
    tb = 0.3
    an = oracle.an
    runs = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=7, impl=impl,
        dis_max=tb, concurrency=2, batch_size=4,
    )
    got = _runs_rows(runs)
    for qid, text in QUERIES:
        terms = sorted(set(an.tokens(text)))
        per_doc: dict[int, list[float]] = {}
        for t in terms:
            for d, c in oracle.contribs(t).items():
                per_doc.setdefault(d, []).append(c)
        want = []
        for d, cs in per_doc.items():
            s = 0.0
            for c in cs:  # ascending-term order (terms iterated sorted)
                s += c
            mx = max(cs)
            want.append((d, mx + tb * (s - mx)))
        want = sorted(want, key=lambda e: (-e[1], e[0]))[:7]
        if not want:
            assert qid not in got
            continue
        assert got[qid] == want, (impl, qid)


def test_match_phrase_prefix_matches_brute(pos_index_dir, oracle,
                                           ray_session):
    """ES match_phrase_prefix: last term is a prefix; score = max over
    matched expansions of the exact phrase score of base+[e]."""
    from webindex.lexicon import match_phrase_prefix

    an = oracle.an
    doc_toks = {d["doc_id"]: an.tokens(d["text"]) for d in DOCS}

    def phrase_in(tokens, tl):
        m = len(tokens)
        return any(
            tl[i: i + m] == tokens for i in range(len(tl) - m + 1)
        )

    queries = [("mp1", "alpha bet"), ("mp2", "gamma delta epsil"),
               ("mp3", "e"), ("mp4", "alpha nosuchpref")]
    out = match_phrase_prefix(
        queries, pos_index_dir, top_k=6
    ).to_pandas()
    for qid, text in queries:
        toks = an.tokens(text)
        base, pre = toks[:-1], toks[-1]
        exps = sorted(t for t in oracle.postings if t.startswith(pre))
        best: dict[int, float] = {}
        for e in exps:
            variant = base + [e]
            uniq = sorted(set(variant))
            for d, tl in doc_toks.items():
                if phrase_in(variant, tl):
                    s = 0.0
                    for t in uniq:
                        s += oracle.contribs(t).get(d, 0.0)
                    if d not in best or s > best[d]:
                        best[d] = s
        want = sorted(best.items(), key=lambda e2: (-e2[1], e2[0]))[:6]
        sub = out[out["qid"] == qid].sort_values("rank")
        got = [(int(d), float(s))
               for d, s in zip(sub["doc_id"], sub["score"])]
        assert got == want, qid
    assert (out["qid"] == "mp3").any()  # multi-expansion case exercised
    assert not (out["qid"] == "mp4").any()


def test_top_hits_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import top_hits

    k = 2
    out = top_hits(
        _queries_ds(QUERIES), index_dir, "lang", per_group_k=k
    ).to_pandas()
    langs = {d["doc_id"]: d["lang"] for d in DOCS}
    for qid, text in QUERIES:
        scores = _oracle_all_scores(oracle, text)
        ranked = sorted(scores.items(), key=lambda e: (-e[1], e[0]))
        want: dict[str, list[int]] = {}
        for d, _s in ranked:
            want.setdefault(langs[d], [])
            if len(want[langs[d]]) < k:
                want[langs[d]].append(d)
        sub = out[out["qid"] == qid]
        if not scores:
            assert sub.empty
            continue
        got = {
            gk: [int(d) for d in g.sort_values("rank")["doc_id"]]
            for gk, g in sub.groupby("gkey")
        }
        assert got == want, qid
        # rank is 1-based and dense within each bucket
        for _gk, g in sub.groupby("gkey"):
            assert sorted(g["rank"]) == list(range(1, len(g) + 1))


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_neg_boost_demotes_matches_oracle(index_dir, oracle, impl):
    neg, factor = ["gamma"], 0.5
    an = oracle.an
    neg_terms = {t for m in neg for t in an.tokens(m)}
    demoted = {
        d["doc_id"] for d in DOCS
        if neg_terms & set(an.tokens(d["text"]))
    }
    runs = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=7, impl=impl,
        neg_boost=(neg, factor), concurrency=2, batch_size=4,
    )
    got = _runs_rows(runs)
    for qid, text in QUERIES:
        scores = _oracle_all_scores(oracle, text)
        want = sorted(
            ((d, s * factor if d in demoted else s)
             for d, s in scores.items()),
            key=lambda e: (-e[1], e[0]),
        )[:7]
        if not want:
            assert qid not in got
            continue
        assert got[qid] == want, (impl, qid)


def test_rrf_fuse_matches_brute(index_dir, oracle, ray_session):
    """RRF hybrid fusion of two retrievers (BM25 OR-match vs AND-match
    rankings) against a plain-Python recomputation."""
    from webindex.rerank import rrf_fuse

    win, kc, topk = 6, 60, 5
    runs_a = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=win, concurrency=2,
        batch_size=4,
    )
    runs_b = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=win, match="and",
        concurrency=2, batch_size=4,
    )
    fused = rrf_fuse([runs_a, runs_b], k_const=kc, top_k=topk).to_pandas()
    for qid, text in QUERIES:
        ra = _oracle_constrained(oracle, text, win)
        rb = _oracle_constrained(oracle, text, win, require_all=True)
        score: dict[int, float] = {}
        for side in (ra, rb):  # side order pinned
            for r, (d, _s) in enumerate(side, 1):
                score[d] = score.get(d, 0.0) + 1.0 / (kc + r)
        want = sorted(score.items(), key=lambda e: (-e[1], e[0]))[:topk]
        sub = fused[fused["qid"] == qid].sort_values("rank")
        got = [(int(d), float(s))
               for d, s in zip(sub["doc_id"], sub["score"])]
        if not want:
            assert sub.empty, qid
            continue
        assert got == want, qid


def test_fetch_fields_matches_docvalues(index_dir, oracle, ray_session):
    """The fetch phase attaches exactly the sidecar's values (and nulls
    for unknown docs), routed to the owning shard by docID."""
    from webindex.search import fetch_fields

    runs = search_queries(
        _queries_ds(QUERIES), index_dir, top_k=6, concurrency=2,
        batch_size=4,
    )
    out = fetch_fields(runs, index_dir, ["lang", "n_chars"]).to_pandas()
    langs = {d["doc_id"]: d["lang"] for d in DOCS}
    nchars = {d["doc_id"]: d["n_chars"] for d in DOCS}
    assert len(out) == runs.count()
    for row in out.itertuples(index=False):
        d = int(row.doc_id)
        assert row.lang == langs[d], d
        assert int(row.n_chars) == nchars[d], d


def test_span_first_matches_brute(pos_index_dir, oracle, ray_session):
    from webindex.positional import span_first_topk
    from webindex.segments import SegmentReader

    r = SegmentReader(pos_index_dir)
    r.preload()
    an = oracle.an
    doc_toks = {d["doc_id"]: an.tokens(d["text"]) for d in DOCS}
    for term, end in (("alpha", 3), ("rare1", 5), ("beta", 1),
                      ("nosuch", 4)):
        ids, scores = span_first_topk(r, term, 8, end=end)
        matched = {
            d for d, tl in doc_toks.items()
            if any(t == term for t in tl[:end])
        }
        want = _oracle_constrained(oracle, term, 8, allowed=matched)
        assert ids.tolist() == [d for d, _ in want], (term, end)
        for g, (_, w) in zip(scores.tolist(), want):
            assert g == w, (term, end)


@pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
def test_decay_matches_brute_oracle(index_dir, oracle, kind):
    """function_score decay (search.decay_queries) vs a from-first-
    principles recompute over the pinned formulas."""
    import math

    import ray.data as rd

    from webindex.search import decay_queries

    origin, scale, rate, k = 150.0, 80.0, 0.5, 7
    nc = {d["doc_id"]: d["n_chars"] for d in DOCS}
    want = {}
    for qid, text in QUERIES[:3]:
        scores = _oracle_all_scores(oracle, text)
        fin = []
        for did, sc in scores.items():
            v = float(nc[did])
            d = max(0.0, abs(v - origin) - 0.0)
            if kind == "gauss":
                f = math.exp((math.log(rate) / (scale * scale)) * (d * d))
            elif kind == "exp":
                f = math.exp((math.log(rate) / scale) * d)
            else:
                s = scale / (1.0 - rate)
                f = max(0.0, (s - d) / s)
            fin.append((did, sc * f))
        fin.sort(key=lambda t: (-t[1], t[0]))
        want[qid] = fin[:k]

    qds = rd.from_arrow(pa.table({
        "qid": pa.array([q for q, _ in QUERIES[:3]]),
        "text": pa.array([t for _, t in QUERIES[:3]]),
    }))
    rows = decay_queries(qds, index_dir, "n_chars", origin=origin,
                         scale=scale, decay=rate, kind=kind,
                         top_k=k).take_all()
    got = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    assert set(got) == set(want)
    for qid in want:
        assert [d for d, _ in got[qid]] == [d for d, _ in want[qid]], qid
        for (_, a), (_, b) in zip(got[qid], want[qid]):
            assert a == pytest.approx(b, rel=1e-12)


def test_decay_param_validation(index_dir):
    import ray.data as rd

    from webindex.search import decay_queries

    qds = rd.from_arrow(pa.table({"qid": ["a"], "text": ["alpha"]}))
    with pytest.raises(ValueError, match="kind"):
        decay_queries(qds, index_dir, "n_chars", origin=0, scale=1,
                      kind="triangle")
    with pytest.raises(ValueError, match="decay"):
        decay_queries(qds, index_dir, "n_chars", origin=0, scale=1,
                      decay=1.5)


# ---------------------------------------------------------------------------
# extended_stats / range / terms+stats sub-agg / composite pagination
# ---------------------------------------------------------------------------


def _match_docs(oracle, query):
    return sorted(_oracle_all_scores(oracle, query))


def test_facet_extended_stats_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import facet_extended_stats

    out = facet_extended_stats(
        _queries_ds(QUERIES), index_dir, "n_chars"
    ).to_pandas().set_index("qid")
    lens = {d["doc_id"]: d["n_chars"] for d in DOCS}
    seen = set()
    for qid, text in QUERIES:
        docs = _match_docs(oracle, text)
        if not docs:
            assert qid not in out.index
            continue
        seen.add(qid)
        v = np.array([lens[d] for d in docs], dtype=np.int64)
        row = out.loc[qid]
        assert int(row["count"]) == v.size
        assert int(row["sum"]) == int(v.sum())
        assert int(row["min"]) == int(v.min())
        assert int(row["max"]) == int(v.max())
        assert int(row["sum_sq"]) == int((v * v).sum())
        c, s, sq = v.size, int(v.sum()), int((v * v).sum())
        avg = s / c
        var = max(sq / c - (s / c) * (s / c), 0.0)
        assert row["avg"] == avg
        assert row["variance"] == var
        assert row["std"] == np.sqrt(var)
    assert set(out.index) == seen


def test_facet_range_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import facet_range

    ranges = [(None, 120), (120, 180), (180, None), (100, 200)]  # overlap
    out = facet_range(
        _queries_ds(QUERIES), index_dir, "n_chars", ranges
    ).to_pandas()
    got = {
        (r.qid, r.range): int(r.cnt) for r in out.itertuples(index=False)
    }
    lens = {d["doc_id"]: d["n_chars"] for d in DOCS}
    want = {}
    for qid, text in QUERIES:
        for d in _match_docs(oracle, text):
            v = lens[d]
            for lo, hi in ranges:
                if (lo is None or v >= lo) and (hi is None or v < hi):
                    lab = (f"{'*' if lo is None else lo}_"
                           f"{'*' if hi is None else hi}")
                    want[(qid, lab)] = want.get((qid, lab), 0) + 1
    assert got == want


def test_facet_stats_by_matches_brute(index_dir, oracle, ray_session):
    from webindex.search import facet_stats_by

    out = facet_stats_by(
        _queries_ds(QUERIES), index_dir, "lang", "n_chars"
    ).to_pandas()
    by = {d["doc_id"]: (d["lang"], d["n_chars"]) for d in DOCS}
    want = {}
    for qid, text in QUERIES:
        for d in _match_docs(oracle, text):
            lang, n = by[d]
            want.setdefault((qid, lang), []).append(n)
    assert {(r.qid, r.value) for r in out.itertuples(index=False)} == set(
        want
    )
    for r in out.itertuples(index=False):
        v = np.array(want[(r.qid, r.value)], dtype=np.int64)
        assert (int(r.count), int(r.sum), int(r.min), int(r.max)) == (
            v.size, int(v.sum()), int(v.min()), int(v.max())
        )
        assert r.avg == int(v.sum()) / v.size


def test_composite_buckets_paginates(index_dir, oracle, ray_session):
    from webindex.search import composite_buckets

    lens = {d["doc_id"]: d["n_chars"] for d in DOCS}

    def brute(text, size, after):
        from collections import Counter

        c = Counter(lens[d] for d in _match_docs(oracle, text))
        vals = sorted(v for v in c if after is None or v > after)[:size]
        return [(v, c[v]) for v in vals]

    # walk q1's buckets in pages of 5: concatenated pages == one big page
    pages, after = [], None
    while True:
        out = composite_buckets(
            _queries_ds([("q1", QUERIES[0][1])]), index_dir,
            "n_chars", size=5, after=after,
        ).to_pandas()
        if out.empty:
            break
        out = out.sort_values("value")
        pages.extend(
            (int(v), int(c)) for v, c in zip(out["value"], out["cnt"])
        )
        assert len(out) <= 5
        assert pages == brute(QUERIES[0][1], len(pages), None)
        after = int(out["value"].max())
    assert pages == brute(QUERIES[0][1], 10**9, None)
    # multi-query single page with a cursor
    out = composite_buckets(
        _queries_ds(QUERIES), index_dir, "n_chars", size=3, after=100
    ).to_pandas()
    for qid, text in QUERIES:
        g = out[out["qid"] == qid].sort_values("value")
        assert [
            (int(v), int(c)) for v, c in zip(g["value"], g["cnt"])
        ] == brute(text, 3, 100)


def _nearest_rank_brute(sorted_vals, p):
    n = len(sorted_vals)
    k = min(max(-(-p * n // 100), 1), n)
    return sorted_vals[k - 1]


def test_facet_boxplot_matches_brute(index_dir, oracle):
    """ES boxplot (exact): min/q1/q2/q3/max of n_chars over the match
    set, quartiles by the nearest-rank rule."""
    from webindex.search import facet_boxplot

    got = facet_boxplot(_queries_ds(QUERIES), index_dir, "n_chars").to_pandas()
    for qid, text in QUERIES:
        m = _match_doc_rows(oracle, text)
        g = got[got["qid"] == qid]
        assert len(g) == (1 if m else 0), qid
        if not m:
            continue
        vals = sorted(d["n_chars"] for d in m)
        r = g.iloc[0]
        assert int(r["min"]) == vals[0] and int(r["max"]) == vals[-1], qid
        for col, p in (("q1", 25), ("q2", 50), ("q3", 75)):
            assert int(r[col]) == _nearest_rank_brute(vals, p), (qid, col)


def test_facet_mad_matches_brute(index_dir, oracle):
    """ES median_absolute_deviation (exact): nearest-rank median, then
    nearest-rank median of |v - median|."""
    from webindex.search import facet_mad

    got = facet_mad(_queries_ds(QUERIES), index_dir, "n_chars").to_pandas()
    for qid, text in QUERIES:
        m = _match_doc_rows(oracle, text)
        g = got[got["qid"] == qid]
        assert len(g) == (1 if m else 0), qid
        if not m:
            continue
        vals = sorted(d["n_chars"] for d in m)
        med = _nearest_rank_brute(vals, 50)
        devs = sorted(abs(v - med) for v in vals)
        assert int(g["median"].iloc[0]) == med, qid
        assert int(g["mad"].iloc[0]) == _nearest_rank_brute(devs, 50), qid


def test_facet_t_test_matches_brute(index_dir, oracle):
    """ES t_test (Welch) of n_chars between the en and fr lang buckets:
    exact int partials, pinned float tail replayed here op for op."""
    import math

    from webindex.search import facet_t_test

    buckets = {"a_en": (("lang", "==", "en"),),
               "b_fr": (("lang", "==", "fr"),)}
    got = facet_t_test(
        _queries_ds(QUERIES), index_dir, "n_chars", buckets
    ).to_pandas()

    def welch(xs, ys):
        na, nb = len(xs), len(ys)
        if na < 2 or nb < 2:
            return None
        ma, mb = sum(xs) / na, sum(ys) / nb
        ea = sum(x * x for x in xs) / na
        eb = sum(y * y for y in ys) / nb
        va = max(0.0, ea - ma * ma) * (na / (na - 1.0))
        vb = max(0.0, eb - mb * mb) * (nb / (nb - 1.0))
        d = va / na + vb / nb
        if d <= 0.0:
            return None
        return na, nb, ma, mb, (ma - mb) / math.sqrt(d)

    for qid, text in QUERIES:
        m = _match_doc_rows(oracle, text)
        xs = [d["n_chars"] for d in m if d["lang"] == "en"]
        ys = [d["n_chars"] for d in m if d["lang"] == "fr"]
        want = welch(xs, ys)
        g = got[got["qid"] == qid]
        assert len(g) == (0 if want is None else 1), qid
        if want is None:
            continue
        r = g.iloc[0]
        assert (int(r["n_a"]), int(r["n_b"])) == want[:2], qid
        assert float(r["mean_a"]) == want[2], qid
        assert float(r["mean_b"]) == want[3], qid
        assert float(r["t"]) == want[4], qid


def test_facet_matrix_stats_matches_brute(index_dir, oracle):
    """ES matrix_stats between n_chars (x) and doc token length (y):
    exact int64 moment partials, pinned float tail replayed op for op."""
    import math

    from webindex.search import facet_matrix_stats

    an = oracle.an
    got = facet_matrix_stats(
        _queries_ds(QUERIES), index_dir, "n_chars"
    ).to_pandas()
    for qid, text in QUERIES:
        m = _match_doc_rows(oracle, text)
        g = got[got["qid"] == qid]
        if not m:
            assert g.empty, qid
            continue
        xs = [d["n_chars"] for d in m]
        ys = [len(an.tokens(d["text"])) for d in m]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        var_x = max(0.0, sum(x * x for x in xs) / n - mx * mx)
        var_y = max(0.0, sum(y * y for y in ys) / n - my * my)
        cov = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
        if var_x <= 0.0 or var_y <= 0.0:
            assert g.empty, qid
            continue
        corr = cov / (math.sqrt(var_x) * math.sqrt(var_y))
        r = g.iloc[0]
        assert int(r["n"]) == n, qid
        assert float(r["mean_x"]) == mx and float(r["mean_y"]) == my, qid
        assert float(r["var_x"]) == var_x, qid
        assert float(r["var_y"]) == var_y, qid
        assert float(r["covariance"]) == cov, qid
        assert float(r["correlation"]) == corr, qid


SPAN_NOTS = [
    # (qid, include phrase, exclude, pre, post)
    ("sn1", "alpha beta", "gamma", 0, 0),
    ("sn2", "alpha beta", "gamma", 1, 1),
    ("sn3", "gamma delta", "alpha", 0, 2),
    ("sn4", "alpha beta", "nosuchterm", 0, 0),
]


def _brute_span_not(phrase, exclude, pre, post, toks):
    m = len(phrase)
    for i in range(len(toks) - m + 1):
        if toks[i:i + m] != phrase:
            continue
        lo, hi = max(i - pre, 0), i + m - 1 + post
        if not any(t == exclude for t in toks[lo:hi + 1]):
            return True
    return False


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_span_not_matches_brute(pos_index_dir, oracle, impl):
    from webindex.search import search_queries

    an = oracle.an
    doc_toks = {d["doc_id"]: an.tokens(d["text"]) for d in DOCS}
    for qid, text, ex, pre, post in SPAN_NOTS:
        phrase = an.tokens(text)
        runs = search_queries(
            _queries_ds([(qid, text)]), pos_index_dir, top_k=8,
            query_kind="phrase", impl=impl,
            span=("not", ex, pre, post),
        )
        matched = {
            d for d, tl in doc_toks.items()
            if _brute_span_not(phrase, ex, pre, post, tl)
        }
        want = _oracle_constrained(oracle, text, 8, allowed=matched,
                                   require_all=True)
        df = runs.to_pandas()
        if not want:
            assert df.empty, qid
            continue
        got = [
            (int(d), float(s))
            for d, s in zip(
                df.sort_values("rank")["doc_id"], df.sort_values("rank")["score"]
            )
        ]
        assert got == want, qid


SPAN_CONTAINING = [
    # (qid, big pair text, little, slop)
    ("sc1", "alpha beta", "gamma", 3),
    ("sc2", "alpha gamma", "beta", 2),
    ("sc3", "gamma epsilon", "delta", 4),
    ("sc4", "alpha beta", "nosuchterm", 5),
]


def _brute_span_containing(a, b, little, slop, toks):
    pas = [i for i, t in enumerate(toks) if t == a]
    pbs = [i for i, t in enumerate(toks) if t == b]
    qs = [i for i, t in enumerate(toks) if t == little]
    return any(
        pa < pb and (pb - pa) - 1 <= slop and pa <= q <= pb
        for pa in pas for pb in pbs for q in qs
    )


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_span_containing_matches_brute(pos_index_dir, oracle, impl):
    from webindex.search import search_queries

    an = oracle.an
    doc_toks = {d["doc_id"]: an.tokens(d["text"]) for d in DOCS}
    for qid, text, little, slop in SPAN_CONTAINING:
        a, b = an.tokens(text)
        runs = search_queries(
            _queries_ds([(qid, text)]), pos_index_dir, top_k=8,
            query_kind="phrase", impl=impl, slop=slop,
            span=("containing", little),
        )
        matched = {
            d for d, tl in doc_toks.items()
            if _brute_span_containing(a, b, little, slop, tl)
        }
        want = _oracle_constrained(
            oracle, f"{text} {little}", 8, allowed=matched, require_all=True
        )
        df = runs.to_pandas()
        if not want:
            assert df.empty, qid
            continue
        df = df.sort_values("rank")
        got = [(int(d), float(s)) for d, s in zip(df["doc_id"], df["score"])]
        assert got == want, qid


SPAN_OR_NEARS = [
    ("so1", "alpha|beta gamma", 1),
    ("so2", "alpha|gamma delta|epsilon", 2),
    ("so3", "rare1|rare2 alpha", 3),
    ("so4", "alpha nosuchterm|beta", 1),
    ("so5", "alpha nosucha|nosuchb", 2),
]


def _brute_span_or_near(slots, slop, toks):
    from itertools import product

    m = len(slots)
    occ = []
    for alts in slots:
        o = [i for i, t in enumerate(toks) if t in alts]
        if not o:
            return False
        occ.append(o)
    for combo in product(*occ):
        if all(combo[i] > combo[i - 1] for i in range(1, m)) and (
            (combo[-1] - combo[0]) - (m - 1) <= slop
        ):
            return True
    return False


@pytest.mark.parametrize("impl", ["pool", "sharded"])
def test_span_or_near_matches_brute(pos_index_dir, oracle, impl):
    from webindex.search import search_queries

    an = oracle.an
    doc_toks = {d["doc_id"]: an.tokens(d["text"]) for d in DOCS}
    for qid, text, slop in SPAN_OR_NEARS:
        slots = [
            [t for alt in slot.split("|") for t in an.tokens(alt)]
            for slot in text.split()
        ]
        runs = search_queries(
            _queries_ds([(qid, text)]), pos_index_dir, top_k=8,
            query_kind="phrase", impl=impl, slop=slop,
            span=("or_near",),
        )
        matched = {
            d for d, tl in doc_toks.items()
            if _brute_span_or_near(slots, slop, tl)
        }
        # OR-style scoring over the union of slot terms: only terms the
        # doc contains contribute
        flat = " ".join(t for s in slots for t in s)
        want = _oracle_constrained(oracle, flat, 8, allowed=matched,
                                   require_all=False)
        df = runs.to_pandas()
        if not want:
            assert df.empty, qid
            continue
        df = df.sort_values("rank")
        got = [(int(d), float(s)) for d, s in zip(df["doc_id"], df["score"])]
        assert got == want, qid


@pytest.mark.parametrize("cap", [None, 2])
def test_sampler_terms_matches_brute(index_dir, oracle, cap):
    """ES sampler / diversified_sampler + terms sub-agg: value counts
    over the pinned global top-shard_size sample (per-value cap for the
    diversified variant), replayed here by a sequential walk."""
    from collections import Counter

    from webindex.search import sampler_terms

    shard_size = 12
    langs = {d["doc_id"]: d["lang"] for d in DOCS}
    got = sampler_terms(
        _queries_ds(QUERIES), index_dir, "lang",
        shard_size=shard_size, max_docs_per_value=cap,
    ).to_pandas()
    for qid, text in QUERIES:
        ranking = sorted(
            _oracle_all_scores(oracle, text).items(),
            key=lambda e: (-e[1], e[0]),
        )
        kept, per_v = [], Counter()
        for doc_id, _sc in ranking:
            v = langs[doc_id]
            if cap is not None and per_v[v] >= cap:
                continue
            kept.append(v)
            per_v[v] += 1
            if len(kept) >= shard_size:
                break
        want = dict(Counter(kept))
        g = got[got["qid"] == qid]
        assert dict(zip(g["value"], g["cnt"])) == want, (qid, cap)


def test_terms_set_matches_brute(index_dir, oracle):
    """ES terms_set: per-doc required distinct-match count from the
    n_chars docvalue ((v % 3) + 1), OR-scored over present terms."""
    from webindex.search import terms_set_queries

    an = oracle.an
    got = terms_set_queries(
        _queries_ds(QUERIES), index_dir, "n_chars", top_k=8
    ).to_pandas()
    req = {d["doc_id"]: (d["n_chars"] % 3) + 1 for d in DOCS}
    doc_terms = {d["doc_id"]: set(an.tokens(d["text"])) for d in DOCS}
    for qid, text in QUERIES:
        terms = sorted(set(an.tokens(text)))
        scores = _oracle_all_scores(oracle, text)
        rows = [
            (did, sc) for did, sc in scores.items()
            if sum(t in doc_terms[did] for t in terms) >= req[did]
        ]
        rows.sort(key=lambda e: (-e[1], e[0]))
        want = rows[:8]
        g = got[got["qid"] == qid]
        if not want:
            assert g.empty, qid
            continue
        g = g.sort_values("rank")
        assert [
            (int(d), float(s)) for d, s in zip(g["doc_id"], g["score"])
        ] == want, qid


def test_pinned_matches_brute(index_dir, oracle):
    """ES pinned query: pins first in given order (unmatched pins score
    0.0), organic BM25 fills the rest excluding pins."""
    from webindex.search import pinned_queries

    k = 8
    pins = {"q1": [140, 3], "q4": [0, 1, 2]}
    runs = pinned_queries(
        _queries_ds(QUERIES[:2] + [("q4", "rare2")]), index_dir, pins,
        top_k=k,
    )
    got = {}
    for r in sorted(runs.take_all(), key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append(
            (r["doc_id"], r["score"], r["pinned"])
        )
    for qid, text in [("q1", QUERIES[0][1]), ("q2", QUERIES[1][1]),
                      ("q4", "rare2")]:
        scores = _oracle_all_scores(oracle, text)
        p = [d for d in pins.get(qid, []) if d < N_DOCS]
        want = [(d, scores.get(d, 0.0), 1) for d in p]
        org = sorted(
            ((d, s) for d, s in scores.items() if d not in p),
            key=lambda t: (-t[1], t[0]),
        )
        want += [(d, s, 0) for d, s in org]
        want = want[:k]
        assert got[qid] == [
            (d, pytest.approx(s, rel=1e-12), f) for d, s, f in want
        ], qid


@pytest.fixture(scope="module")
def shingle_index_dir(ray_session, tmp_path_factory):
    """Same corpus through the word-bigram (shingle) analyzer."""
    import dataclasses

    import ray.data as rd

    from webindex.config import AnalyzerConfig

    out = str(tmp_path_factory.mktemp("qidx") / "shingle_index")
    tab = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
            "text": pa.array([d["text"] for d in DOCS]),
        }
    )
    cfg = dataclasses.replace(
        CFG, analyzer=AnalyzerConfig(shingle_only=True)
    )
    build_index(rd.from_arrow(tab), out, cfg)
    return out


def test_shingle_phrase_matches_brute(index_dir, shingle_index_dir, oracle):
    """index_phrases accelerator: bigram-index matching must reproduce
    the adjacency oracle exactly (rank AND score) for 2-word phrases."""
    from webindex.phrase import shingle_phrase_search

    two_word = [(q, t) for q, t in PHRASES if len(t.split()) == 2]
    assert two_word
    runs = shingle_phrase_search(
        _queries_ds(two_word), index_dir, shingle_index_dir, top_k=6
    )
    got = _runs_rows(runs)
    for qid, text in two_word:
        want = _oracle_phrase(oracle, text, 6)
        rows = got.get(qid, [])
        assert [d for d, _ in rows] == [d for d, _ in want], (qid, text)
        for (_, a), (_, b) in zip(rows, want):
            assert a == b, (qid, text)


def test_shingle_phrase_rejects_long_phrases(index_dir, shingle_index_dir):
    from webindex.phrase import shingle_phrase_search

    with pytest.raises(Exception, match="two-word"):
        shingle_phrase_search(
            _queries_ds([("p", "alpha beta gamma")]), index_dir,
            shingle_index_dir, top_k=5,
        ).take_all()
