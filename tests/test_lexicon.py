"""Dictionary-driven query operators (webindex.lexicon) vs brute oracles.

Suggest / fuzzy expansion are checked against plain-Python recomputation
over the corpus vocabulary; fuzzy_search and more_like_this against an
explicit-term scoring oracle built on OracleBM25's postings (bypassing its
query tokenizer — expansion terms are already analyzed, which is exactly
what the engine's pre_tokenized path exists for). The index is STEMMED, so
any analyzer re-application in the engine path would corrupt terms and
fail these tests.
"""

import numpy as np
import pyarrow as pa
import pytest

from webindex.build import build_index
from webindex.config import IndexConfig
from webindex.lexicon import (
    MltTermSelect,
    explain_scores,
    fuzzy_expand,
    fuzzy_search,
    levenshtein_batch,
    more_like_this,
    suggest,
)
from webindex.oracle import OracleBM25

CFG = IndexConfig(num_buckets=8, block_size=32)

VOCAB = ("merge merges merged marge purge surge search searches sort "
         "sorted sorting join joins joint point paint print stream steam "
         "team formal normal custom customs").split()
N_DOCS = 120


def _make_docs():
    rng = np.random.default_rng(23)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(6, 30))
        words = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), size=n)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    return rows


DOCS = _make_docs()


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("lexidx") / "docs_index")
    tab = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
            "text": pa.array([d["text"] for d in DOCS]),
        }
    )
    build_index(rd.from_arrow(tab), out, CFG)
    return out


@pytest.fixture(scope="module")
def oracle():
    return OracleBM25([(d["doc_id"], d["text"]) for d in DOCS], CFG)


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _score_terms(oracle, terms: set[str], k: int):
    """Explicit-term BM25 oracle: same fixed ascending-term float64 sums
    as OracleBM25.topk, without re-tokenizing a query string."""
    import math

    scores: dict[int, float] = {}
    cfg = oracle.cfg
    for t in sorted(terms):
        plist = oracle.postings.get(t)
        if not plist:
            continue
        idf_t = oracle.idf(t)
        for doc_id, tf in plist.items():
            dl = oracle.dl[doc_id]
            denom = tf + cfg.k1 * (1.0 - cfg.b + cfg.b * (dl / oracle.avgdl))
            scores[doc_id] = scores.get(doc_id, 0.0) + idf_t * (tf / denom)
    return sorted(scores.items(), key=lambda e: (-e[1], e[0]))[:k]


def test_levenshtein_batch_matches_reference():
    rng = np.random.default_rng(5)
    alphabet = "abcde"
    words = [
        "".join(alphabet[int(c)] for c in rng.integers(0, 5, size=int(n)))
        for n in rng.integers(0, 9, size=80)
    ]
    for q in ["", "abc", "edcba", "aa", "abcdeabc"]:
        got = levenshtein_batch(words, q)
        want = np.array([_lev_ref(w, q) for w in words])
        assert np.array_equal(got, want), q


def test_suggest_matches_brute(index_dir, oracle):
    out = suggest(index_dir, ["s", "jo", "mer", "zzz"], k=4)
    vocab_df = {t: len(p) for t, p in oracle.postings.items()}
    for prefix in ["s", "jo", "mer"]:
        want = sorted(
            ((t, d) for t, d in vocab_df.items() if t.startswith(prefix)),
            key=lambda e: (-e[1], e[0]),
        )[:4]
        got = out[out["prefix"] == prefix]
        assert list(zip(got["term"], got["df"])) == want
        assert list(got["rank"]) == list(range(1, len(want) + 1))
    assert (out["prefix"] == "zzz").sum() == 0


def test_fuzzy_expand_matches_brute(index_dir, oracle):
    vocab_df = {t: len(p) for t, p in oracle.postings.items()}
    got = fuzzy_expand(index_dir, ["merg", "sort", "tream"], max_edits=1,
                       max_expansions=3)
    for q in ["merg", "sort", "tream"]:
        want = sorted(
            ((t, d) for t, d in vocab_df.items() if _lev_ref(t, q) <= 1),
            key=lambda e: (-e[1], e[0]),
        )[:3]
        sub = got[got["qterm"] == q]
        assert list(zip(sub["term"], sub["df"])) == want, q


def test_fuzzy_expand_prefix_len(index_dir, oracle):
    vocab_df = {t: len(p) for t, p in oracle.postings.items()}
    got = fuzzy_expand(index_dir, ["mearge"], max_edits=2, prefix_len=2)
    want = sorted(
        ((t, d) for t, d in vocab_df.items()
         if t.startswith("me") and _lev_ref(t, "mearge") <= 2),
        key=lambda e: (-e[1], e[0]),
    )
    assert list(zip(got["term"], got["df"])) == want[:50]


def test_fuzzy_search_matches_explicit_term_oracle(index_dir, oracle):
    queries = [("f1", "mearge joint"), ("f2", "steem"), ("f3", "qqqq")]
    runs = fuzzy_search(queries, index_dir, top_k=5, max_edits=1,
                        max_expansions=50).to_pandas()
    vocab = list(oracle.postings)
    an = oracle.an
    for qid, text in queries:
        qterms = sorted(set(an.tokens(text)))
        exp = {
            t
            for q in qterms
            for t in sorted(
                vocab,
                key=lambda t: (-len(oracle.postings[t]), t),
            )
            if _lev_ref(t, q) <= 1
        }
        want = _score_terms(oracle, exp, 5)
        sub = runs[runs["qid"] == qid].sort_values("rank")
        assert [int(d) for d in sub["doc_id"]] == [d for d, _ in want], qid
        got_scores = [float(s) for s in sub["score"]]
        assert np.allclose(
            got_scores, [s for _, s in want], rtol=0, atol=1e-12
        )


def test_more_like_this_matches_oracle(index_dir, oracle):
    import ray.data as rd

    seeds = [0, 7, 33]
    seeds_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(seeds, pa.int64()),
                "text": pa.array([DOCS[i]["text"] for i in seeds]),
            }
        )
    )
    runs = more_like_this(
        seeds_ds, index_dir, top_k=5, max_query_terms=4
    ).to_pandas()
    for sid in seeds:
        tfs = oracle.an.term_freqs(DOCS[sid]["text"])
        ranked = sorted(
            ((-(oracle.idf(t) * tf), t) for t, tf in tfs.items()
             if oracle.df(t) > 0),
        )
        top_terms = {t for _, t in ranked[:4]}
        want = [
            (d, s) for d, s in _score_terms(oracle, top_terms, 6)
            if d != sid
        ][:5]
        sub = runs[runs["qid"] == str(sid)].sort_values("rank")
        assert [int(d) for d in sub["doc_id"]] == [d for d, _ in want], sid


def test_mlt_term_select_emits_pre_tokenized(index_dir, oracle):
    stage = MltTermSelect(index_dir, max_query_terms=3)
    batch = pa.table(
        {
            "doc_id": pa.array([4], pa.int64()),
            "text": pa.array([DOCS[4]["text"]]),
        }
    )
    out = stage(batch)
    terms = out.column("text")[0].as_py().split()
    assert len(terms) == len(set(terms)) <= 3
    # every emitted term is an INDEX term (already stemmed) — feeding it
    # through the analyzer again must not be assumed safe
    assert all(t in oracle.postings for t in terms)


def test_explain_sums_to_search_score(index_dir, oracle):
    queries = [("q1", "merged streams"), ("q2", "custom paint")]
    out = explain_scores(queries, index_dir, top_k=3)
    assert set(out.columns) == {"qid", "doc_id", "term", "tf", "dl", "df",
                                "contrib"}
    for qid, text in queries:
        want = oracle.topk(text, 3)
        sub = out[out["qid"] == qid]
        got = (
            sub.groupby("doc_id")["contrib"].sum()
            .sort_values(ascending=False)
        )
        assert set(got.index) == {d for d, _ in want}
        for d, s in want:
            assert got[d] == pytest.approx(s, rel=0, abs=1e-12)
        # per-term quantities match the oracle's postings exactly
        for _, row in sub.iterrows():
            assert row["tf"] == oracle.postings[row["term"]][row["doc_id"]]
            assert row["df"] == oracle.df(row["term"])
            assert row["dl"] == oracle.dl[row["doc_id"]]


def test_synonym_search_matches_explicit_term_oracle(index_dir, oracle):
    from webindex.lexicon import synonym_search

    # mapping over ANALYZED (stemmed) terms — 'merges'/'merged' stem to
    # 'merg', 'searches' to 'search'; synonyms must NOT be re-analyzed
    syn = {"merg": ["purg", "surg"], "search": ["sort"]}
    queries = [("s1", "merges stream"), ("s2", "searching points")]
    runs = synonym_search(queries, index_dir, syn, top_k=6).to_pandas()
    for qid, text in queries:
        base = sorted(set(oracle.an.tokens(text)))
        terms = {t for qt in base for t in [qt, *syn.get(qt, ())]}
        want = _score_terms(oracle, terms, 6)
        sub = runs[runs["qid"] == qid].sort_values("rank")
        assert [int(d) for d in sub["doc_id"]] == [d for d, _ in want], qid


def test_spell_correct_missing_only(index_dir, oracle):
    from webindex.lexicon import spell_correct

    # 'merg' IS a dictionary term (stem of merge/merges/merged) -> no row;
    # 'mearg' and 'stteam' are missing -> corrected; 'zzzz' has no
    # neighbor within distance 1
    out = spell_correct(
        index_dir, ["merg", "mearg", "stteam", "zzzz"], max_edits=1,
        prefix_len=1, k=2,
    )
    assert "merg" not in set(out["qterm"])
    assert "zzzz" not in set(out["qterm"])
    for qt in ("mearg", "stteam"):
        sub = out[out["qterm"] == qt]
        assert len(sub) >= 1
        # brute: all dict terms within distance 1 sharing the first char,
        # ranked (df desc, term asc), top-2
        cand = sorted(
            ((-oracle.df(t), t) for t in oracle.postings
             if t[0] == qt[0] and _lev_ref(t, qt) <= 1)
        )[:2]
        assert list(sub["term"]) == [t for _, t in cand], qt


def test_count_queries_matches_postings_union(index_dir, oracle,
                                              ray_session):
    import ray.data as rd

    from webindex.search import count_queries

    queries = [("c1", "merge stream"), ("c2", "searching sorted"),
               ("c3", "nonexistenttoken")]
    q_ds = rd.from_arrow(
        pa.table({"qid": pa.array([q for q, _ in queries]),
                  "text": pa.array([t for _, t in queries])})
    )
    got = count_queries(q_ds, index_dir).to_pandas()
    got = dict(zip(got["qid"], got["total"].astype(int)))
    for qid, text in queries:
        want = len(
            {d for t in set(oracle.an.tokens(text))
             for d in oracle.postings.get(t, {})}
        )
        assert got.get(qid, 0) == want, qid


def test_significant_terms_matches_brute(index_dir, oracle, ray_session):
    import ray.data as rd

    from webindex.lexicon import significant_terms

    docs_ds = rd.from_items(DOCS)
    queries = [("g1", "merge stream"), ("g2", "custom paint")]
    q_ds = rd.from_arrow(
        pa.table({"qid": pa.array([q for q, _ in queries]),
                  "text": pa.array([t for _, t in queries])})
    )
    got = significant_terms(
        q_ds, docs_ds, index_dir, fg_k=8, top_n=5
    )
    texts = {d["doc_id"]: d["text"] for d in DOCS}
    N = len([d for d in DOCS if d["text"]])
    for qid, qtext in queries:
        fg_ids = [d for d, _ in oracle.topk(qtext, 8)]
        fg_n = len(fg_ids)
        from collections import Counter

        fg_df: Counter = Counter()
        for d in fg_ids:
            fg_df.update(set(oracle.an.tokens(texts[d])))
        scored = []
        for t, fdf in fg_df.items():
            fgr = fdf / fg_n
            bgr = oracle.df(t) / N
            if fgr > bgr:
                scored.append((round((fgr - bgr) * (fgr / bgr), 9), t))
        want = sorted(scored, key=lambda e: (-e[0], e[1]))[:5]
        sub = got[got["qid"] == qid].sort_values("rank")
        assert list(zip(sub["score_r"], sub["term"])) == want, qid


def test_prefix_and_regexp_search_match_explicit_term_oracle(index_dir,
                                                             oracle):
    from webindex.lexicon import prefix_search, regexp_search

    # prefix: stemmed dict — 'merg' covers merge/merges/merged stems etc.
    runs = prefix_search([("p1", "mer st")], index_dir, top_k=6).to_pandas()
    terms = {
        t for t in oracle.postings
        if t.startswith("mer") or t.startswith("st")
    }
    want = _score_terms(oracle, terms, 6)
    sub = runs[runs["qid"] == "p1"].sort_values("rank")
    assert [int(d) for d in sub["doc_id"]] == [d for d, _ in want]

    import re

    runs = regexp_search([("r1", "s.r.")], index_dir, top_k=6).to_pandas()
    rterms = {t for t in oracle.postings if re.fullmatch("s.r.", t)}
    assert rterms  # surg/sort must exist in the stemmed dict
    want = _score_terms(oracle, rterms, 6)
    sub = runs[runs["qid"] == "r1"].sort_values("rank")
    assert [int(d) for d in sub["doc_id"]] == [d for d, _ in want]


def test_percolate_matches_brute(oracle, ray_session):
    """ES percolator: docs stream against registered queries; brute
    oracle recomputes term-subset membership per (query, doc)."""
    import ray.data as rd

    from webindex.percolate import percolate

    docs_ds = rd.from_items(DOCS)
    queries = [
        ("pq1", "merge stream"),
        ("pq2", "custom"),
        ("pq3", "paint batch surgeon"),
        ("pq4", ""),
    ]
    an = oracle.an
    for mm in (None, 2):
        out = percolate(
            docs_ds, queries, analyzer=an.cfg, min_match=mm
        ).to_pandas()
        got = set(zip(out["query_id"], out["doc_id"].astype(int)))
        want = set()
        for qid, qtext in queries:
            ts = set(an.tokens(qtext))
            if not ts:
                continue
            req = len(ts) if mm is None else min(mm, len(ts))
            for d in DOCS:
                hits = len(ts & set(an.tokens(d["text"])))
                if hits >= req:
                    want.add((qid, d["doc_id"]))
        assert got == want, mm
        assert want  # fixture must produce matches


def test_wildcard_search_matches_fnmatch_oracle(index_dir, oracle):
    """ES wildcard query vs an INDEPENDENT shell-glob oracle
    (fnmatch implements * / ? natively — no shared translation code)."""
    from fnmatch import fnmatchcase

    from webindex.lexicon import wildcard_search

    patterns = ["s?r*", "*am"]
    runs = wildcard_search(
        [("w1", " ".join(patterns))], index_dir, top_k=6
    ).to_pandas()
    wterms = {
        t for t in oracle.postings
        if any(fnmatchcase(t, p) for p in patterns)
    }
    assert wterms
    want = _score_terms(oracle, wterms, 6)
    sub = runs[runs["qid"] == "w1"].sort_values("rank")
    assert [int(d) for d in sub["doc_id"]] == [d for d, _ in want]


def test_phrase_suggest_matches_brute(index_dir, oracle):
    """ES phrase suggester: whole-query correction, per-position."""
    from webindex.lexicon import phrase_suggest

    def lev(a, b):
        import numpy as _np

        d = _np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                )
        return int(d[len(b)])

    queries = [
        ("ps1", "merga stream"),      # 'merga' absent -> corrected
        ("ps2", "custom paint"),      # all present -> unchanged
        ("ps3", "qqqqzz surgeon"),    # no candidate -> kept as typed
    ]
    out = phrase_suggest(index_dir, queries).set_index("qid")
    an = oracle.an
    vocab = set(oracle.postings)
    for qid, text in queries:
        toks = an.tokens(text)
        fixed = 0
        outs = []
        for t in toks:
            if t in vocab:
                outs.append(t)
                continue
            cands = [
                (-(oracle.df(w)), w) for w in vocab
                if w[:1] == t[:1] and lev(t, w) <= 1
            ]
            if cands:
                outs.append(min(cands)[1])
                fixed += 1
            else:
                outs.append(t)
        row = out.loc[qid]
        assert row["suggestion"] == " ".join(outs), qid
        assert int(row["n_corrected"]) == fixed, qid
    assert int(out.loc["ps1", "n_corrected"]) >= 1
    assert out.loc["ps3", "suggestion"].startswith("qqqqzz")


def test_match_bool_prefix_matches_brute(index_dir, oracle, ray_session):
    """ES match_bool_prefix: base-term OR BM25 + constant 1.0 for any
    prefix expansion present, replayed against the explicit-term
    oracle + a plain-Python dictionary rewrite."""
    from webindex.lexicon import match_bool_prefix

    an = oracle.an
    queries = [("m1", "merge jo"), ("m2", "sort ste"), ("m3", "pri")]
    got = match_bool_prefix(
        queries, index_dir, top_k=6, max_expansions=3
    ).to_pandas()

    dfs = {t: len(pl) for t, pl in oracle.postings.items()}
    doc_terms = {
        d["doc_id"]: set(an.tokens(d["text"])) for d in DOCS
    }
    for qid, text in queries:
        toks = an.tokens(text)
        base, pre = toks[:-1], toks[-1]
        exps = sorted(
            (t for t in dfs if t.startswith(pre)),
            key=lambda t: (-dfs[t], t),
        )[:3]
        scores = dict(_score_terms(oracle, set(base), 10**9))
        rows = {}
        for did, terms in doc_terms.items():
            s = scores.get(did, 0.0)
            hit_base = did in scores
            hit_pre = any(e in terms for e in exps)
            if hit_pre:
                s = s + 1.0
            if hit_base or hit_pre:
                rows[did] = s
        want = sorted(rows.items(), key=lambda e: (-e[1], e[0]))[:6]
        g = got[got["qid"] == qid].sort_values("rank")
        assert [
            (int(d), float(s)) for d, s in zip(g["doc_id"], g["score"])
        ] == want, qid
