"""Lucene intervals query family vs a from-first-principles oracle.

The oracle enumerates interval sets EXHAUSTIVELY (itertools.product over
occurrence/child-interval combinations), minimalizes by the containment
definition, and applies filters by brute loops — fully independent of the
engine's greedy/sweep/DFS kernels. Scores must equal the OR-match BM25
sum over present leaf terms (OracleBM25), bit-exact rank order.
"""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from webindex.analyze import Analyzer
from webindex.build import build_index
from webindex.config import IndexConfig
from webindex.intervals import (eval_node, intervals_search, leaf_terms,
                                parse_intervals)
from webindex.oracle import OracleBM25

CFG = IndexConfig(num_buckets=8, df_salt_threshold=60, salt_shards=2,
                  block_size=32, store_positions=True)

VOCAB = "alpha beta gamma delta epsilon zeta".split()
N_DOCS = 120


def _make_docs():
    rng = np.random.default_rng(41)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(6, 30))
        words = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), size=n)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    return rows


DOCS = _make_docs()
AN = Analyzer(CFG.analyzer)


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("ividx") / "docs_index")
    tab = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in DOCS], pa.int64()),
        "text": pa.array([d["text"] for d in DOCS]),
    })
    build_index(rd.from_arrow(tab), out, CFG)
    return out


@pytest.fixture(scope="module")
def oracle():
    return OracleBM25([(d["doc_id"], d["text"]) for d in DOCS], CFG)


# ---------------------------------------------------------------------------
# brute oracle
# ---------------------------------------------------------------------------


def _brute_minimalize(ivs):
    ivs = set(ivs)
    return sorted(
        i for i in ivs
        if not any(j != i and i[0] <= j[0] and j[1] <= i[1] for j in ivs)
    )


def _brute_eval(spec, toks):
    (kind, body), = spec.items()
    if kind == "match":
        terms = AN.tokens(body["query"])
        mg = body.get("max_gaps", -1)
        occ = [[p for p, t in enumerate(toks) if t == q] for q in terms]
        m = len(terms)
        ivs = []
        if body.get("ordered", False):
            for combo in itertools.product(*occ):
                if all(b > a for a, b in zip(combo, combo[1:])):
                    s, e = combo[0], combo[-1]
                    if mg < 0 or (e - s) - (m - 1) <= mg:
                        ivs.append((s, e))
        else:
            for combo in itertools.product(*occ):
                if len(set(combo)) == m:
                    s, e = min(combo), max(combo)
                    if mg < 0 or (e - s + 1) - m <= mg:
                        ivs.append((s, e))
    elif kind == "any_of":
        ivs = [iv for c in body["intervals"] for iv in _brute_eval(c, toks)]
    else:  # all_of
        childs = [_brute_eval(c, toks) for c in body["intervals"]]
        mg = body.get("max_gaps", -1)
        ivs = []
        for combo in itertools.product(*childs):
            if body.get("ordered", False):
                if not all(b[0] > a[1] for a, b in zip(combo, combo[1:])):
                    continue
                s, e = combo[0][0], combo[-1][1]
                cov = sum(ce - cs + 1 for cs, ce in combo)
                if mg >= 0 and (e - s + 1) - cov > mg:
                    continue
            else:
                s = min(c[0] for c in combo)
                e = max(c[1] for c in combo)
            ivs.append((s, e))
    ivs = _brute_minimalize(ivs)
    flt = body.get("filter")
    if flt is not None:
        (fk, fspec), = flt.items()
        fivs = _brute_eval(fspec, toks)
        if fk == "containing":
            ivs = [i for i in ivs
                   if any(i[0] <= f[0] and f[1] <= i[1] for f in fivs)]
        elif fk == "not_containing":
            ivs = [i for i in ivs
                   if not any(i[0] <= f[0] and f[1] <= i[1] for f in fivs)]
        elif fk == "contained_by":
            ivs = [i for i in ivs
                   if any(f[0] <= i[0] and i[1] <= f[1] for f in fivs)]
        elif fk == "not_contained_by":
            ivs = [i for i in ivs
                   if not any(f[0] <= i[0] and i[1] <= f[1] for f in fivs)]
        elif fk == "overlapping":
            ivs = [i for i in ivs
                   if any(f[0] <= i[1] and f[1] >= i[0] for f in fivs)]
        elif fk == "not_overlapping":
            ivs = [i for i in ivs
                   if not any(f[0] <= i[1] and f[1] >= i[0] for f in fivs)]
        elif fk == "before":
            ivs = [i for i in ivs if any(i[1] < f[0] for f in fivs)]
        else:  # after
            ivs = [i for i in ivs if any(i[0] > f[1] for f in fivs)]
    return ivs


SPECS = [
    {"match": {"query": "alpha beta", "ordered": True, "max_gaps": 2}},
    {"match": {"query": "alpha beta", "ordered": True, "max_gaps": 0}},
    {"match": {"query": "alpha beta gamma", "ordered": True,
               "max_gaps": 4}},
    {"match": {"query": "beta gamma", "max_gaps": 3}},
    {"match": {"query": "alpha beta gamma"}},
    {"match": {"query": "alpha alpha", "ordered": True, "max_gaps": 1}},
    {"any_of": {"intervals": [
        {"match": {"query": "alpha beta", "ordered": True, "max_gaps": 0}},
        {"match": {"query": "gamma delta", "ordered": True, "max_gaps": 0}},
    ]}},
    {"all_of": {"ordered": True, "max_gaps": 3, "intervals": [
        {"match": {"query": "alpha beta", "ordered": True, "max_gaps": 0}},
        {"match": {"query": "gamma"}},
    ]}},
    {"all_of": {"ordered": False, "intervals": [
        {"match": {"query": "alpha beta", "ordered": True, "max_gaps": 1}},
        {"match": {"query": "delta epsilon", "max_gaps": 2}},
    ]}},
    {"match": {"query": "alpha beta", "ordered": True, "max_gaps": 3,
               "filter": {"not_containing": {"match": {"query": "gamma"}}}}},
    {"match": {"query": "alpha delta", "max_gaps": 5,
               "filter": {"containing": {"match": {"query": "beta"}}}}},
    {"match": {"query": "alpha beta", "ordered": True, "max_gaps": 4,
               "filter": {"contained_by": {"match":
                          {"query": "zeta epsilon", "max_gaps": 8}}}}},
    {"match": {"query": "alpha", "filter":
               {"not_overlapping": {"match":
                {"query": "beta gamma", "max_gaps": 1}}}}},
    {"match": {"query": "alpha beta", "ordered": True, "max_gaps": 1,
               "filter": {"before": {"match": {"query": "zeta"}}}}},
    {"match": {"query": "gamma delta", "ordered": True, "max_gaps": 1,
               "filter": {"after": {"match": {"query": "alpha"}}}}},
]


@pytest.mark.parametrize("spec", SPECS, ids=range(len(SPECS)))
def test_eval_node_matches_brute(spec):
    node = parse_intervals(spec, AN)
    for d in DOCS:
        toks = AN.tokens(d["text"])
        posmap = {}
        for t in set(toks):
            posmap[t] = np.array(
                [p for p, tt in enumerate(toks) if tt == t], np.int64
            )
        s, e = eval_node(node, posmap)
        got = list(zip(s.tolist(), e.tolist()))
        want = _brute_eval(spec, toks)
        assert got == want, (d["doc_id"], spec)


def test_intervals_search_end_to_end(index_dir, oracle):
    k = 8
    pairs = [(f"i{n}", spec) for n, spec in enumerate(SPECS)]
    runs = intervals_search(pairs, index_dir, top_k=k)
    got = {}
    for r in sorted(runs.take_all(), key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for qid, spec in pairs:
        terms = leaf_terms(parse_intervals(spec, AN))
        all_scores = dict(oracle.topk(" ".join(terms), 10**9))
        want = []
        for d in DOCS:
            toks = AN.tokens(d["text"])
            if _brute_eval(spec, toks):
                want.append((d["doc_id"], all_scores[d["doc_id"]]))
        want.sort(key=lambda t: (-t[1], t[0]))
        want = want[:k]
        rows = got.get(qid, [])
        assert [d for d, _ in rows] == [d for d, _ in want], (qid, spec)
        for (_, a), (_, b) in zip(rows, want):
            assert a == pytest.approx(b, rel=1e-12)


def test_shard_width_invariance(index_dir):
    spec = SPECS[7]

    def run(n_shards):
        runs = intervals_search([("q", spec)], index_dir, top_k=10,
                                n_shards=n_shards)
        return sorted(
            (r["qid"], r["rank"], r["doc_id"], r["score"])
            for r in runs.take_all()
        )

    assert run(2) == run(5)


def test_parse_validation():
    with pytest.raises(ValueError, match="single-rule"):
        parse_intervals({"match": {}, "any_of": {}}, AN)
    with pytest.raises(ValueError, match="unknown intervals rule"):
        parse_intervals({"span": {"query": "x"}}, AN)
    with pytest.raises(ValueError, match="duplicate"):
        parse_intervals({"match": {"query": "alpha alpha"}}, AN)
    with pytest.raises(ValueError, match="max_gaps"):
        parse_intervals({"all_of": {"ordered": False, "max_gaps": 2,
                                    "intervals": [
                                        {"match": {"query": "alpha"}}]}},
                        AN)
    with pytest.raises(ValueError, match="unknown intervals filter"):
        parse_intervals({"match": {"query": "alpha",
                                   "filter": {"inside":
                                              {"match": {"query": "b"}}}}},
                        AN)


def test_allof_ordered_stopword_scale():
    """Regression: all_of over stopword-frequency children must stay
    polynomial (the DFS it replaced blew the chain budget on a real
    crawl page via the CLI). 1500 occurrences per child; the exact
    result is checked against the brute oracle on a smaller prefix."""
    rng = np.random.default_rng(5)
    toks = ["alpha" if x < 0.4 else ("beta" if x < 0.8 else "gamma")
            for x in rng.random(4000)]
    posmap = {
        t: np.array([p for p, tt in enumerate(toks) if tt == t], np.int64)
        for t in ("alpha", "beta", "gamma")
    }
    spec = {"all_of": {"ordered": True, "max_gaps": 2, "intervals": [
        {"match": {"query": "alpha"}}, {"match": {"query": "beta"}},
        {"match": {"query": "gamma"}},
    ]}}
    node = parse_intervals(spec, AN)
    s, e = eval_node(node, posmap)  # must not raise / hang
    assert s.size > 0
    # exactness on a small prefix where the brute product is feasible
    small = toks[:60]
    pm = {t: np.array([p for p, tt in enumerate(small) if tt == t],
                      np.int64) for t in ("alpha", "beta", "gamma")}
    gs, ge = eval_node(node, pm)
    assert list(zip(gs.tolist(), ge.tolist())) == _brute_eval(spec, small)
