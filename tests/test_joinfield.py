"""Parent-child join field (ES has_child / has_parent): brute-force
oracles over a tiny corpus — child scores from OracleBM25 over the
CHILD corpus, parent combination replayed per score_mode; has_parent
replayed from the parent oracle ranking."""

import numpy as np
import pyarrow as pa
import pytest

from webindex.build import build_index
from webindex.config import IndexConfig
from webindex.joinfield import child_corpus, has_child_topk, has_parent_children
from webindex.oracle import OracleBM25
from webindex.textstats import _ASCII_TOK_RE

CFG = IndexConfig(num_buckets=8, block_size=32)
CT = 6  # child chunk tokens

VOCAB = "alpha beta gamma delta epsilon zeta".split()
QUERIES = [("q1", "alpha beta"), ("q2", "gamma"), ("q3", "nosuchterm")]


def _docs():
    rng = np.random.default_rng(23)
    rows = []
    for i in range(40):
        n = int(rng.integers(4, 30))
        rows.append((i, " ".join(VOCAB[int(j)] for j in
                                 rng.integers(0, 6, size=n))))
    rows.append((40, ""))  # empty parent: no children
    return rows


DOCS = _docs()


def _child_rows():
    out = []
    for did, t in DOCS:
        toks = _ASCII_TOK_RE.findall(t.lower())
        for cid, s in enumerate(range(0, len(toks), CT)):
            out.append(((did << 12) | cid, did, " ".join(toks[s:s + CT])))
    return out


KIDS = _child_rows()


@pytest.fixture(scope="module")
def indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    root = tmp_path_factory.mktemp("joinfield")
    parent_dir = str(root / "parents")
    child_dir = str(root / "children")
    docs_tab = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS]),
        }
    )
    docs_ds = rd.from_arrow(docs_tab)
    build_index(docs_ds, parent_dir, CFG)
    kids = child_corpus(docs_ds, chunk_tokens=CT)
    build_index(
        kids.select_columns(["doc_id", "text"]), child_dir, CFG,
        docvalues_ds=kids.select_columns(["doc_id", "parent_id"]),
    )
    return parent_dir, child_dir, docs_ds


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


@pytest.mark.parametrize("mode", ["max", "sum", "avg", "min"])
def test_has_child_matches_brute(indexes, mode, ray_session):
    _parent_dir, child_dir, _docs_ds = indexes
    child_oracle = OracleBM25([(cid, t) for cid, _p, t in KIDS], CFG)
    got = has_child_topk(
        _queries_ds(QUERIES), child_dir, k=8, score_mode=mode
    ).to_pandas()
    for qid, text in QUERIES:
        scores = dict(child_oracle.topk(text, 10**9))
        per_parent = {}
        for cid, pid, _t in KIDS:
            if cid in scores:
                per_parent.setdefault(pid, []).append((cid, scores[cid]))
        rows = []
        for pid, kids in per_parent.items():
            kids.sort()  # ascending child docID fold order
            vals = [s for _c, s in kids]
            if mode == "max":
                comb = max(vals)
            elif mode == "min":
                comb = min(vals)
            else:
                acc = 0.0
                for v in vals:
                    acc += v
                comb = acc / len(vals) if mode == "avg" else acc
            rows.append((pid, round(comb, 6), len(vals)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        rows = rows[:8]
        g = got[got["qid"] == qid].sort_values("rank")
        assert [
            (int(p), float(s), int(n))
            for p, s, n in zip(g["parent_id"], g["score"], g["n_children"])
        ] == rows, (qid, mode)


def test_has_parent_matches_brute(indexes, ray_session):
    parent_dir, _child_dir, docs_ds = indexes
    parent_oracle = OracleBM25(DOCS, CFG)
    got = has_parent_children(
        _queries_ds(QUERIES), parent_dir, docs_ds,
        parent_k=3, chunk_tokens=CT,
    ).to_pandas()
    kids_by_parent = {}
    for cid, pid, _t in KIDS:
        kids_by_parent.setdefault(pid, []).append(cid)
    for qid, text in QUERIES:
        top = parent_oracle.topk(text, 3)
        rows = []
        for pid, sc in top:
            for cid in sorted(kids_by_parent.get(pid, [])):
                rows.append((cid, pid, round(sc, 6)))
        rows.sort(key=lambda r: (-r[2], r[0]))
        g = got[got["qid"] == qid].sort_values("rank")
        assert [
            (int(c), int(p), float(s))
            for c, p, s in zip(g["doc_id"], g["parent_id"],
                               g["parent_score"])
        ] == rows, qid


def test_child_corpus_packing_guards(ray_session):
    import ray.data as rd

    # a doc with > 4096 chunks must raise, not silently collide
    big = " ".join(["tok"] * (4097 * 2))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([big])})
    )
    with pytest.raises(Exception, match="chunk_id|salt"):
        child_corpus(ds, chunk_tokens=2).materialize()
    # oversized parent ids must raise too
    ds2 = rd.from_arrow(
        pa.table({"doc_id": pa.array([1 << 52], pa.int64()),
                  "text": pa.array(["alpha beta"])})
    )
    with pytest.raises(Exception, match="2\\^51|pack"):
        child_corpus(ds2, chunk_tokens=2).materialize()
