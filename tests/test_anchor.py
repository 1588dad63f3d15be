"""Anchor-text propagation (webindex.anchor) vs the single-threaded
replay of the pinned spec, partition invariance, and the deterministic
in-link cap (lowest-src rule must survive the per-batch superset cut)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from webindex.anchor import anchor_corpus, anchor_corpus_reference

SF = "/root/testdata/sf0.001"


def _docs_rows():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    return list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist(),
                    t.column("n_chars").to_pylist()))


def _as_dict(ds):
    df = ds.to_pandas().sort_values("doc_id")
    return {
        int(r.doc_id): (r.text, int(r.n_anchors))
        for r in df.itertuples(index=False)
    }


def test_anchor_matches_reference_and_invariant(ray_session):
    import ray.data as rd

    rows = _docs_rows()
    n = len(rows)
    ref = anchor_corpus_reference(rows, n, n_tokens=4, max_inlinks=2)
    tab = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "n_chars"])
    outs = []
    for blocks, parts in ((1, 4), (9, 16)):
        outs.append(_as_dict(anchor_corpus(
            rd.from_arrow(tab).repartition(blocks), n,
            n_tokens=4, max_inlinks=2, n_parts=parts,
        )))
    assert outs[0] == outs[1]  # partition/cap-cut invariance
    assert outs[0] == ref


def test_anchor_cap_keeps_lowest_src(ray_session):
    """Three sources link to one target; cap 2 must keep the two LOWEST
    source ids' snippets, in ascending order."""
    import ray.data as rd

    # edge rule: dst = (src + off + n_chars) % n. With n_chars = n - off
    # the first offset maps every src to itself (dropped); craft n_chars
    # so srcs 0,1,2 all hit dst 3 via one offset each.
    # offsets are (7, 28, 63); n = 70
    n = 70
    rows = [
        (0, "alpha one two three four", 66),   # 0+7+66  = 73  % 70 = 3
        (1, "bravo x", 65),                    # 1+7+65  = 73  % 70 = 3
        (2, "charlie y z", 43),                # 2+28+43 = 73  % 70 = 3
    ]
    # pad the table with token-less docs so ids/counts don't shift
    tab = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    })
    got = _as_dict(anchor_corpus(rd.from_arrow(tab).repartition(3), n,
                                 n_tokens=4, max_inlinks=2, n_parts=4))
    text, kept = got[3]
    assert kept == 2
    assert text == "alpha one two three bravo x"
    ref = anchor_corpus_reference(rows, n, n_tokens=4, max_inlinks=2)
    assert got[3] == ref[3]


def test_anchor_tokenless_sources_emit_nothing(ray_session):
    import ray.data as rd

    tab = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["...!!!", "real words here"], pa.string()),
        "n_chars": pa.array([5, 5], pa.int64()),
    })
    got = _as_dict(anchor_corpus(rd.from_arrow(tab), 100,
                                 n_tokens=4, max_inlinks=8, n_parts=4))
    # only doc 1 (tokenized) emits anchors -> 3 targets, each 1 anchor
    assert len(got) == 3
    assert all(v == ("real words here", 1) for v in got.values())
