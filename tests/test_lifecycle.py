"""Document deletes + compaction (webindex.lifecycle):

- delete visibility: tombstoned docs vanish from results immediately while
  survivors keep their exact pre-delete BM25 scores (Lucene liveDocs
  pre-merge semantics — df/avgdl still count tombstones);
- live refresh: a resident searcher observes tombstones added after its
  preload;
- compaction: query results over the compacted index are bit-identical to
  an index built from scratch over the surviving corpus (stats, dict,
  block maxima all recomputed).
"""

import random

import numpy as np
import pyarrow as pa
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.lifecycle import compact_index, delete_docs, read_deletes
from webindex.search import SearcherActor, search_queries
from webindex.synth import VOCAB, synth_queries_table

CFG = IndexConfig(num_buckets=8, n_parts=8, analyzer=AnalyzerConfig())
N_DOCS = 300


def _rows() -> list[tuple[int, str]]:
    rng = random.Random(77)
    out = []
    for i in range(N_DOCS):
        doc_id = ((i % 4) << 40) | (i // 4)
        out.append((doc_id, " ".join(rng.choices(VOCAB, k=rng.randint(5, 60)))))
    return out


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )


def _dv_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "parity": pa.array(
                    [int(d % 2) for d, _ in rows], pa.int64()
                ),
            }
        )
    )


DELETED = sorted({d for i, (d, _) in enumerate(_rows()) if i % 5 == 0})


@pytest.fixture(scope="module")
def live_index(ray_session, tmp_path_factory):
    """Index over the full corpus with DELETED tombstoned (not compacted)."""
    from webindex.build import build_index

    rows = _rows()
    idx = str(tmp_path_factory.mktemp("lc") / "idx")
    build_index(_docs_ds(rows), idx, CFG, docvalues_ds=_dv_ds(rows))
    n = delete_docs(idx, DELETED)
    assert n == len(DELETED)
    return idx


@pytest.fixture(scope="module")
def survivor_index(ray_session, tmp_path_factory):
    """Fresh from-scratch build over ONLY the surviving docs."""
    from webindex.build import build_index

    rows = [(d, t) for d, t in _rows() if d not in set(DELETED)]
    idx = str(tmp_path_factory.mktemp("lc") / "survivors")
    build_index(_docs_ds(rows), idx, CFG, docvalues_ds=_dv_ds(rows))
    return idx


@pytest.fixture(scope="module")
def compacted_index(live_index, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lc") / "compacted")
    stats = compact_index(live_index, out)
    assert stats["n_deleted"] == len(DELETED)
    return out


def _all_hits(idx: str, text: str, mode: str = "auto"):
    s = SearcherActor(idx, top_k=10**6, mode=mode)
    ids, scores = s.search_one("q", text)
    return dict(zip(ids.tolist(), scores.tolist()))


def test_delete_visibility_and_score_stability(live_index, tmp_path_factory):
    """Pre-delete scores for survivors are EXACTLY preserved; tombstoned
    docs are gone. Checked against a clean (tombstone-free) copy of the
    same index."""
    import shutil

    clean = str(tmp_path_factory.mktemp("lc") / "clean")
    shutil.copytree(live_index, clean)
    shutil.rmtree(f"{clean}/deletes")

    deleted = set(DELETED)
    qs = synth_queries_table(n=20)
    n_affected = 0
    for text in qs.column("text").to_pylist():
        before = _all_hits(clean, text)
        after = _all_hits(live_index, text)
        assert set(after) == set(before) - deleted, text
        for d, sc in after.items():
            assert sc == before[d], (text, d)
        n_affected += bool(set(before) & deleted)
    assert n_affected > 10, "query set barely touches deleted docs"


def test_live_searcher_observes_new_deletes(ray_session, tmp_path_factory):
    from webindex.build import build_index

    rows = _rows()
    idx = str(tmp_path_factory.mktemp("lc") / "fresh")
    build_index(_docs_ds(rows), idx, CFG)
    s = SearcherActor(idx, top_k=10**6)
    text = "artificial intelligence data"
    ids0, _ = s.search_one("q", text)
    assert ids0.size > 0
    victim = int(ids0[0])
    delete_docs(idx, [victim])
    ids1, _ = s.search_one("q", text)  # same resident searcher
    assert victim not in ids1.tolist()
    assert set(ids1.tolist()) == set(ids0.tolist()) - {victim}


def test_deletes_compose_with_filter_and_and_match(live_index):
    deleted = set(DELETED)
    s = SearcherActor(
        live_index, top_k=10**6, filter_pred=[("parity", "==", 1)],
        match="and",
    )
    ids, _ = s.search_one("q", "data pipeline")
    assert ids.size > 0
    assert all(d % 2 == 1 for d in ids.tolist())
    assert not (set(ids.tolist()) & deleted)


def test_compacted_equals_scratch_rebuild(compacted_index, survivor_index):
    from webindex.util import read_json

    sc = read_json(f"{compacted_index}/stats.json")
    sb = read_json(f"{survivor_index}/stats.json")
    for k in ("N", "total_tokens", "max_doc_id", "avgdl", "n_terms",
              "n_heavy_terms"):
        assert sc[k] == sb[k], k

    qs = synth_queries_table(n=25)
    for text in qs.column("text").to_pylist():
        a = _all_hits(compacted_index, text)
        b = _all_hits(survivor_index, text)
        assert a == b, text  # ids AND float64 scores bit-identical

    # compacted index carries no tombstones; reader takes the unmasked path
    assert read_deletes(compacted_index).size == 0
    from webindex.segments import SegmentReader

    assert SegmentReader(compacted_index).live_mask() is None


def test_compacted_docvalues_filtered(compacted_index):
    s = SearcherActor(
        compacted_index, top_k=10**6, filter_pred=[("parity", "==", 0)]
    )
    ids, _ = s.search_one("q", "data pipeline")
    assert ids.size > 0
    assert all(d % 2 == 0 for d in ids.tolist())
    assert not (set(ids.tolist()) & set(DELETED))


@pytest.mark.usefixtures("ray_session")
def test_pool_vs_sharded_identical_with_deletes(live_index):
    import ray.data as rd

    qs = rd.from_arrow(synth_queries_table(n=15))
    frames = {}
    for impl in ("pool", "sharded"):
        runs = search_queries(
            qs, live_index, top_k=12, impl=impl, n_shards=3,
            concurrency=2, batch_size=8,
        ).to_pandas()
        frames[impl] = (
            runs[["qid", "doc_id", "score", "rank"]]
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
    assert frames["pool"].equals(frames["sharded"])
    assert len(frames["pool"]) > 0
    assert not (set(frames["pool"]["doc_id"]) & set(DELETED))


def test_compaction_resumable(live_index, compacted_index, tmp_path_factory):
    """A compaction interrupted after stage 1 resumes and completes."""
    out = str(tmp_path_factory.mktemp("lc") / "resumed")
    import webindex.lifecycle as lc
    from webindex.util import StageRunner

    # run only stage 1 by replaying compact_index with a poisoned stage 2,
    # then run the real thing — StageRunner must skip the finished stage
    orig = lc.compact_index
    try:
        from webindex.build import sum_relay_sidecars

        class Boom(Exception):
            pass

        import unittest.mock as mock

        def boom(_praw):
            raise Boom()

        with mock.patch("webindex.build.sum_relay_sidecars", boom):
            with pytest.raises(Boom):
                orig(live_index, out)
    finally:
        pass
    manifest = StageRunner(out)
    assert manifest.is_done("postings_raw")
    stats = orig(live_index, out)  # resumes: stage 1 skipped, rest runs
    assert stats["n_deleted"] == len(DELETED)
    qs = synth_queries_table(n=5)
    for text in qs.column("text").to_pylist():
        # identical to an uninterrupted compaction (scores are recomputed
        # post-compaction, so the tombstoned live index is NOT the oracle)
        assert _all_hits(out, text) == _all_hits(compacted_index, text), text


def test_compaction_positional_index(ray_session, tmp_path_factory):
    """Position blobs flow through the relay filter untouched: phrase
    queries on the compacted positional index are bit-identical to a
    from-scratch positional rebuild over the survivors."""
    from webindex.build import build_index

    cfg = IndexConfig(num_buckets=8, n_parts=8, store_positions=True,
                      analyzer=AnalyzerConfig())
    rows = _rows()
    root = tmp_path_factory.mktemp("lcpos")
    idx = str(root / "posidx")
    build_index(_docs_ds(rows), idx, cfg)
    delete_docs(idx, DELETED)
    out = str(root / "poscomp")
    compact_index(idx, out)
    rebuilt = str(root / "posscratch")
    survivors = [(d, t) for d, t in rows if d not in set(DELETED)]
    build_index(_docs_ds(survivors), rebuilt, cfg)

    texts = [t for _, t in survivors]
    phrases = [" ".join(texts[0].split()[:2]),
               " ".join(texts[7].split()[3:5]), "data pipeline"]
    n_hits = 0
    for text in phrases:
        a = SearcherActor(out, top_k=100, query_kind="phrase")
        b = SearcherActor(rebuilt, top_k=100, query_kind="phrase")
        ia, sa = a.search_one("q", text)
        ib, sb = b.search_one("q", text)
        assert ia.tolist() == ib.tolist(), text
        assert sa.tolist() == sb.tolist(), text
        n_hits += ia.size
    assert n_hits > 0, "no phrase ever matched — fixture too narrow"


def test_delete_by_query_tombstones_full_match_set(ray_session, tmp_path):
    import ray.data as rd

    from webindex.build import build_index
    from webindex.config import IndexConfig, SQL_SAFE_ANALYZER
    from webindex.lifecycle import delete_by_query, read_deletes
    from webindex.search import SearcherActor, scan_matches

    docs = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array([
            "red apple", "green apple pie", "red wall", "blue sky",
            "apple apple core", "plain text", "sky red", "green field",
        ]),
    })
    out = str(tmp_path / "dbq")
    build_index(rd.from_arrow(docs), out,
                IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=4))
    s_before = SearcherActor(out, top_k=100, mode="exhaustive")
    ids_b, sc_b = s_before.search_one("q", "sky")
    n = delete_by_query(out, "apple")
    assert n == 3
    assert set(read_deletes(out).tolist()) == {0, 1, 4}
    # matches vanish immediately...
    m = scan_matches(
        rd.from_items([{"qid": "q", "text": "apple"}]), out
    ).to_pandas()
    assert m.empty
    # ...survivor scores untouched (liveDocs semantics)
    s_after = SearcherActor(out, top_k=100, mode="exhaustive")
    ids_a, sc_a = s_after.search_one("q", "sky")
    assert ids_a.tolist() == ids_b.tolist()
    assert sc_a.tolist() == sc_b.tolist()
    # idempotent re-run: same tombstone set
    delete_by_query(out, "apple")
    assert set(read_deletes(out).tolist()) == {0, 1, 4}
