"""HNSW: determinism (insertion-order / partitioning independence),
recall vs brute force, exhaustive-beam exactness, parquet round-trip."""

import numpy as np
import pytest

from webindex.ann import _normalize
from webindex.hnsw import Graph, hnsw_build, hnsw_topk

SF = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb():
    import pyarrow.parquet as pq

    tab = pq.read_table(SF)
    ids = np.array(tab.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _brute(ids, mat, q, k):
    sims = _normalize(mat) @ _normalize(q[None, :])[0]
    order = np.lexsort((ids, -sims))[:k]
    return ids[order].tolist(), sims[order].tolist()


def test_build_is_insertion_order_independent(emb):
    ids, mat = emb
    g1 = Graph(ids, mat, m=8, ef_construction=48, seed=0)
    perm = np.random.default_rng(3).permutation(ids.size)
    g2 = Graph(ids[perm], mat[perm], m=8, ef_construction=48, seed=0)
    assert g1.to_blob() == g2.to_blob()


def test_recall_at_default_beam(emb):
    ids, mat = emb
    g = Graph(ids, mat, m=8, ef_construction=64, seed=0)
    qn = _normalize(mat[:20] + 0.01)
    hits = tot = 0
    for q in qn:
        want, _ = _brute(ids, mat, q, 10)
        got, _ = g.search(q, 10, 64)
        hits += len(set(want) & set(got.tolist()))
        tot += 10
    assert hits / tot >= 0.9


def test_exhaustive_beam_is_exact(emb):
    ids, mat = emb
    g = Graph(ids, mat, m=8, ef_construction=64, seed=0)
    for q in _normalize(mat[5:10] - 0.02):
        want_ids, want_sims = _brute(ids, mat, q, 10)
        got_ids, got_sims = g.search(q, 10, ids.size)
        assert got_ids.tolist() == want_ids
        np.testing.assert_allclose(got_sims, want_sims, rtol=0, atol=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_sharded_pipeline_matches_brute(emb, tmp_path):
    import ray.data as rd

    ids, mat = emb
    emb_ds = rd.read_parquet(SF)
    idx = hnsw_build(emb_ds, n_shards=4, m=8, ef_construction=64, seed=0)

    # parquet round-trip: blob rows persist and reload shard-parallel
    out = str(tmp_path / "hnsw")
    idx.write_parquet(out)
    idx2 = rd.read_parquet(out)

    qids = [0, 1, 2]
    qvecs = mat[np.searchsorted(ids, qids)]
    got = (
        hnsw_topk(idx2, qids, qvecs, 5, ef_search=ids.size)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    for qi, qv in zip(qids, qvecs):
        want_ids, _ = _brute(ids, mat, _normalize(qv[None, :])[0], 5)
        sub = got[got["query_id"] == qi]
        assert sub["vec_id"].tolist() == want_ids
        assert sub["rank"].tolist() == [1, 2, 3, 4, 5]


@pytest.mark.usefixtures("ray_session")
def test_shard_count_changes_results_only_via_beam(emb):
    """With an exhaustive beam, the merged top-k is identical for any
    shard count — the scatter-gather merge is exact."""
    import ray.data as rd

    ids, mat = emb
    emb_ds = rd.read_parquet(SF)
    qids = [0, 7]
    qvecs = mat[np.searchsorted(ids, qids)]
    frames = []
    for n_shards in (2, 5):
        idx = hnsw_build(emb_ds, n_shards=n_shards, m=8,
                         ef_construction=64, seed=0)
        frames.append(
            hnsw_topk(idx, qids, qvecs, 5, ef_search=ids.size)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    assert frames[0][["query_id", "vec_id", "rank"]].equals(
        frames[1][["query_id", "vec_id", "rank"]]
    )
