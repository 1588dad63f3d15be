"""Fixed-point PageRank (webindex.graph) vs the single-threaded replay of
the exact integer spec — bit-identical, including dangling-mass handling
and partition invariance (integer arithmetic is order-free, so any
partitioning must produce the same pr_q)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from webindex.graph import (
    LINK_OFFSETS,
    SCALE,
    pagerank,
    pagerank_reference,
    synth_links,
)


def _edges_ds(edges, blocks=4):
    import ray.data as rd

    t = pa.table(
        {"src": pa.array([a for a, _ in edges], pa.int64()),
         "dst": pa.array([b for _, b in edges], pa.int64())}
    )
    return rd.from_arrow(t).repartition(blocks)


# ring + chords + a dangling node (9 has no out-edges) + a hub
EDGES = (
    [(i, (i + 1) % 8) for i in range(8)]
    + [(0, 4), (1, 5), (2, 6), (3, 7), (5, 0), (6, 0), (7, 0)]
    + [(8, 0), (8, 1), (0, 9), (4, 9)]
)


def _as_dict(ds) -> dict:
    df = ds.to_pandas().sort_values("node")
    return dict(zip(df["node"].astype(int), df["pr_q"].astype(int)))


def test_pagerank_matches_reference(ray_session):
    got = _as_dict(pagerank(_edges_ds(EDGES), iters=4, n_parts=8))
    want = pagerank_reference(EDGES, iters=4)
    assert got == want
    # the dangling node received base + redistributed mass, not zero
    assert want[9] > 0


def test_pagerank_partition_invariant(ray_session):
    a = _as_dict(pagerank(_edges_ds(EDGES, blocks=2), iters=3, n_parts=4))
    b = _as_dict(pagerank(_edges_ds(EDGES, blocks=16), iters=3, n_parts=32))
    assert a == b


def test_pagerank_distributed_path_identical(ray_session):
    # above broadcast_limit the Pregel-exchange path runs; integer
    # arithmetic makes it bit-identical to broadcast AND the reference
    dist = _as_dict(
        pagerank(_edges_ds(EDGES), iters=3, n_parts=8, mode="distributed")
    )
    bcast = _as_dict(
        pagerank(_edges_ds(EDGES), iters=3, n_parts=8, mode="broadcast")
    )
    assert dist == bcast == pagerank_reference(EDGES, iters=3)


def test_pagerank_star_center_wins(ray_session):
    n = 12
    edges = [(i, 0) for i in range(1, n)] + [(0, i) for i in range(1, n)]
    pr = _as_dict(pagerank(_edges_ds(edges), iters=4, n_parts=8))
    assert pr[0] == max(pr.values())
    # leaves are symmetric -> identical fixed-point mass
    assert len({pr[i] for i in range(1, n)}) == 1
    # total mass stays within integer-floor slack of SCALE
    assert 0 <= SCALE - sum(pr.values()) < SCALE // 100


def test_synth_links_matches_brute(ray_session):
    import ray.data as rd

    n = 40
    rng = np.random.default_rng(11)
    nch = rng.integers(5, 900, size=n)
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(np.arange(n), pa.int64()),
             "n_chars": pa.array(nch.astype(np.int64), pa.int64())}
        )
    ).repartition(4)
    got = (
        synth_links(docs, n)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    want = sorted(
        {
            (i, int((i + off + nch[i]) % n))
            for i in range(n)
            for off in LINK_OFFSETS
            if (i + off + nch[i]) % n != i
        }
    )
    assert list(zip(got["src"], got["dst"])) == want
    # no dangling nodes by construction
    assert set(got["src"]) == set(range(n))


# ---------------- HITS ----------------


def _hits_dict(ds) -> dict:
    df = ds.to_pandas().sort_values("node")
    return {
        int(r.node): (int(r.hub_q), int(r.auth_q))
        for r in df.itertuples(index=False)
    }


def test_hits_matches_reference_both_paths(ray_session):
    from webindex.graph import hits, hits_reference

    ref = hits_reference(EDGES, iters=7)
    for mode in ("broadcast", "distributed"):
        got = _hits_dict(
            hits(_edges_ds(EDGES), iters=7, n_parts=8, mode=mode)
        )
        assert got == ref, mode


def test_hits_partition_invariant(ray_session):
    from webindex.graph import hits

    a = _hits_dict(hits(_edges_ds(EDGES, blocks=1), iters=5, n_parts=3))
    b = _hits_dict(hits(_edges_ds(EDGES, blocks=7), iters=5, n_parts=16))
    assert a == b


def test_hits_pure_hub_and_authority(ray_session):
    """A node with only out-edges must have auth 0; only in-edges, hub 0;
    the strongest hub/authority pair is the engineered one."""
    from webindex.graph import hits

    # 0,1 point at 3,4; 2 points only at 3; 5 receives only
    edges = [(0, 3), (0, 4), (1, 3), (1, 4), (2, 3), (0, 5)]
    got = _hits_dict(hits(_edges_ds(edges, blocks=2), iters=6, n_parts=4))
    assert got[3][0] == 0 and got[4][0] == 0 and got[5][0] == 0
    assert got[0][1] == 0 and got[1][1] == 0 and got[2][1] == 0
    assert got[0][0] > got[2][0] > 0  # 0 links to stronger authorities
    assert got[3][1] > got[4][1] > got[5][1] > 0


def test_hits_synth_graph_paths_identical(ray_session):
    import ray.data as rd

    from webindex.graph import hits, synth_links

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "n_chars"],
    )
    n = docs.count()
    ed = synth_links(docs, n)
    b = _hits_dict(hits(ed, iters=4, n_parts=8, mode="broadcast"))
    d = _hits_dict(hits(ed, iters=4, n_parts=8, mode="distributed"))
    assert b == d
    assert len(b) == n


# ---------------- personalized PageRank ----------------


def test_ppr_matches_reference_both_paths(ray_session):
    from webindex.graph import pagerank, pagerank_reference

    seeds = np.array([0, 8], dtype=np.int64)
    ref = pagerank_reference(EDGES, iters=6, seeds={0, 8})
    for mode in ("broadcast", "distributed"):
        got = _as_dict(
            pagerank(_edges_ds(EDGES), iters=6, n_parts=8, mode=mode,
                     seeds=seeds)
        )
        assert got == ref, mode


def test_ppr_mass_concentrates_on_seed_neighborhood(ray_session):
    """Teleporting only to node 8 must rank it (and its targets) above
    the uniform-teleport ranking's tail."""
    from webindex.graph import pagerank

    uni = _as_dict(pagerank(_edges_ds(EDGES), iters=8, n_parts=8))
    ppr = _as_dict(
        pagerank(_edges_ds(EDGES), iters=8, n_parts=8,
                 seeds=np.array([8], dtype=np.int64))
    )
    # node 8 has no in-links: uniform PR gives it only base mass, the
    # personalized run makes it the biggest single holder
    assert ppr[8] > uni[8]
    assert ppr[8] == max(ppr.values())
    # total mass stays ~SCALE in both (floor losses only)
    assert abs(sum(ppr.values()) - SCALE) < 200 * len(ppr)


def test_ppr_empty_seeds_raises(ray_session):
    from webindex.graph import pagerank

    with pytest.raises(ValueError, match="seeds"):
        pagerank(_edges_ds(EDGES), iters=2,
                 seeds=np.array([], dtype=np.int64))
