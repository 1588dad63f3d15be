"""SemDeDup (ann.semdedup) vs a from-first-principles reimplementation.

The synthetic embedding set plants exact near-duplicate groups (base
vector + tiny jitter) so the thresholded drop rule actually fires; the
oracle recomputes seeded clustering, (cent_sim, id) ordering and the
upper-triangular suppression in plain Python loops.
"""

import numpy as np
import pyarrow as pa
import pytest

from webindex.ann import semdedup

DIM, N, K, EPS = 16, 90, 5, 0.95


def _make_vecs():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(N, DIM))
    # plant near-dup pairs/triples: rows 30/31 copy row 3, 50/51 copy 10
    for src, dsts in [(3, (30, 31)), (10, (50, 51)), (20, (70,))]:
        for d in dsts:
            base[d] = base[src] + rng.normal(scale=0.01, size=DIM)
    return base


VECS = _make_vecs()


def _brute():
    def norm(v):
        return v / np.linalg.norm(v)

    cents = np.array([norm(VECS[i]) for i in range(K)])
    out = {}
    assign = {}
    for i in range(N):
        sims = cents @ norm(VECS[i])
        best = int(np.argmax(sims))  # first max = lowest index on ties
        assign[i] = best
    for c in range(K):
        members = [i for i in range(N) if assign[i] == c]
        rows = sorted(
            members,
            key=lambda i: (round(float(norm(VECS[i]) @ cents[c]), 6), i),
        )
        for pos, i in enumerate(rows):
            dup = any(
                round(float(norm(VECS[i]) @ norm(VECS[j])), 6) > EPS
                for j in rows[:pos]
            )
            out[i] = (c, round(float(norm(VECS[i]) @ cents[c]), 6),
                      int(dup))
    return out


def _run(ray_session, parallelism):
    import ray.data as rd

    tab = pa.table({
        "vec_id": pa.array(range(N), pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for v in VECS],
            pa.list_(pa.float64(), DIM),
        ),
    })
    ds = rd.from_arrow(tab)
    if parallelism:
        ds = ds.repartition(parallelism)
    got = {}
    for r in semdedup(ds, n_clusters=K, eps=EPS).take_all():
        got[r["vec_id"]] = (r["centroid"], r["cent_sim_r"], r["dup"])
    return got


def test_semdedup_matches_brute(ray_session):
    want = _brute()
    got = _run(ray_session, None)
    assert set(got) == set(want)
    n_dups = sum(d for _, _, d in want.values())
    assert n_dups >= 3  # the planted duplicates actually fire
    for i in want:
        c_w, cs_w, d_w = want[i]
        c_g, cs_g, d_g = got[i]
        assert (c_g, d_g) == (c_w, d_w), i
        assert cs_g == pytest.approx(cs_w, abs=2e-6)


def test_semdedup_partition_invariance(ray_session):
    assert _run(ray_session, 2) == _run(ray_session, 7)
