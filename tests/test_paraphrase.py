"""Paraphrase mining (D3) vs brute-force all-pairs oracle."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_paraphrase_mining_matches_bruteforce():
    import pyarrow as pa
    import ray.data as rd

    from webindex.ann import paraphrase_mining

    rng = np.random.default_rng(3)
    n, d = 60, 8
    mat = rng.standard_normal((n, d))
    # plant two near-dup pairs
    mat[10] = mat[3] + 1e-6
    mat[41] = mat[20] + 1e-6
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float64())
                ),
            }
        )
    ).repartition(4)

    out = paraphrase_mining(
        ds, max_pairs=10, query_chunk_top_k=n, concurrency=2
    ).to_pandas()

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    cand = [
        (sims[i, j], i, j) for i in range(n) for j in range(i + 1, n)
    ]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = cand[:10]
    assert len(out) == 10
    got = list(zip(out["a"], out["b"]))
    assert got[0] in [(3, 10), (20, 41)]
    assert got[1] in [(3, 10), (20, 41)]
    assert set(got) == {(i, j) for _, i, j in want}
    assert np.allclose(
        sorted(out["sim"], reverse=True), [s for s, _, _ in want], atol=1e-12
    )


@pytest.mark.usefixtures("ray_session")
def test_paraphrase_mining_lsh_finds_near_dups():
    import pyarrow as pa
    import ray.data as rd

    from webindex.ann import paraphrase_mining

    rng = np.random.default_rng(9)
    n, d = 120, 16
    mat = rng.standard_normal((n, d))
    planted = [(3, 10), (20, 41), (55, 99)]
    for a, b in planted:
        mat[b] = mat[a] + rng.standard_normal(d) * 1e-4
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float64())
                ),
            }
        )
    ).repartition(4)

    out = paraphrase_mining(ds, max_pairs=50, mode="lsh").to_pandas()
    got = set(zip(out["a"].astype(int), out["b"].astype(int)))
    # every planted near-identical pair must surface via the LSH buckets
    # (identical sign patterns in all bands), with exact cosine re-scores
    for pair in planted:
        assert pair in got
    top3 = set(zip(out["a"][:3].astype(int), out["b"][:3].astype(int)))
    assert top3 == set(planted)
    assert (out["sim"][:3] > 0.999).all()
    # determinism across invocations
    out2 = paraphrase_mining(ds, max_pairs=50, mode="lsh").to_pandas()
    assert out.equals(out2)
