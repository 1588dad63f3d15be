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
