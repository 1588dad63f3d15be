"""MAXSCORE pruning must be invisible: exhaustive_topk with pruning active
equals the brute per-doc oracle on a long-tail vocabulary (rare + common
terms, k smaller than common df so θ > 0 and non-essential terms exist)."""

import numpy as np
import pytest

from webindex.config import AnalyzerConfig, IndexConfig
from webindex.oracle import OracleBM25

CFG = IndexConfig(num_buckets=4, n_parts=4,
                  analyzer=AnalyzerConfig(remove_stopwords=False))


@pytest.mark.usefixtures("ray_session")
def test_pruned_equals_oracle(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from webindex.build import build_index
    from webindex.search import SearcherActor

    rng = np.random.default_rng(17)
    common = ["alpha", "beta", "gamma"]
    rare = [f"rare{i}" for i in range(40)]
    docs = []
    for i in range(400):
        words = list(rng.choice(common, size=rng.integers(3, 9)))
        if i % 11 == 0:
            words += list(rng.choice(rare, size=2))
        rng.shuffle(words)
        docs.append((i, " ".join(words)))

    idx = str(tmp_path / "idx")
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(3)
    build_index(ds, idx, CFG)

    oracle = OracleBM25(docs, CFG)
    s = SearcherActor(idx, top_k=25, mode="exhaustive")
    queries = [
        "alpha rare3",             # common + rare: rare is non-essential
        "alpha beta gamma",        # all common
        "rare1 rare2 alpha beta",  # mixed
        "beta",                    # single term (no pruning path)
    ]
    for q in queries:
        ids, scores = s.search_one("q", q)
        want = oracle.topk(q, 25)
        assert ids.tolist() == [d for d, _ in want], q
        assert np.allclose(scores, [sc for _, sc in want], atol=1e-12), q
