"""WAND on a realistic long-tail vocabulary: rank identity to the dense
scorer AND actual pruning benefit (the synthetic bench corpus's ~100-word
vocab makes every term stopword-scale, where vectorized scoring wins; real
web vocabularies are Zipf with a long tail, where WAND's skipping pays)."""

import time

import numpy as np
import pytest

from webindex.config import AnalyzerConfig, IndexConfig

CFG = IndexConfig(num_buckets=8, n_parts=8,
                  analyzer=AnalyzerConfig(remove_stopwords=False, stem=False))


def _longtail_docs(n_docs: int, vocab_size: int = 20_000, seed: int = 23):
    rng = np.random.default_rng(seed)
    # Zipf weights over a big vocabulary
    ranks = np.arange(1, vocab_size + 1)
    w = 1.0 / ranks
    w /= w.sum()
    docs = []
    for i in range(n_docs):
        n = int(rng.integers(30, 120))
        words = rng.choice(vocab_size, size=n, p=w)
        docs.append((i, " ".join(f"w{x}" for x in words)))
    return docs


@pytest.mark.usefixtures("ray_session")
def test_wand_identical_and_pruning_on_longtail(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from webindex.build import build_index
    from webindex.search import SearcherActor
    from webindex.wand import block_max_wand, exhaustive_topk

    docs = _longtail_docs(4000)
    idx = str(tmp_path / "idx")
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(4)
    build_index(ds, idx, CFG)

    s = SearcherActor(idx, top_k=10, mode="exhaustive")
    # queries mixing a head term with tail terms — WAND's good case
    queries = ["w1 w900 w5000", "w3 w1200", "w0 w2500 w7000 w40"]
    for q in queries:
        terms = s.an.tokens(q)
        iw, sw = block_max_wand(s.reader, terms, 10)
        ie, se = exhaustive_topk(s.reader, terms, 10)
        assert iw.tolist() == ie.tolist(), q
        assert np.allclose(sw, se, atol=1e-9), q

    # with k tiny relative to candidates, WAND must visit (and fully
    # score) only a fraction of the candidate docs
    from webindex.wand import query_postings

    terms = s.an.tokens(queries[0])
    pls = query_postings(s.reader, terms)
    n_candidates = len(
        set(np.concatenate([pl.ids for pl in pls]).tolist())
    )
    assert n_candidates > 500  # the head term makes the OR-set large
    stats: dict = {}
    block_max_wand(s.reader, terms, 10, stats=stats)
    assert stats["n_scored"] < n_candidates * 0.5, (
        f"WAND fully scored {stats['n_scored']}/{n_candidates} candidates"
        " - no pruning"
    )
