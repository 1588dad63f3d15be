"""Property-based fuzzing of the query-kernel equivalences: on random
corpora, random queries and random masks, every kernel — constrained
scatter, masked MAXSCORE, masked block-max, and the (un-gated)
quantized-impact pass — must return bit-identical (ids, scores)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webindex.config import AnalyzerConfig, IndexConfig

CFG = IndexConfig(num_buckets=2, n_parts=2,
                  analyzer=AnalyzerConfig(remove_stopwords=False))

VOCAB = ["alpha", "beta", "gamma", "delta", "rare1", "rare2", "mid"]


@pytest.fixture(scope="module")
def prop_idx(tmp_path_factory, ray_session):
    import pyarrow as pa
    import ray.data as rd

    from webindex.build import build_index

    rng = np.random.default_rng(41)
    docs = []
    for i in range(300):
        words = list(rng.choice(VOCAB[:4], size=rng.integers(1, 12)))
        if i % 13 == 0:
            words.append("rare1")
        if i % 17 == 0:
            words.append("rare2")
        if i % 5 == 0:
            words.append("mid")
        rng.shuffle(words)
        docs.append((i, " ".join(words)))
    idx = str(tmp_path_factory.mktemp("prop") / "idx")
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(2)
    build_index(ds, idx, CFG)
    from webindex.segments import SegmentReader

    return SegmentReader(idx)


@settings(max_examples=60, deadline=None)
@given(
    terms=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=5),
    k=st.integers(min_value=1, max_value=40),
    mask_seed=st.integers(min_value=0, max_value=2**31 - 1),
    mask_frac=st.sampled_from([None, 0.9, 0.5, 0.1]),
)
def test_kernels_bit_identical_under_fuzz(prop_idx, terms, k, mask_seed,
                                          mask_frac):
    from webindex.wand import (block_max_wand, exhaustive_constrained,
                               exhaustive_topk)

    reader = prop_idx
    if mask_frac is None:
        mask = None
    else:
        rng = np.random.default_rng(mask_seed)
        mask = rng.random(reader._dl_ids.size) < mask_frac
    ref = exhaustive_constrained(reader, terms, k, mask=mask)
    for fn in (exhaustive_topk, block_max_wand):
        got = fn(reader, terms, k, mask=mask)
        assert np.array_equal(ref[0], got[0]), (terms, k, mask_frac)
        assert np.array_equal(ref[1], got[1]), (terms, k, mask_frac)


@settings(max_examples=40, deadline=None)
@given(
    terms=st.lists(st.sampled_from(VOCAB[:5]), min_size=2, max_size=5),
    k=st.integers(min_value=1, max_value=30),
    masked=st.booleans(),
)
def test_quantized_pass_equivalence_fuzz(prop_idx, terms, k, masked):
    """Bypass the size gate: the quantized pass itself must equal the
    constrained kernel whenever a θ exists."""
    from webindex.wand import (_dense, _quantized_topk, _refined_theta,
                               exhaustive_constrained, query_postings)

    reader = prop_idx
    uniq = sorted(set(terms))
    pls = query_postings(reader, uniq)
    if len(pls) < 2:
        return
    for pl in pls:
        _dense(pl, reader)
    mask = None
    if masked:
        rng = np.random.default_rng(k * 7919 + 1)
        mask = rng.random(reader._dl_ids.size) < 0.6
    theta = _refined_theta(pls, k, -np.inf, mask=mask)
    if not np.isfinite(theta):
        return
    res = _quantized_topk(reader, pls, k, theta, mask)
    if res is None:
        return
    want = exhaustive_constrained(reader, uniq, k, mask=mask)
    assert np.array_equal(res[0], want[0]), (terms, k, masked)
    assert np.array_equal(res[1], want[1]), (terms, k, masked)
