"""Varbyte/delta codec: roundtrip, boundaries, randomized (seeded)."""

import numpy as np
import pytest

from webindex.compress import (
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.int64)) == b""
    assert varbyte_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.int64)) == b""
    assert delta_decode(b"").size == 0


def test_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2097151, 2097152, (1 << 62) - 1],
        dtype=np.int64,
    )
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_single_byte_values_encode_to_one_byte_each():
    vals = np.arange(128, dtype=np.int64)
    assert len(varbyte_encode(vals)) == 128


def test_negative_rejected():
    with pytest.raises(ValueError):
        varbyte_encode(np.array([-1], dtype=np.int64))


def test_randomized_roundtrip():
    rng = np.random.default_rng(42)
    for _ in range(25):
        n = int(rng.integers(0, 3000))
        v = rng.integers(0, 1 << int(rng.integers(1, 62)), size=n)
        assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)
        ids = np.unique(rng.integers(0, 1 << 40, size=n))
        assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_delta_first_value_is_absolute():
    ids = np.array([1000], dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


# ---------------- Elias-Fano docID codec ----------------


def test_ef_roundtrip_cases():
    from webindex.compress import ef_decode, ef_encode

    rng = np.random.default_rng(0)
    cases = [
        np.array([], dtype=np.int64),
        np.array([0], dtype=np.int64),
        np.array([2**45], dtype=np.int64),
        np.arange(128, dtype=np.int64),                      # lo == 0
        np.array([3, 7, 900, 2**40, 2**40 + 1], dtype=np.int64),
        (2**45 + np.cumsum(rng.integers(1, 50, 128))).astype(np.int64),
        np.cumsum(rng.integers(1, 100000, 64)).astype(np.int64),
    ]
    for ids in cases:
        assert np.array_equal(ef_decode(ef_encode(ids), ids.size), ids)


def test_ef_rejects_non_monotone():
    from webindex.compress import ef_encode

    with pytest.raises(ValueError):
        ef_encode(np.array([3, 3], dtype=np.int64))
    with pytest.raises(ValueError):
        ef_encode(np.array([-1, 4], dtype=np.int64))


def test_ef_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from webindex.compress import ef_decode, ef_encode

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**50),
                    min_size=1, max_size=200, unique=True))
    def run(vals):
        ids = np.array(sorted(vals), dtype=np.int64)
        assert np.array_equal(ef_decode(ef_encode(ids), ids.size), ids)

    run()


def test_ef_beats_varbyte_on_dense_gaps():
    """The codec's reason to exist: below ~64-gap density EF undercuts
    varbyte's 8-bit/posting floor (base-relative, so a sharded prefix
    costs a constant, not log2(first) bits per value)."""
    from webindex.compress import ef_encode, varbyte_encode

    rng = np.random.default_rng(1)
    ids = (2**45 + np.cumsum(rng.integers(1, 6, 128))).astype(np.int64)
    gaps = np.diff(np.concatenate([[ids[0]], ids]))
    assert len(ef_encode(ids)) < 0.6 * len(varbyte_encode(gaps))


def test_ef_index_rank_identical_and_fsck_clean(ray_session, tmp_path):
    """Full stack: an index built with codec='ef' must return EXACTLY the
    same ids and scores as the varbyte index, and pass fsck."""
    import ray.data as rd

    from webindex.build import build_index
    from webindex.config import IndexConfig, SQL_SAFE_ANALYZER
    from webindex.fsck import check_index
    from webindex.pipelines.corpus import corpus_from_documents
    from webindex.search import SearcherActor

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    queries = [("q1", "table merge sort"), ("q2", "spark window"),
               ("q3", "the fast key value row")]
    results = {}
    for codec in ("varbyte", "ef"):
        out = str(tmp_path / f"idx-{codec}")
        build_index(
            corpus_from_documents(docs), out,
            IndexConfig(analyzer=SQL_SAFE_ANALYZER, num_buckets=8,
                        codec=codec),
        )
        s = SearcherActor(out, top_k=100, mode="auto")
        results[codec] = {
            qid: (s.search_one(qid, t)[0].tolist(),
                  s.search_one(qid, t)[1].tolist())
            for qid, t in queries
        }
    assert results["varbyte"] == results["ef"]
    rep = check_index(str(tmp_path / "idx-ef"))
    assert rep["ok"], rep["errors"]
