"""Dedup operator suite: exact, MinHash-LSH, SimHash, embedding-cosine."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from webindex.dedup import (
    MinHashStage,
    SimHashStage,
    _MERSENNE,
    _mod_p_mul_add,
    connected_components,
    embedding_dedup,
    exact_dedup,
    hamming64,
    jaccard,
    minhash_dedup,
    simhash_dedup,
)


def _labels_df(ds) -> pd.DataFrame:
    """Dedup surfaces return a (doc_id, cluster) DATASET; normalize to a
    sorted int64 frame for assertions (inputs here are tiny)."""
    return (
        ds.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(np.int64)
    )


def test_mod_p_mul_add_matches_python_ints():
    rng = np.random.default_rng(0)
    x = rng.integers(0, _MERSENNE, size=50, dtype=np.uint64)
    a = rng.integers(1, _MERSENNE, size=7, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=7, dtype=np.uint64)
    got = _mod_p_mul_add(x, a, b)
    for i in range(50):
        for j in range(7):
            expect = (int(x[i]) * int(a[j]) + int(b[j])) % _MERSENNE
            assert int(got[i, j]) == expect


def test_minhash_estimates_jaccard():
    stage = MinHashStage(num_perm=256)
    t1 = "the quick brown fox jumps over the lazy dog " * 20
    t2 = t1.replace("fox", "cat")  # high overlap
    t3 = "completely different text about the economy of spain " * 20
    s1, s2, s3 = (stage.signature(t) for t in (t1, t2, t3))
    est12 = float(np.mean(s1 == s2))
    est13 = float(np.mean(s1 == s3))
    true12 = jaccard(t1, t2)
    assert abs(est12 - true12) < 0.15
    assert est13 < 0.05
    # determinism
    assert np.array_equal(stage.signature(t1), MinHashStage(num_perm=256).signature(t1))


def test_connected_components():
    pairs = pd.DataFrame({"a": [1, 2, 10], "b": [2, 3, 11]})
    cc = connected_components(pairs)
    m = dict(zip(cc["doc_id"], cc["cluster"]))
    assert m == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_hamming64():
    assert hamming64(0, 0) == 0
    assert hamming64(0b1011, 0b0001) == 2
    assert hamming64(-1 << 0, 0) == 64  # all bits set (as int64 -1)


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


BASE = (
    "web scale data processing with ray requires careful partitioning "
    "and shuffle aware design of every operator in the pipeline " * 5
)


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup():
    rows = [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "bbb"), (6, "aaa")]
    out = exact_dedup(_docs_ds(rows)).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2, 4]


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_clusters_near_dups():
    rows = [
        (1, BASE),
        (2, BASE.replace("careful", "cautious")),        # near-dup of 1
        (3, "unrelated short document about gardens and flowers " * 6),
        (4, BASE.replace("ray", "beam")),                 # near-dup of 1
        (5, "another unrelated text on medieval history of europe " * 6),
    ]
    cc = _labels_df(minhash_dedup(_docs_ds(rows), threshold=0.5,
                                  concurrency=2))
    m = dict(zip(cc["doc_id"].astype(int), cc["cluster"].astype(int)))
    assert m.get(1) == m.get(2) == m.get(4) == 1
    assert 3 not in m and 5 not in m


@pytest.mark.usefixtures("ray_session")
def test_simhash_dedup():
    rows = [
        (1, BASE),
        (2, BASE + " extra"),
        (3, "gardens flowers unrelated " * 30),
    ]
    cc = _labels_df(simhash_dedup(_docs_ds(rows), max_hamming=6,
                                  concurrency=2))
    m = dict(zip(cc["doc_id"].astype(int), cc["cluster"].astype(int)))
    assert m.get(1) == m.get(2) == 1
    assert 3 not in m


@pytest.mark.usefixtures("ray_session")
def test_embedding_dedup():
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = rng.standard_normal(32)
    rows = {
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array(
            [
                base.tolist(),
                (base + rng.standard_normal(32) * 0.01).tolist(),  # near-dup
                rng.standard_normal(32).tolist(),
                (-base).tolist(),  # anti-parallel: NOT a dup
            ],
            pa.list_(pa.float32()),
        ),
    }
    cc = _labels_df(embedding_dedup(rd.from_arrow(pa.table(rows)),
                                    threshold=0.95))
    m = dict(zip(cc["doc_id"].astype(int), cc["cluster"].astype(int)))
    assert m.get(1) == m.get(2) == 1
    assert 3 not in m and 4 not in m


@pytest.mark.usefixtures("ray_session")
def test_connected_components_ds_matches_union_find():
    import ray.data as rd

    from webindex.dedup import connected_components_ds

    rng = np.random.default_rng(11)
    # random graph + a long chain (multi-round convergence) + isolated pair
    a = rng.integers(0, 400, size=600)
    b = rng.integers(0, 400, size=600)
    mask = a != b
    chain = np.arange(1000, 1300)
    pairs = pd.DataFrame(
        {
            "a": np.concatenate([a[mask], chain[:-1], [5000]]),
            "b": np.concatenate([b[mask], chain[1:], [5001]]),
        }
    )
    want = connected_components(pairs)
    got = (
        connected_components_ds(rd.from_pandas(pairs), n_parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got, want.astype(np.int64))


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_distributed_cc_matches_driver():
    rows = [
        (1, BASE),
        (2, BASE.replace("careful", "cautious")),
        (3, "unrelated short document about gardens and flowers " * 6),
        (4, BASE.replace("ray", "beam")),
        (5, "another unrelated text on medieval history of europe " * 6),
        (6, BASE.replace("pipeline", "dataflow")),
    ]
    drv = _labels_df(
        minhash_dedup(_docs_ds(rows), threshold=0.5, cc_mode="driver"))
    dist = _labels_df(
        minhash_dedup(_docs_ds(rows), threshold=0.5, cc_mode="distributed"))
    pd.testing.assert_frame_equal(drv, dist)


@pytest.mark.usefixtures("ray_session")
def test_simhash_dedup_matches_brute_oracle_on_testdata():
    """All-pairs brute hamming oracle (4x16-bit banding is COMPLETE for
    hamming<=3 by pigeonhole, so LSH candidates lose nothing). Regression:
    a pandas float64 coercion once rounded 64-bit signatures past 2^53
    during the verify join, producing phantom near-dup pairs."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webindex.dedup import _popcount64

    tab = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    sig = SimHashStage()(tab)
    ids = np.asarray(sig.column("doc_id").to_pylist(), dtype=np.int64)
    sh = np.asarray(sig.column("simhash").to_pylist(), dtype=np.int64).view(
        np.uint64
    )
    dist = _popcount64(sh[:, None] ^ sh[None, :])
    ii, jj = np.where(np.triu(dist <= 3, k=1))
    a = np.minimum(ids[ii], ids[jj])
    b = np.maximum(ids[ii], ids[jj])
    want = connected_components(pd.DataFrame({"a": a, "b": b}))
    got = _labels_df(simhash_dedup(rd.from_arrow(tab), max_hamming=3))
    pd.testing.assert_frame_equal(
        got, want.reset_index(drop=True).astype(np.int64),
    )


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_dedup_matches_brute_oracle():
    """All-pairs exact-Jaccard oracle: shared-shingle candidate generation
    is complete for threshold > 0, so the engine must find exactly the
    brute-force cluster set."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webindex.dedup import ngram_jaccard_dedup

    tab = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ids = tab.column("doc_id").to_pylist()
    txts = tab.column("text").to_pylist()
    pairs = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if jaccard(txts[i] or "", txts[j] or "", 3) >= 0.5:
                a, b = sorted((ids[i], ids[j]))
                pairs.append((a, b))
    want = connected_components(pd.DataFrame(pairs, columns=["a", "b"]))
    got = _labels_df(ngram_jaccard_dedup(rd.from_arrow(tab), threshold=0.5))
    pd.testing.assert_frame_equal(
        got, want.reset_index(drop=True).astype(np.int64),
    )


@pytest.mark.usefixtures("ray_session")
def test_dedup_labels_are_a_dataset_surface():
    """The dedup surfaces return a ray.data.Dataset of (doc_id, cluster)
    — at web scale the membership table is billions of rows, so the
    labels must be consumable DISTRIBUTED (filter/join in map_batches)
    and identical regardless of input partitioning."""
    import ray.data as rd

    rows = [
        (1, BASE),
        (2, BASE.replace("careful", "cautious")),
        (3, "unrelated short document about gardens and flowers " * 6),
        (4, BASE.replace("ray", "beam")),
        (5, "another unrelated text on medieval history of europe " * 6),
        (6, BASE.replace("pipeline", "dataflow")),
    ]
    labels = minhash_dedup(_docs_ds(rows), threshold=0.5)
    assert isinstance(labels, rd.Dataset)

    # distributed consumption: keep only each cluster's canonical doc
    # (doc_id == cluster) without ever pulling labels to the driver
    canon = labels.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t.column("doc_id"), t.column("cluster"))
        ),
        batch_format="pyarrow",
    )
    assert canon.count() == 1  # docs 1/2/4/6 cluster to min-label 1

    # partition invariance: labels identical at 1 block and many blocks
    one = _labels_df(
        minhash_dedup(_docs_ds(rows).repartition(1), threshold=0.5))
    many = _labels_df(
        minhash_dedup(_docs_ds(rows).repartition(7), threshold=0.5))
    pd.testing.assert_frame_equal(one, many)

    # the distributed-CC path is partition-invariant too
    dist = _labels_df(
        minhash_dedup(_docs_ds(rows).repartition(5), threshold=0.5,
                      cc_mode="distributed"))
    pd.testing.assert_frame_equal(one, dist)

    # empty result is still a Dataset with the pinned schema
    empty = minhash_dedup(
        _docs_ds([(7, "zebra quartz " * 5), (8, "unrelated mosaic " * 5)]),
        threshold=0.9,
    )
    assert isinstance(empty, rd.Dataset)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"doc_id", "cluster"}


@pytest.mark.usefixtures("ray_session")
def test_dedup_keep_canonical_applies_labels_distributed():
    """dedup_keep_canonical = corpus anti-join dropped-ids: keeps every
    unclustered doc plus each cluster's min-docID canonical member, via
    one hash-partitioned shuffle (no driver materialization)."""
    import ray.data as rd

    from webindex.dedup import dedup_keep_canonical

    rows = [
        (1, BASE),
        (2, BASE.replace("careful", "cautious")),
        (3, "unrelated short document about gardens and flowers " * 6),
        (4, BASE.replace("ray", "beam")),
        (5, "another unrelated text on medieval history of europe " * 6),
    ]
    docs = _docs_ds(rows)
    labels = minhash_dedup(docs, threshold=0.5)
    kept = dedup_keep_canonical(
        docs, labels,
        rows_types={"doc_id": pa.int64(), "text": pa.string()},
    )
    got = sorted(kept.to_pandas()["doc_id"].tolist())
    assert got == [1, 3, 5]  # 2 and 4 dropped (cluster 1's non-canonical)

    # empty label set keeps everything
    from webindex.dedup import _empty_labels_ds

    all_kept = dedup_keep_canonical(
        docs, _empty_labels_ds(),
        rows_types={"doc_id": pa.int64(), "text": pa.string()},
    )
    assert sorted(all_kept.to_pandas()["doc_id"].tolist()) == [1, 2, 3, 4, 5]

    # partition invariance of the join
    kept7 = dedup_keep_canonical(
        docs.repartition(7), labels,
        rows_types={"doc_id": pa.int64(), "text": pa.string()},
    )
    assert sorted(kept7.to_pandas()["doc_id"].tolist()) == got


@pytest.mark.usefixtures("ray_session")
def test_minhash_bands_non_divisor_bands():
    """bands need not divide num_perm: the tail permutations are unused
    (the pre-vectorization slice semantics) — must not crash the
    reshape and must emit exactly docs x bands rows."""
    import ray.data as rd

    from webindex.dedup import minhash_bands

    sig = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "sig": pa.array([list(range(10)), list(range(10, 20))],
                        pa.list_(pa.int64(), 10)),
    }))
    out = minhash_bands(sig, num_perm=10, bands=3).to_pandas()
    assert len(out) == 2 * 3
    assert sorted(out["band_id"].unique().tolist()) == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_hash_semi_join_modes():
    """hash_semi_join: semi keeps key-matched rows, anti keeps the rest;
    string keys route through stable_hash64 partitioning."""
    import ray.data as rd

    from webindex.relational import hash_semi_join

    rows = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array(list("abcde")),
    }))
    side = rd.from_arrow(pa.table({"k": pa.array([2, 4, 9], pa.int64())}))
    types = {"k": pa.int64(), "v": pa.string()}
    semi = hash_semi_join(rows, "k", side, rows_types=types).to_pandas()
    assert sorted(semi["k"].tolist()) == [2, 4]
    anti = hash_semi_join(rows, "k", side, rows_types=types,
                          anti=True).to_pandas()
    assert sorted(anti["k"].tolist()) == [1, 3, 5]

    srows = rd.from_arrow(pa.table({
        "k": pa.array(["x", "y", "z"]),
        "v": pa.array([1, 2, 3], pa.int64()),
    }))
    sside = rd.from_arrow(pa.table({"k": pa.array(["y"])}))
    stypes = {"k": pa.string(), "v": pa.int64()}
    assert sorted(hash_semi_join(
        srows, "k", sside, rows_types=stypes, anti=True
    ).to_pandas()["k"].tolist()) == ["x", "z"]


@pytest.mark.usefixtures("ray_session")
def test_ngram_truncation_is_surfaced():
    """Bucket truncation (shingle shared by > max_bucket docs) must warn —
    pairs whose only shared shingles sit in truncated buckets are missing,
    so silence would misrepresent candidate generation as complete."""
    import warnings

    import ray.data as rd

    from webindex.dedup import ngram_jaccard_dedup

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            # all six docs share every shingle -> one giant bucket per
            # shingle, truncated at max_bucket=3
            "text": pa.array(["common words here shared by all"] * 6),
        }
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ngram_jaccard_dedup(rd.from_arrow(docs), threshold=0.5, max_bucket=3)
        msgs = [str(x.message) for x in w if x.category is UserWarning]
    assert any("truncated" in m for m in msgs)


@pytest.mark.usefixtures("ray_session")
def test_attach_pair_payloads_broadcast_matches_shuffle():
    """The small-pairs broadcast fast path and the union+groupby shuffle
    path must produce identical joined rows."""
    import ray.data as rd

    from webindex.dedup import attach_pair_payloads

    pairs = rd.from_pandas(
        pd.DataFrame(
            {"a": [1, 1, 2, 5], "b": [2, 3, 3, 6],
             "truncated": [False, True, False, False]}
        )
    ).materialize()
    pay = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 5, 6, 7], pa.int64()),
                "text": pa.array(["t1", "t2", "t3", "t5", "t6", "t7"]),
                "simhash": pa.array(
                    [(1 << 62) + i for i in range(6)], pa.int64()
                ),
            }
        )
    )
    key = ["a", "b"]
    fast = (
        attach_pair_payloads(pairs, pay, ["text", "simhash"])
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    shuf = (
        attach_pair_payloads(pairs, pay, ["text", "simhash"],
                             broadcast_limit=0)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    assert sorted(fast.columns) == sorted(shuf.columns)
    pd.testing.assert_frame_equal(fast, shuf[fast.columns])
    # 64-bit payloads survive exactly (the pandas float64 hazard)
    assert fast["simhash_a"].tolist() == [
        (1 << 62) + 0, (1 << 62) + 0, (1 << 62) + 1, (1 << 62) + 3
    ]


def test_poly_base_hash_variants():
    """SQL-checkable "poly" base hash: same operator semantics as the
    default blake2b path (identical text -> identical signature, near-dup
    -> near signature), values bounded by the Mersenne prime so they are
    reproducible in DuckDB HUGEINT math (contract entries minhash_sigs /
    simhash_sigs)."""
    import pyarrow as pa

    from webindex.dedup import (MinHashStage, SimHashStage, _MERSENNE,
                                _poly_hash, hamming64)

    # the polynomial definition pinned by the SQL oracle
    h = 0
    for ch in "abc def":
        h = (h * 1000003 + ord(ch)) % (2**61 - 1)
    assert _poly_hash("abc def") == h

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = a + " tail"
    c = "completely different words entirely here nothing shared at all"
    st = MinHashStage(num_perm=64, base_hash="poly")
    sa, sb, sc = (st.signature(t) for t in (a, b, c))
    assert np.array_equal(sa, st.signature(a))
    assert (sa < np.uint64(_MERSENNE)).all()
    assert (sa == sb).mean() > (sa == sc).mean()

    tab = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array([a, b, c])})
    sh = SimHashStage(base_hash="poly")(tab).column("simhash").to_pylist()
    assert all(0 <= v < (1 << 61) for v in sh)
    assert hamming64(sh[0], sh[1]) < hamming64(sh[0], sh[2])
    # tokenless text -> sentinel 0
    empty = SimHashStage(base_hash="poly")(
        pa.table({"doc_id": pa.array([9], pa.int64()),
                  "text": pa.array(["!!!"])})
    )
    assert empty.column("simhash").to_pylist() == [0]


def test_cross_doc_dup_ngrams_matches_brute(ray_session):
    import ray.data as rd

    from webindex.dedup import cross_doc_dup_ngrams

    # corpus with engineered cross-doc repeats: docs 0/1 share a span,
    # doc 2 repeats its own trigram, doc 3 is unique, doc 4 is too short
    docs = [
        (0, "alpha beta gamma delta epsilon one two"),
        (1, "zz alpha beta gamma delta epsilon yy"),
        (2, "red blue green red blue green tail"),
        (3, "totally unique words here nothing shared"),
        (4, "tiny doc"),
        (5, ""),
    ]
    n, min_count = 3, 2
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    out = (
        cross_doc_dup_ngrams(ds, n=n, min_count=min_count, n_parts=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    # brute: global multiset of shingles, then per-position dup flags
    import re
    from collections import Counter

    tok = re.compile(r"[a-z0-9]+")
    shingles = {
        d: [
            " ".join(ts[i: i + n])
            for ts in [tok.findall(t.lower())]
            for i in range(len(ts) - n + 1)
        ]
        for d, t in docs
    }
    global_counts = Counter(g for gs in shingles.values() for g in gs)
    for d, gs in shingles.items():
        if not gs:
            assert d not in out.index
            continue
        n_dup = sum(1 for g in gs if global_counts[g] >= min_count)
        row = out.loc[d]
        assert int(row["n_shingles"]) == len(gs), d
        assert int(row["n_dup"]) == n_dup, d
        assert float(row["dup_frac"]) == n_dup / len(gs), d
    # the fixture must exercise cross-doc, within-doc, and zero cases
    assert int(out.loc[0, "n_dup"]) > 0
    assert int(out.loc[2, "n_dup"]) > 0
    assert int(out.loc[3, "n_dup"]) == 0


def test_contamination_matches_brute(ray_session):
    import ray.data as rd

    from webindex.dedup import contamination

    corpus = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "beta gamma delta unrelated words here"),
        (2, "nothing in common at all"),
        (3, "alpha beta gamma"),   # fully contained in eval
        (4, "xy"),                 # too short for a trigram
    ]
    evals = [(100, "alpha beta gamma delta"), (101, "words here too")]
    n = 3
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in corpus], pa.int64()),
                "text": pa.array([t for _, t in corpus]),
            }
        )
    )
    out = (
        contamination(ds, evals, n=n)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    import re

    tok = re.compile(r"[a-z0-9]+")

    def grams(t):
        ts = tok.findall(t.lower())
        return [" ".join(ts[i: i + n]) for i in range(len(ts) - n + 1)]

    ev_set = {g for _e, t in evals for g in grams(t)}
    for d, t in corpus:
        gs = grams(t)
        if not gs:
            assert d not in out.index
            continue
        hits = sum(1 for g in gs if g in ev_set)
        row = out.loc[d]
        assert int(row["n_shingles"]) == len(gs), d
        assert int(row["n_overlap"]) == hits, d
        assert float(row["overlap_frac"]) == hits / len(gs), d
    assert int(out.loc[3, "n_overlap"]) == 1  # exact containment case
    assert int(out.loc[2, "n_overlap"]) == 0


def _brute_dedup_spans(docs, n, min_count):
    import re
    from collections import Counter

    tok = re.compile(r"[a-z0-9]+")
    toks = {d: tok.findall(t.lower()) for d, t in docs}
    counts: Counter = Counter()
    for ts in toks.values():
        for i in range(len(ts) - n + 1):
            counts[tuple(ts[i: i + n])] += 1
    out = {}
    for d, ts in toks.items():
        m = len(ts)
        covered = [False] * m
        for i in range(m - n + 1):
            if counts[tuple(ts[i: i + n])] >= min_count:
                for j in range(i, i + n):
                    covered[j] = True
        kept = [t for t, c in zip(ts, covered) if not c]
        out[d] = (" ".join(kept), m, m - len(kept))
    return out


def test_dedup_spans_matches_brute(ray_session):
    import ray.data as rd

    from webindex.dedup import dedup_spans

    docs = [
        (0, "alpha beta gamma delta epsilon one two"),
        (1, "zz alpha beta gamma delta epsilon yy"),
        (2, "red blue green red blue green tail"),  # self-repeat
        (3, "totally unique words here nothing shared"),
        (4, "tiny doc"),  # shorter than n: kept whole
        (5, ""),
        (6, "alpha beta gamma something else entirely follows"),
    ]
    n, min_count = 3, 2
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    out = (
        dedup_spans(ds, n=n, min_count=min_count, n_parts=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _brute_dedup_spans(docs, n, min_count)
    assert set(out.index) == set(want)  # EVERY doc appears
    for d, (ct, nt, rm) in want.items():
        row = out.loc[d]
        assert row["clean_text"] == ct, d
        assert int(row["n_tokens"]) == nt
        assert int(row["n_removed"]) == rm
    # sanity: the engineered shared span was actually removed somewhere
    assert any(v > 0 for v in out["n_removed"])
    # doc 3 untouched
    assert out.loc[3, "n_removed"] == 0


def test_dedup_spans_partition_invariance(ray_session):
    import ray.data as rd

    from webindex.dedup import dedup_spans

    rng = np.random.default_rng(7)
    vocab = "aa bb cc dd ee".split()
    docs = [
        (i, " ".join(vocab[int(j)] for j in rng.integers(0, 5, size=15)))
        for i in range(30)
    ]
    tab = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs]),
        }
    )
    outs = []
    for n_parts, n_blocks in [(4, 1), (16, 6)]:
        ds = rd.from_arrow(tab)
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        outs.append(
            dedup_spans(ds, n=3, min_count=2, n_parts=n_parts)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    a, b = outs
    assert a.equals(b)
    assert (a["n_removed"] > 0).any()  # small vocab: repeats guaranteed


def test_paragraph_dedup_matches_brute(ray_session):
    """Dolma paragraph dedup: engineered duplicate windows, brute
    first-wins replay, every doc present, partition invariance."""
    import ray.data as rd

    from webindex.dedup import paragraph_dedup
    from webindex.textstats import _ASCII_TOK_RE

    P = 4
    shared = "alpha beta gamma delta"          # one exact paragraph
    docs = [
        (0, f"{shared} one two three four"),
        (1, f"{shared} five six seven eight"),  # dup of doc 0's para 0
        (2, "five six seven eight " + shared),  # dup appears at para 1
        (3, shared),                             # fully duplicated doc
        (4, ""),                                 # empty doc
        (5, "unique tokens only here yes"),
    ]

    def brute():
        paras = []
        for did, t in docs:
            toks = _ASCII_TOK_RE.findall(t.lower())
            for pid, s in enumerate(range(0, len(toks), P)):
                paras.append((did, pid, " ".join(toks[s:s + P])))
        first = {}
        for did, pid, pt in sorted(paras):
            first.setdefault(pt, (did, pid))
        out = {}
        for did, t in docs:
            toks = _ASCII_TOK_RE.findall(t.lower())
            kept = [
                " ".join(toks[s:s + P])
                for pid, s in enumerate(range(0, len(toks), P))
                if first[" ".join(toks[s:s + P])] == (did, pid)
            ]
            n_paras = -(-len(toks) // P)
            out[did] = (" ".join(kept), len(kept), n_paras)
        return out

    want = brute()
    for blocks in (1, 4):
        tab = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
        ds = rd.from_arrow(tab).repartition(blocks)
        got = paragraph_dedup(ds, para_tokens=P, n_parts=8).to_pandas()
        assert len(got) == len(docs)
        for _, r in got.iterrows():
            w = want[int(r["doc_id"])]
            assert (r["text"], int(r["n_kept"]), int(r["n_paras"])) == w, (
                r["doc_id"], blocks,
            )
    # the engineered duplicates actually dedup
    assert want[1][1] < want[1][2] and want[3][0] == ""


def test_lsh_plan_properties():
    """The planner returns exact factorizations whose S-curve collision
    threshold (1/b)^(1/r) tracks the target, monotonically in it."""
    from webindex.dedup import lsh_plan

    prev_thresh = 0.0
    for t in (0.3, 0.5, 0.7, 0.8, 0.9):
        b, r = lsh_plan(t, 128)
        assert b * r == 128
        curve_t = (1.0 / b) ** (1.0 / r)
        assert abs(curve_t - t) < 0.15
        assert curve_t >= prev_thresh  # monotone in the target
        prev_thresh = curve_t
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_plan(1.0)


def test_minhash_dedup_incremental(tmp_path, ray_session):
    """Incremental (new-vs-store) dedup: dup_of = min matching STORED
    doc at exact Jaccard >= threshold; new-new dups are NOT flagged
    (the store is the reference set); store params come from meta.json."""
    import json

    import ray.data as rd

    from webindex.dedup import (_jaccard_keep, build_minhash_store,
                                minhash_dedup_incremental)

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "with many words shared across documents for shingling")
    store_docs = [
        {"doc_id": 2, "text": base},
        {"doc_id": 4, "text": base + " tail tokens"},
        {"doc_id": 6, "text": "completely different content about rivers "
                              "and mountains and weather patterns today"},
    ]
    new_docs = [
        {"doc_id": 1, "text": base},                      # exact dup of 2 (and 4-ish)
        {"doc_id": 3, "text": "unique new document with words nothing "
                              "else contains whatsoever in this corpus"},
        {"doc_id": 5, "text": "unique new document with words nothing "
                              "else contains whatsoever in this corpus"},
        # 3 and 5 duplicate EACH OTHER but no stored doc -> not flagged
    ]
    store_dir = str(tmp_path / "store")
    build_minhash_store(rd.from_items(store_docs), store_dir,
                        num_perm=64, bands=8, shingle_k=3)
    meta = json.load(open(store_dir + "/meta.json"))
    assert meta["num_perm"] == 64 and meta["bands"] == 8

    labels = minhash_dedup_incremental(
        rd.from_items(new_docs), store_dir, threshold=0.8
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    # brute-force oracle: for each new doc, min stored doc with
    # exact shingle Jaccard >= 0.8 (same _jaccard_keep kernel)
    want = {}
    for n in new_docs:
        matches = [
            s["doc_id"] for s in store_docs
            if _jaccard_keep([s["text"]], [n["text"]], 3, 0.8, "blake2b")[0]
        ]
        if matches:
            want[n["doc_id"]] = min(matches)
    assert dict(zip(labels["doc_id"], labels["dup_of"])) == want
    assert 1 in want          # the exact dup was caught
    assert 3 not in want and 5 not in want  # new-new pair not flagged

    # empty new batch -> empty labels with the right schema
    empty = minhash_dedup_incremental(
        rd.from_items([{"doc_id": 99, "text": "zz qq ww"}]), store_dir
    ).to_pandas()
    assert len(empty) == 0


def test_minhash_dedup_incremental_replay_and_partition_invariance(
        tmp_path, ray_session):
    """The distributed incremental pipeline equals a driver-side replay
    of the same math (MinHashStage sig -> band mix -> old x new bucket
    match -> exact-Jaccard verify -> min per new doc), on a random
    corpus dense with near-dups; labels are partition-count-independent."""
    import ray.data as rd

    from webindex.dedup import (MinHashStage, _jaccard_keep,
                                build_minhash_store,
                                minhash_dedup_incremental)

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(120):
        if i % 3 == 0 and i > 0:
            # near-dup of an earlier doc: copy + small tail edit
            base = texts[rng.integers(0, len(texts))]
            texts.append(base + " " + " ".join(
                rng.choice(vocab, size=2)
            ))
        else:
            texts.append(" ".join(rng.choice(vocab, size=40)))
    docs = [{"doc_id": i + 1, "text": t} for i, t in enumerate(texts)]
    old = [d for d in docs if d["doc_id"] % 2 == 0]
    new = [d for d in docs if d["doc_id"] % 2 == 1]

    num_perm, bands, k, thr = 64, 16, 3, 0.8
    store_dir = str(tmp_path / "store")
    build_minhash_store(rd.from_items(old), store_dir,
                        num_perm=num_perm, bands=bands, shingle_k=k)
    got = minhash_dedup_incremental(
        rd.from_items(new), store_dir, threshold=thr
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    # driver replay with the same stage kernel + the band mix math
    st = MinHashStage(num_perm=num_perm, shingle_k=k)
    def band_hashes(rows):
        tab = st(pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows]),
        }))
        sig = np.array(tab.column("sig").to_pylist(), np.int64)
        r = num_perm // bands
        mat = sig.astype(np.uint64)[:, : bands * r].reshape(-1, bands, r)
        mix = np.uint64(0x9E3779B97F4A7C15)
        h = np.zeros(mat.shape[:2], np.uint64)
        for j in range(r):
            h = (h ^ (mat[:, :, j] + mix)) * mix
        return h
    h_old, h_new = band_hashes(old), band_hashes(new)
    want = {}
    for ni, n in enumerate(new):
        cands = [
            o for oi, o in enumerate(old)
            if (h_old[oi] == h_new[ni]).any()
        ]
        hits = [
            o["doc_id"] for o in cands
            if _jaccard_keep([o["text"]], [n["text"]], k, thr,
                             "blake2b")[0]
        ]
        if hits:
            want[n["doc_id"]] = min(hits)
    assert dict(zip(got["doc_id"], got["dup_of"])) == want
    assert len(want) > 0  # the corpus really has cross-half dups

    # partition invariance: 1 block vs 7 blocks, identical labels
    got7 = minhash_dedup_incremental(
        rd.from_items(new).repartition(7), store_dir, threshold=thr
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got7)
