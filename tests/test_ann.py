"""ANN: brute-force exact vs numpy oracle; IVF recall vs brute force."""

import numpy as np
import pytest

from webindex.ann import brute_topk, ivf_build, ivf_topk


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


def _oracle_topk(vecs, vids, q, k):
    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    sims = (norm(q) @ norm(vecs).T)
    out = []
    for row in sims:
        order = np.lexsort((vids, -row))[:k]
        out.append([(int(vids[i]), float(row[i])) for i in order])
    return out


@pytest.mark.usefixtures("ray_session")
def test_brute_topk_matches_oracle(emb_ds):
    import pyarrow.parquet as pq

    tab = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    vecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
    vids = np.array(tab.column("vec_id").to_pylist())
    qvecs = vecs[:3] + 0.01
    expect = _oracle_topk(vecs, vids, qvecs, 10)

    out = brute_topk(
        emb_ds.repartition(5), [100, 101, 102], qvecs, 10, concurrency=2
    ).to_pandas()
    for qi, qid in enumerate([100, 101, 102]):
        grp = out[out.query_id == qid].sort_values("rank")
        got = list(zip(grp["vec_id"].astype(int), grp["sim"]))
        assert [g[0] for g in got] == [e[0] for e in expect[qi]]
        np.testing.assert_allclose(
            [g[1] for g in got], [e[1] for e in expect[qi]], rtol=1e-12
        )


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall(emb_ds):
    import pyarrow.parquet as pq

    tab = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    vecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
    vids = np.array(tab.column("vec_id").to_pylist())
    qvecs = vecs[10:15]
    expect = _oracle_topk(vecs, vids, qvecs, 10)

    assigned, cents = ivf_build(emb_ds, n_centroids=8)
    out = ivf_topk(
        assigned, cents, list(range(5)), qvecs, 10, nprobe=4, concurrency=2
    ).to_pandas()
    recalls = []
    for qi in range(5):
        got = set(out[out.query_id == qi]["vec_id"].astype(int))
        want = {e[0] for e in expect[qi]}
        recalls.append(len(got & want) / len(want))
    assert np.mean(recalls) >= 0.7, recalls
    # the probed query's own vector must be found (it is its own NN)
    for qi in range(5):
        top1 = out[(out.query_id == qi) & (out["rank"] == 1)]["vec_id"].iloc[0]
        assert int(top1) == expect[qi][0][0]


@pytest.mark.usefixtures("ray_session")
def test_ivf_store_scans_only_probed_partitions(emb_ds, tmp_path):
    import os

    import pyarrow.parquet as pq

    from webindex.ann import ivf_topk_store, ivf_write

    tab = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    vecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
    qvecs = vecs[10:13]

    assigned, cents = ivf_build(emb_ds, n_centroids=8)
    store = str(tmp_path / "ivf")
    ivf_write(assigned, cents, store)

    from webindex.ann import _probe_plan

    _, probe_set, _ = _probe_plan(cents, [0, 1, 2], qvecs, 2)
    mem = ivf_topk(
        assigned, cents, [0, 1, 2], qvecs, 10, nprobe=2, concurrency=2
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    # corrupt every UNPROBED partition: if the store path touched them,
    # the read would fail — surviving proves partition pruning at the read
    for name in os.listdir(store):
        if name.startswith("centroid="):
            c = int(name.split("=")[1])
            if c not in probe_set:
                for f in os.listdir(os.path.join(store, name)):
                    with open(os.path.join(store, name, f), "wb") as fh:
                        fh.write(b"not a parquet file")

    got = ivf_topk_store(
        store, [0, 1, 2], qvecs, 10, nprobe=2
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(probe_set) < 8  # sanity: pruning actually happened
    assert got[["query_id", "vec_id", "rank"]].equals(
        mem[["query_id", "vec_id", "rank"]]
    )
    np.testing.assert_allclose(got["sim"], mem["sim"], rtol=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_ivf_seeded_matches_numpy_oracle(emb_ds):
    """Seed-centroid IVF (the SQL-verifiable variant): the whole path —
    centroids = k lowest-id vectors, argmax-cosine assignment, stable
    nprobe probe selection, candidate top-k — against a numpy re-derivation."""
    import pyarrow.parquet as pq

    from webindex.ann import ivf_assign, ivf_topk, seed_centroids

    tab = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    vids = np.array(tab.column("vec_id").to_pylist())
    order = np.argsort(vids)
    vecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)

    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    k_cent, nprobe, k = 6, 2, 8
    cents_expect = norm(vecs[order[:k_cent]])
    cents = seed_centroids(emb_ds.repartition(4), k_cent)
    np.testing.assert_allclose(cents, cents_expect, rtol=0, atol=0)

    qvecs = vecs[order[:3]] + 0.02
    nvecs = norm(vecs)
    assign_expect = np.argmax(nvecs @ cents_expect.T, axis=1)
    probe_expect = np.argsort(
        -(norm(qvecs) @ cents_expect.T), axis=1, kind="stable"
    )[:, :nprobe]

    out = ivf_topk(
        ivf_assign(emb_ds.repartition(4), cents),
        cents, [0, 1, 2], qvecs, k, nprobe=nprobe, concurrency=2,
    ).to_pandas()
    sims_all = norm(qvecs) @ nvecs.T
    for qi in range(3):
        allowed = np.isin(assign_expect, probe_expect[qi])
        s, v = sims_all[qi][allowed], vids[allowed]
        sel = np.lexsort((v, -s))[:k]
        grp = out[out.query_id == qi].sort_values("rank")
        assert list(grp["vec_id"].astype(int)) == [int(x) for x in v[sel]]
        np.testing.assert_allclose(grp["sim"], s[sel], rtol=1e-12)


def test_brute_topk_boundary_ties_keep_lowest_ids(ray_session):
    """Exactly-tied sims straddling the k boundary (identical duplicate
    docs) must resolve to the lowest vec_ids: the per-batch partial top-k
    keeps everything >= the k-th sim, so no tied row is dropped before
    the merge's (sim desc, vec_id asc) tie-break."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from webindex.ann import brute_topk

    d = 8
    v = np.zeros(d); v[0] = 1.0
    w = np.zeros(d); w[1] = 1.0
    # ids 0..9 all identical to the query; ids 10..14 orthogonal
    vecs = [v.tolist()] * 10 + [w.tolist()] * 5
    tab = pa.table(
        {
            "vec_id": pa.array(list(range(15)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        }
    )
    out = brute_topk(
        rd.from_arrow(tab).repartition(3), [0], np.array([v]), 5,
        concurrency=2, batch_size=8,
    ).to_pandas().sort_values("rank")
    assert out["vec_id"].tolist() == [0, 1, 2, 3, 4]
    assert np.allclose(out["sim"], 1.0)


def test_poly_embedder_sql_parity_shape(ray_session):
    """vec_source="poly": float64 embeddings, unit token vectors, and the
    documented component formula (hash/p - 0.5, normalized)."""
    import numpy as np
    import pyarrow as pa

    from webindex.dedup import _MERSENNE, _poly_hash
    from webindex.embed import EmbedStage, token_vector_poly

    v = token_vector_poly("spark", 16)
    raw = np.array(
        [_poly_hash(f"spark\x1f{j}") for j in range(16)], dtype=np.float64
    ) / _MERSENNE - 0.5
    assert np.allclose(v, raw / np.linalg.norm(raw))
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12

    st = EmbedStage(dim=16, max_tokens=4, vec_source="poly")
    out = st(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["spark spark window join merge"])})
    )
    assert out.schema.field("embedding").type == pa.list_(pa.float64())
    emb = np.array(out.column("embedding").to_pylist()[0])
    # truncation to 4 tokens: mean of [spark, spark, window, join] vectors
    toks = ["spark", "spark", "window", "join"]
    want = np.mean([token_vector_poly(t, 16) for t in toks], axis=0)
    assert np.allclose(emb, want, atol=1e-15)
    assert out.column("truncated").to_pylist() == [True]


def test_pq_adc_matches_brute_python(ray_session):
    """pq_topk == a from-scratch Python ADC recomputation (exact), and
    the codes/ranking are partition-count-invariant."""
    import ray.data as rd

    from webindex.ann import pq_encode, pq_topk, pq_train, _normalize

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = rd.read_parquet(path)
    books = pq_train(emb, m_subs=8, n_codes=32, sample_n=500, seed=13)
    assert books.shape == (8, 32, 8)

    import pyarrow.parquet as pq_mod

    tab = pq_mod.read_table(path)
    ids = tab.column("vec_id").to_numpy()
    mat = _normalize(
        np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
    )
    qvecs = mat[:4].copy()
    qids = [int(i) for i in ids[:4]]

    def run(blocks):
        e = rd.read_parquet(path, override_num_blocks=blocks)
        codes = pq_encode(e, books)
        out = pq_topk(codes, books, qids, qvecs, 10).to_pandas()
        return out.sort_values(["query_id", "rank"]).reset_index(drop=True)

    got = run(4)
    assert got.equals(run(1))  # partition invariance

    # brute python: encode + LUT sum per vector
    m, nc, dsub = books.shape
    codes_py = np.empty((len(ids), m), dtype=np.int64)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        # same expanded form as pq_encode (docstring spec): argmin of
        # -2 x.c + ||c||^2 — float-identical to the engine's assignment
        d2 = (
            -2.0 * (sub @ books[j].T)
            + (books[j] ** 2).sum(axis=1)[None, :]
        )
        codes_py[:, j] = np.argmin(d2, axis=1)
    qnorm = _normalize(qvecs)  # pq_topk normalizes its input once more
    for qi, qv in zip(qids, qnorm):
        lut = np.einsum(
            "jd,jcd->jc", qv.reshape(m, dsub), books
        )
        sims = lut[np.arange(m)[None, :], codes_py].sum(axis=1)
        order = np.lexsort((ids, -sims))[:10]
        want = [(int(ids[i]), float(sims[i])) for i in order]
        sub_df = got[got["query_id"] == qi]
        have = [(int(v), float(s))
                for v, s in zip(sub_df["vec_id"], sub_df["sim"])]
        assert have == want, qi

    # sanity: ADC retrieval finds a reasonable share of the exact top-10
    sims_exact = qvecs @ mat.T
    recalls = []
    for r, (qi, _qv) in enumerate(zip(qids, qvecs)):
        exact = set(
            int(ids[i]) for i in np.lexsort(
                (ids, -sims_exact[r])
            )[:10]
        )
        approx = set(got[got["query_id"] == qi]["vec_id"].astype(int))
        recalls.append(len(exact & approx) / 10)
    # synthetic embeddings have weak neighborhood structure, which caps
    # PQ recall by nature; chance level is 10/500 = 0.02, so >= 0.2 mean
    # recall demonstrates the ADC signal an order of magnitude above it
    assert np.mean(recalls) >= 0.2, recalls


def test_ivfpq_matches_brute_python(ray_session):
    """IVF-PQ == a from-scratch Python recomputation: same probe plan,
    same PQ encode (documented expansion form), ADC over probed ids
    only; partition-count invariant."""
    import ray.data as rd

    from webindex.ann import (
        _normalize,
        _probe_plan,
        ivfpq_build,
        ivfpq_topk,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    import pyarrow.parquet as pq_mod

    tab = pq_mod.read_table(path)
    ids = tab.column("vec_id").to_numpy()
    mat = _normalize(
        np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
    )
    qids = [int(i) for i in ids[:3]]
    qvecs = mat[:3].copy()

    codes_ds, cents, books = ivfpq_build(
        rd.read_parquet(path), n_centroids=8, m_subs=8, n_codes=16,
        sample_n=500, seed=13,
    )
    codes_ds = codes_ds.materialize()
    got = (
        ivfpq_topk(codes_ds, cents, books, qids, qvecs, 5, nprobe=3)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got2 = (
        ivfpq_topk(
            codes_ds.repartition(7), cents, books, qids, qvecs, 5,
            nprobe=3,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got.equals(got2)  # partition invariance

    # brute: assign + encode + probe + ADC
    m, nc, dsub = books.shape
    assign = np.argmax(mat @ cents.T, axis=1)
    codes_py = np.empty((len(ids), m), dtype=np.int64)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        d2 = (
            -2.0 * (sub @ books[j].T)
            + (books[j] ** 2).sum(axis=1)[None, :]
        )
        codes_py[:, j] = np.argmin(d2, axis=1)
    qnorm, _pset, allowed = _probe_plan(cents, qids, qvecs, 3)
    for r, qid in enumerate(qids):
        lut = np.einsum("jd,jcd->jc", qnorm[r].reshape(m, dsub), books)
        ok = np.fromiter(
            (int(c) in allowed[qid] for c in assign), bool, len(assign)
        )
        sims = lut[np.arange(m)[None, :], codes_py[ok]].sum(axis=1)
        v = ids[ok]
        sel = np.lexsort((v, -sims))[:5]
        want = [(int(v[i]), float(sims[i])) for i in sel]
        sub_df = got[got["query_id"] == qid]
        have = [(int(x), float(s))
                for x, s in zip(sub_df["vec_id"], sub_df["sim"])]
        assert have == want, qid


def test_sq8_quantize_rescore(ray_session):
    """int8 scalar quantization: encode error bound, exact-rescore
    guarantee, near-perfect recall at 8 bits, partition invariance."""
    import pyarrow as pa
    import ray.data as rd

    from webindex.ann import (_batch_vecs, _normalize, brute_topk,
                              sq8_encode, sq8_topk, sq8_train)

    rng = np.random.default_rng(31)
    n, d = 400, 16
    mat = rng.normal(size=(n, d))
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(mat.tolist(),
                                  pa.list_(pa.float64(), d)),
        }
    )
    qids = [0, 7]
    qvecs = mat[qids]

    ds = rd.from_arrow(tab)
    params = sq8_train(ds)
    lo = params["lo"]
    span = params["hi"] - lo
    codes_pd = sq8_encode(ds, params).to_pandas()
    codes = np.array(codes_pd.sort_values("vec_id")["sq8_code"].tolist())
    normed = _normalize(mat.astype(np.float64))
    dec = lo + codes * (span / 255.0)
    # quantization error bounded by half a step per dimension
    assert np.all(np.abs(dec - normed) <= span / 255.0 / 2 + 1e-12)

    want = brute_topk(ds, qids, qvecs, 5).to_pandas()
    for parts in (1, 4):
        got = sq8_topk(
            sq8_encode(ds.repartition(parts), params),
            ds.repartition(parts), params, qids, qvecs, 5, oversample=4,
        ).to_pandas()
        for qid in qids:
            g = got[got["query_id"] == qid].sort_values("rank")
            w = want[want["query_id"] == qid].sort_values("rank")
            # exact rescore: returned sims are the exact cosines
            exact = {
                int(v): float(s) for v, s in zip(w["vec_id"], w["sim"])
            }
            hits = 0
            for v, s in zip(g["vec_id"], g["sim"]):
                if int(v) in exact:
                    hits += 1
                    assert abs(float(s) - exact[int(v)]) < 1e-12
            assert hits >= 4, (qid, parts)  # recall@5 >= 0.8 at 8 bits
        # partition invariance: identical frame at 1 and 4 blocks
        if parts == 1:
            base = got.sort_values(["query_id", "rank"]).reset_index(
                drop=True
            )
        else:
            cur = got.sort_values(["query_id", "rank"]).reset_index(
                drop=True
            )
            assert base.equals(cur)
