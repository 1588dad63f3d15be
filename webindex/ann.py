"""Similarity search over an embedding column (list<float>).

Ray-Data re-expression of the reference's dense retrieval core: chunked
matmul top-k with a final merge
(/root/reference/biencoder/beir/custommodels/exact_search.py:80-132,
/root/reference/biencoder/nli_msmarco/sentence-transformers/
sentence_transformers/util.py:197-258 — SURVEY.md §2.6 K1/K2):

- ``brute_topk``: the exact baseline — queries broadcast once via
  ``ray.put``; each Arrow batch of corpus vectors does one numpy matmul and
  emits its *partial* top-k rows; a tiny ``groupby(query_id).map_groups``
  merges partials (the heap-merge of K1, vectorized).
- ``ivf_topk``: the scale path — k-means coarse centroids (trained on a
  deterministic sample), vectors assigned to their nearest centroid
  (one pass), queries probe the ``nprobe`` nearest centroid partitions
  only.

Scores are cosine similarity (float64), ties broken by ascending vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_vecs(batch: pa.Table, vec_col: str) -> np.ndarray:
    """Embedding column -> (n, d) float64 matrix without Python-row hops.

    FixedSizeList and rectangular variable lists reshape the flat Arrow
    values buffer directly (one vectorized dtype cast, no ``to_pylist``);
    ragged lists fall back to the row-wise path.
    """
    col = batch.column(vec_col)
    t = col.type
    n = len(col)
    if isinstance(t, pa.FixedSizeListType):
        if n == 0:
            return np.empty((0, t.list_size), dtype=np.float64)
        vals = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        return vals.reshape(n, t.list_size).astype(np.float64, copy=False)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        if n == 0:
            return np.empty((0, 0), dtype=np.float64)
        flat = col.combine_chunks()
        widths = np.diff(flat.offsets.to_numpy())
        if (widths == widths[0]).all():
            vals = flat.flatten().to_numpy(zero_copy_only=False)
            return vals.reshape(n, int(widths[0])).astype(
                np.float64, copy=False
            )
        return np.array(col.to_pylist(), dtype=np.float64)
    raise TypeError(f"unsupported embedding column type {col.type}")


class BruteScoreStage:
    """Partial top-k per corpus batch against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        import ray

        q = ray.get(queries_ref)
        self.qids = q["qids"]
        self.qmat = _normalize(np.asarray(q["vecs"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column(self.id_col).to_numpy()
        mat = _normalize(_batch_vecs(batch, self.vec_col))
        sims = self.qmat @ mat.T  # (Q, B)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        if k:
            # per-query partial top-k: keep everything >= the k-th best
            # sim (not argpartition's arbitrary k rows) so boundary TIES
            # all survive to the merge — whose (sim desc, vec_id asc)
            # tie-break is only exact if no tied row was dropped upstream
            # (identical duplicate docs produce exactly tied sims)
            kth = -np.partition(-sims, k - 1, axis=1)[:, k - 1]
            for qi, qid in enumerate(self.qids):
                sel = np.flatnonzero(sims[qi] >= kth[qi])
                out_q.extend([qid] * sel.size)
                out_v.extend(vids[sel].tolist())
                out_s.extend(sims[qi, sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _merge_topk_factory(k: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g

    return merge


# process-global scorer cache for the stateless-task form of the brute
# scorer (worker reuse gives actor-style state amortization; tasks scale
# elastically and — unlike a second actor pool in the same dataset —
# cannot deadlock a small cluster by reserving min-actor CPUs while an
# upstream embed pool holds the rest)
_BRUTE_CACHE: dict = {}


def _brute_score_task(batch: pa.Table, *, queries_ref, k, id_col, vec_col):
    key = (queries_ref.hex(), k, id_col, vec_col)
    st = _BRUTE_CACHE.get(key)
    if st is None:
        if len(_BRUTE_CACHE) > 8:
            _BRUTE_CACHE.clear()
        st = _BRUTE_CACHE[key] = BruteScoreStage(
            queries_ref, k, id_col, vec_col
        )
    return st(batch)


def brute_topk(emb_ds, query_ids: list[int], query_vecs: np.ndarray, k: int,
               *, id_col: str = "vec_id", vec_col: str = "embedding",
               concurrency=4, batch_size: int = 4096):
    """Exact cosine top-k -> Dataset (query_id, vec_id, sim, rank)."""
    import ray

    ref = ray.put({"qids": list(query_ids), "vecs": np.asarray(query_vecs)})
    partial = emb_ds.map_batches(
        _brute_score_task,
        fn_kwargs=dict(queries_ref=ref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )


def paraphrase_mining(emb_ds, *, max_pairs: int = 500_000,
                      query_chunk_top_k: int = 100,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      concurrency=4, mode: str = "auto",
                      broadcast_limit: int = 200_000,
                      n_planes: int = 10, n_bands: int = 4, seed: int = 7):
    """All-pairs near-dup mining with a global pair budget (SURVEY.md §2.7
    D3): the reference's ``paraphrase_mining_embeddings`` — chunked
    all-pairs top-k pushed through a bounded ``PriorityQueue(max_pairs)``
    (/root/reference/biencoder/nli_msmarco/sentence-transformers/
    sentence_transformers/util.py:129-189).

    Two Ray shapes, routed by ``mode`` ("auto" switches on row count vs
    ``broadcast_limit``):

    - **broadcast** (exact): the normalized matrix is broadcast once
      (``ray.put``); each batch is a "query chunk" emitting its per-row
      top-k partner pairs; the bounded queue is ``sort(sim desc)
      .limit(max_pairs)`` — never materializes more than chunk x top_k
      pairs per task.
    - **lsh** (scale path, approximate): candidate pairs from ``n_bands``
      independent random-hyperplane sign buckets (multi-band probing for
      recall), exact cosine re-scored via a hash-join of the pair list
      against the vectors — nothing corpus-sized ever reaches the driver
      or the object store whole.

    Returns a Dataset (a, b, sim) sorted by sim desc.
    """
    import ray

    if mode == "auto":
        mode = "broadcast" if emb_ds.count() <= broadcast_limit else "lsh"
    if mode == "lsh":
        return _paraphrase_mining_lsh(
            emb_ds, max_pairs=max_pairs, id_col=id_col, vec_col=vec_col,
            n_planes=n_planes, n_bands=n_bands, seed=seed,
        )

    # broadcast side assembled from Arrow batch stacks (bounded by the
    # <= broadcast_limit gate above) — no driver pandas frame, no
    # per-row tolist
    id_chunks, vec_chunks = [], []
    for b in emb_ds.iter_batches(batch_format="pyarrow"):
        id_chunks.append(b.column(id_col).to_numpy().astype(np.int64))
        vec_chunks.append(_batch_vecs(b, vec_col))
    ids_all = np.concatenate(id_chunks)
    mat = _normalize(np.concatenate(vec_chunks).astype(np.float64))
    ref = ray.put({"ids": ids_all, "mat": mat})

    def mine(batch: pa.Table) -> pa.Table:
        side = ray.get(ref)  # numpy payload: zero-copy from object store
        all_ids, all_mat = side["ids"], side["mat"]
        q_ids = batch.column(id_col).to_numpy().astype(np.int64)
        q = _normalize(_batch_vecs(batch, vec_col))
        sims = q @ all_mat.T  # (chunk, n)
        k = min(query_chunk_top_k + 1, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        # flat vectorized pair-emit, row-major like the reference's
        # per-row loop; both sides may emit (reference: added_pairs set
        # over sorted (i, j)) — exact_pair_dedup collapses duplicates
        qi = np.repeat(q_ids, k)
        other = all_ids[idx.reshape(-1)]
        s = np.take_along_axis(sims, idx, axis=1).reshape(-1)
        keep = other != qi  # self-pairs out
        a = np.minimum(qi, other)[keep]
        b = np.maximum(qi, other)[keep]
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
             "sim": pa.array(s[keep], pa.float64())}
        )

    pairs = emb_ds.map_batches(
        mine, batch_format="pyarrow", concurrency=concurrency
    )
    from webindex.dedup import exact_pair_dedup

    uniq = exact_pair_dedup(pairs)
    return uniq.sort(["sim", "a", "b"], descending=[True, False, False]).limit(
        max_pairs
    )


def _paraphrase_mining_lsh(emb_ds, *, max_pairs: int, id_col: str,
                           vec_col: str, n_planes: int, n_bands: int,
                           seed: int):
    """LSH-bucketed candidate generation + joined exact re-score (the
    above-broadcast-size path of :func:`paraphrase_mining`)."""
    from webindex.dedup import attach_pair_payloads, pairs_from_buckets

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = _normalize(_batch_vecs(batch, vec_col))
        ids = batch.column(id_col)
        bids, keys, dids = [], [], []
        for band in range(n_bands):
            rng = np.random.default_rng(seed + band)
            planes = rng.standard_normal((vecs.shape[1], n_planes))
            signs = (vecs @ planes) > 0
            k = (signs * (1 << np.arange(n_planes))).sum(axis=1)
            bids.append(np.full(len(k), band, np.int32))
            keys.append(k.astype(np.int64))
            dids.append(ids)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(bids), pa.int32()),
                "band_hash": pa.array(np.concatenate(keys), pa.int64()),
                "doc_id": pa.concat_arrays(
                    [d.combine_chunks() for d in dids]
                ),
            }
        )

    buckets = emb_ds.map_batches(bucket, batch_format="pyarrow")
    pairs_ds = pairs_from_buckets(buckets, ["band_id", "band_hash"])

    def to_blob(batch: pa.Table) -> pa.Table:
        mat = _batch_vecs(batch, vec_col)
        blobs = [mat[i].tobytes() for i in range(mat.shape[0])]
        return pa.table(
            {id_col: batch.column(id_col),
             "vecblob": pa.array(blobs, pa.binary())}
        )

    blob_ds = emb_ds.map_batches(to_blob, batch_format="pyarrow")
    withpay = attach_pair_payloads(pairs_ds, blob_ds, ["vecblob"],
                                   id_col=id_col,
                                   payload_types={"vecblob": pa.binary()})

    def _blob_matrix(col: "pa.ChunkedArray") -> np.ndarray:
        # zero-copy: uniform-width binary values are one flat buffer —
        # reshape instead of a per-row frombuffer loop
        arr = col.combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], np.int32)[
            arr.offset: arr.offset + len(arr) + 1
        ].astype(np.int64)
        widths = np.diff(offs)
        if widths.size and (widths == widths[0]).all() and widths[0] % 8 == 0:
            flat = np.frombuffer(arr.buffers()[2], np.uint8)
            flat = flat[offs[0]: offs[-1]]
            return flat.view(np.float64).reshape(len(arr), widths[0] // 8)
        return np.stack(
            [np.frombuffer(x, np.float64) for x in arr.to_pylist()]
        )

    def rescore(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        va = _normalize(_blob_matrix(batch.column("vecblob_a")))
        vb = _normalize(_blob_matrix(batch.column("vecblob_b")))
        sim = np.einsum("ij,ij->i", va, vb)
        return pa.table(
            {"a": batch.column("a"), "b": batch.column("b"),
             "sim": pa.array(sim, pa.float64())}
        )

    scored = withpay.map_batches(rescore, batch_format="pyarrow")
    return scored.sort(
        ["sim", "a", "b"], descending=[True, False, False]
    ).limit(max_pairs)


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant
# ---------------------------------------------------------------------------


def kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 10,
               seed: int = 11) -> np.ndarray:
    """Deterministic Lloyd's k-means on a (normalized) sample — driver-side
    on a bounded sample only; the full dataset is never materialized."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    init = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    cent = x[init].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cent[c] = m / nrm
    return cent


def ivf_assign(emb_ds, cents: np.ndarray, *, vec_col: str = "embedding",
               round6: bool = False):
    """Add a ``centroid`` column: nearest (cosine) coarse centroid per row.

    Ties take the lowest centroid index (``np.argmax`` keeps the first
    maximum), matching the SQL oracle's ``ORDER BY sim DESC, cid`` rule.
    ``round6=True`` rounds the assignment cosines to 6dp BEFORE the
    argmax (the repo's rounded-threshold portability rule) so a near-tie
    between two centroids resolves identically in the engine and a SQL
    oracle that rounds in its ORDER BY — semdedup uses this.
    Centroids are tiny -> stateless task closure (no actor reservation);
    a big centroid table would go through ``ray.put`` + actor ``__init__``.
    """

    def assign(batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_vecs(batch, vec_col))
        sims = mat @ cents.T
        if round6:
            sims = np.round(sims, 6)
        a = np.argmax(sims, axis=1).astype(np.int32)
        return batch.append_column("centroid", pa.array(a, pa.int32()))

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def ivf_build(emb_ds, *, n_centroids: int = 16, sample_n: int = 2048,
              id_col: str = "vec_id", vec_col: str = "embedding",
              seed: int = 11):
    """Train centroids on a sample, assign every vector -> (Dataset + cents).

    Returns ``(assigned_ds, centroids)`` where ``assigned_ds`` adds a
    ``centroid`` column — at scale this would be written as
    partition_cols=["centroid"] parquet so probes read only their lists.
    """
    sample = emb_ds.limit(sample_n).to_pandas()
    cents = kmeans_fit(
        np.array(sample[vec_col].tolist(), dtype=np.float64), n_centroids,
        seed=seed,
    )
    return ivf_assign(emb_ds, cents, vec_col=vec_col), cents


def seed_centroids(emb_ds, n_centroids: int, *, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> np.ndarray:
    """Deterministic, SQL-expressible coarse centroids: the (normalized)
    vectors of the ``n_centroids`` smallest ids, centroid index = ascending
    id order. No k-means iterations — this is the variant a DuckDB oracle
    can reproduce exactly (``ORDER BY vec_id LIMIT k``), trading cluster
    balance for end-to-end verifiability.

    Scale shape: each batch emits only its ``k`` smallest-id rows, so the
    final sort+limit sees k x n_blocks rows, never the corpus.
    """

    def partial_min_k(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        k = min(n_centroids, len(ids))
        sel = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, vec_col]).take(pa.array(sel))

    small = (
        emb_ds.map_batches(partial_min_k, batch_format="pyarrow")
        .sort(id_col)
        .limit(n_centroids)
    )
    pdf = small.to_pandas()
    return _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))


def _probe_plan(cents: np.ndarray, query_ids, query_vecs, nprobe: int,
                round6: bool = False):
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    # stable sort: equal-similarity centroids probe lowest-index first,
    # matching the SQL oracle's ORDER BY sim DESC, cid tie-break;
    # round6 compares 6dp-rounded similarities (the portability rule)
    sims = qmat @ cents.T
    if round6:
        sims = np.round(sims, 6)
    probes = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    probe_set = sorted({int(c) for row in probes for c in row})
    allowed = {int(q): {int(c) for c in probes[i]}
               for i, q in enumerate(query_ids)}
    return qmat, probe_set, allowed


def ivf_topk(assigned_ds, cents: np.ndarray, query_ids: list[int],
             query_vecs: np.ndarray, k: int, *, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency=4):
    """Probe the ``nprobe`` nearest centroid partitions per query."""
    import pyarrow.compute as pc

    qmat, probe_set, allowed = _probe_plan(
        cents, query_ids, query_vecs, nprobe
    )
    # queries grouped by probed centroid -> prune the scan per centroid set
    pruned = assigned_ds.map_batches(
        lambda t, cs=probe_set: t.filter(pc.is_in(t.column("centroid"),
                                                  pa.array(cs, pa.int32()))),
        batch_format="pyarrow",
    )
    # per-query candidate filter happens at merge: a vec counts for query q
    # only if its centroid is among q's probes
    qids = list(query_ids)
    score = _ivf_score_factory(qmat, qids, allowed, k, id_col, vec_col)
    partial = pruned.map_batches(score, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )


def _ivf_score_factory(qmat, qids, allowed, k, id_col, vec_col):
    def score(batch: pa.Table) -> pa.Table:
        cents_b = batch.column("centroid").to_numpy()
        vids = batch.column(id_col).to_numpy()
        mat = _normalize(_batch_vecs(batch, vec_col))
        sims = qmat @ mat.T
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.fromiter(
                (int(c) in allowed[int(qid)] for c in cents_b),
                dtype=bool, count=len(cents_b),
            )
            if not mask.any():
                continue
            s = sims[qi][mask]
            v = vids[mask]
            kk = min(k, s.size)
            sel = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qid] * kk)
            out_v.extend(v[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return score


def ivf_write(assigned_ds, cents: np.ndarray, out_dir: str) -> None:
    """Persist an IVF index as centroid-partitioned parquet.

    One directory per coarse centroid (``centroid=<c>/``) so queries read
    ONLY their probed partitions from storage — the pruning happens at the
    read, not as a post-read filter. Centroids go to a small sidecar.
    """
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    assigned_ds.write_parquet(out_dir, partition_cols=["centroid"])
    with open(os.path.join(out_dir, "centroids.json"), "w") as f:
        json.dump(cents.tolist(), f)


def ivf_topk_store(index_dir: str, query_ids: list[int],
                   query_vecs: np.ndarray, k: int, *, nprobe: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Query a written IVF store, scanning only the probed partitions.

    Reads ``centroid=<c>/`` directories for the union of the queries'
    probes — unprobed partitions are never opened (see
    tests/test_ann.py::test_ivf_store_scans_only_probed_partitions).
    """
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "centroids.json")) as f:
        cents = np.asarray(json.load(f), dtype=np.float64)
    qmat, probe_set, allowed = _probe_plan(
        cents, query_ids, query_vecs, nprobe
    )
    parts = []
    for c in probe_set:
        pdir = os.path.join(index_dir, f"centroid={c}")
        if not os.path.isdir(pdir):
            continue
        # hive partition inference restores the centroid column (string);
        # normalize it to int32 for the shared score stage
        part = rd.read_parquet(pdir).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("centroid"),
                "centroid",
                t.column("centroid").cast(pa.string()).cast(pa.int32()),
            ),
            batch_format="pyarrow",
        )
        parts.append(part)
    if not parts:
        return rd.from_arrow(
            pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})
        )
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    score = _ivf_score_factory(
        qmat, list(query_ids), allowed, k, id_col, vec_col
    )
    partial = ds.map_batches(score, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-vector ANN for the 100x scale path
# ---------------------------------------------------------------------------


def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 10,
               seed: int = 13) -> np.ndarray:
    """Deterministic plain-L2 Lloyd's k-means (no normalization —
    subvector codebooks live in raw coordinate space)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(sample, dtype=np.float64)
    init = rng.choice(len(x), size=min(k, len(x)), replace=False)
    cent = x[init].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)  # ties -> lowest code
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train(emb_ds, *, m_subs: int = 8, n_codes: int = 16,
             sample_n: int = 2048, iters: int = 10, seed: int = 13,
             vec_col: str = "embedding") -> np.ndarray:
    """Train product-quantization codebooks (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search", public paper) on a bounded
    sample: vectors are L2-normalized (the module's cosine space), split
    into ``m_subs`` contiguous subvectors, and each subspace gets its own
    ``n_codes``-centroid L2 k-means codebook. Returns
    ``(m_subs, n_codes, d/m_subs)`` float64.

    Only the ``sample_n`` sample reaches the driver — the codebook is a
    few KB regardless of corpus size (the point: a 64-dim float64 vector
    becomes ``m_subs`` uint8 codes, a 64x memory cut at 100x scale)."""
    sample = emb_ds.limit(sample_n).to_pandas()
    mat = _normalize(np.array(sample[vec_col].tolist(), dtype=np.float64))
    d = mat.shape[1]
    if d % m_subs:
        raise ValueError(f"dim {d} not divisible by m_subs {m_subs}")
    dsub = d // m_subs
    books = np.empty((m_subs, n_codes, dsub), dtype=np.float64)
    for j in range(m_subs):
        sub = mat[:, j * dsub: (j + 1) * dsub]
        cb = _kmeans_l2(sub, n_codes, iters=iters, seed=seed + j)
        if cb.shape[0] < n_codes:  # tiny sample: pad by repeating
            cb = np.vstack([cb] * (n_codes // cb.shape[0] + 1))[:n_codes]
        books[j] = cb
    return books


def pq_seed_books(emb_ds, *, m_subs: int = 8, n_codes: int = 32,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> np.ndarray:
    """Deterministic, SQL-expressible PQ codebooks: subspace slices of
    the (normalized) ``n_codes`` smallest-id vectors — the
    :func:`seed_centroids` rule applied per subspace, trading codebook
    quality for end-to-end DuckDB verifiability (the ``ivf_seed_top5``
    precedent extended to product quantization). Code index = ascending
    id order. Returns ``(m_subs, n_codes, d/m_subs)`` float64."""
    cents = seed_centroids(emb_ds, n_codes, id_col=id_col, vec_col=vec_col)
    d = cents.shape[1]
    if d % m_subs:
        raise ValueError(f"dim {d} not divisible by m_subs {m_subs}")
    dsub = d // m_subs
    return np.ascontiguousarray(
        cents.reshape(n_codes, m_subs, dsub).swapaxes(0, 1)
    )


def pq_encode(emb_ds, codebooks: np.ndarray, *, id_col: str = "vec_id",
              vec_col: str = "embedding", round6: bool = False):
    """Vectors -> ``(id, pq_code list<uint8>)``: nearest codebook entry
    per subspace (L2, ties -> lowest code). Stateless ``map_batches`` —
    the codebook rides the task closure (a few KB); at scale the encoded
    table is what you store and scan.

    ``round6``: the argmin compares the 6dp-ROUNDED reduced distance
    ``-2 x.c + ||c||^2`` so a DuckDB oracle computing the same
    expression reproduces every code exactly (near-ties resolve to the
    lowest code on both engines — the rounded-threshold rule)."""
    m_subs, n_codes, dsub = codebooks.shape

    def encode(batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_vecs(batch, vec_col))
        n = mat.shape[0]
        codes = np.empty((n, m_subs), dtype=np.uint8)
        for j in range(m_subs):
            sub = mat[:, j * dsub: (j + 1) * dsub]
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
            d2 = (
                -2.0 * (sub @ codebooks[j].T)
                + (codebooks[j] ** 2).sum(axis=1)[None, :]
            )
            if round6:
                d2 = np.round(d2, 6)
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "pq_code": pa.array(
                    codes.tolist(), pa.list_(pa.uint8(), m_subs)
                ),
            }
        )

    return emb_ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(codes_ds, codebooks: np.ndarray, query_ids: list[int],
            query_vecs: np.ndarray, k: int, *, id_col: str = "vec_id",
            concurrency=4, batch_size: int = 4096, round6: bool = False):
    """Asymmetric-distance (ADC) top-k over PQ codes: per query one
    (m_subs x n_codes) inner-product lookup table against the RAW query
    subvectors; each batch scores as ``sum_j LUT[j, code_j]`` (two numpy
    takes, no decode) -> per-batch partial top-k -> exact k-merge (same
    shape as :func:`brute_topk`). Approximate by construction (codebook
    resolution), deterministic given the seeded codebooks.

    Returns (query_id, vec_id, sim, rank) with ``sim`` the ADC cosine
    approximation."""
    import ray

    m_subs, n_codes, dsub = codebooks.shape
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    # LUT[q, j, c] = <q_subj, codebook[j, c]>
    lut = np.einsum(
        "qjd,jcd->qjc", q.reshape(len(q), m_subs, dsub), codebooks
    )
    ref = ray.put({"qids": np.asarray(list(query_ids), dtype=np.int64),
                   "lut": lut})

    def score(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        qids_np, lut_b = s["qids"], s["lut"]
        col = batch.column("pq_code")
        codes = (
            col.combine_chunks().values.to_numpy(zero_copy_only=False)
            .reshape(batch.num_rows, m_subs).astype(np.int64)
        )
        ids = batch.column(id_col).to_numpy()
        out_q, out_i, out_s = [], [], []
        cols = np.arange(m_subs)
        for qi in range(len(qids_np)):
            sims = lut_b[qi][cols[None, :], codes].sum(axis=1)
            if round6:
                # ranking (and the k-merge downstream) keys on the
                # 6dp-rounded ADC sum, engine-portable vs a SQL SUM
                # whose float addition order differs by ~1 ulp
                sims = np.round(sims, 6)
            kk = min(k, sims.size)
            # partial top-k with (sim desc, id asc) tie order
            sel = np.lexsort((ids, -sims))[:kk]
            out_q.append(np.full(kk, qids_np[qi]))
            out_i.append(ids[sel])
            out_s.append(sims[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_i), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = codes_ds.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )


def ivfpq_build(emb_ds, *, n_centroids: int = 16, m_subs: int = 8,
                n_codes: int = 16, sample_n: int = 2048, iters: int = 10,
                seed: int = 13, id_col: str = "vec_id",
                vec_col: str = "embedding"):
    """IVF-PQ (the FAISS IVFADC layout, Jegou et al. 2011): coarse
    cosine centroids route queries to ``nprobe`` partitions; within a
    partition vectors exist ONLY as ``m_subs`` uint8 PQ codes — the
    combination that makes 100x-scale ANN fit in memory AND skip most of
    the corpus per query. Returns ``(codes_ds, cents, books)`` where
    ``codes_ds`` is (id, centroid, pq_code); at scale it is written
    ``partition_cols=["centroid"]`` (see :func:`ivf_write`) so probes
    read only their lists. One pass over the corpus encodes both."""
    sample = emb_ds.limit(sample_n).to_pandas()
    smat = _normalize(np.array(sample[vec_col].tolist(), dtype=np.float64))
    cents = kmeans_fit(smat, n_centroids, iters=iters, seed=seed)
    books = pq_train(
        emb_ds, m_subs=m_subs, n_codes=n_codes, sample_n=sample_n,
        iters=iters, seed=seed, vec_col=vec_col,
    )
    m, nc, dsub = books.shape

    def encode(batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_vecs(batch, vec_col))
        assign = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
        n = mat.shape[0]
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub: (j + 1) * dsub]
            d2 = (
                -2.0 * (sub @ books[j].T)
                + (books[j] ** 2).sum(axis=1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "centroid": pa.array(assign),
                "pq_code": pa.array(
                    codes.tolist(), pa.list_(pa.uint8(), m)
                ),
            }
        )

    return emb_ds.map_batches(encode, batch_format="pyarrow"), cents, books


def ivfpq_seed_build(emb_ds, *, n_centroids: int = 8, m_subs: int = 8,
                     n_codes: int = 32, id_col: str = "vec_id",
                     vec_col: str = "embedding"):
    """IVF-PQ with fully seeded, SQL-expressible parameters: coarse
    centroids = :func:`seed_centroids`, codebooks = :func:`pq_seed_books`,
    assignment + encoding on 6dp-rounded keys — every build artifact a
    DuckDB oracle can reproduce bit for bit (the ``ivf_seed_top5``
    precedent extended to the full IVFADC layout). Returns
    ``(codes_ds, cents, books)`` with codes_ds = (id, centroid, pq_code);
    the same one-pass scale shape as :func:`ivfpq_build`."""
    cents = seed_centroids(emb_ds, n_centroids, id_col=id_col,
                           vec_col=vec_col)
    books = pq_seed_books(emb_ds, m_subs=m_subs, n_codes=n_codes,
                          id_col=id_col, vec_col=vec_col)
    m, nc, dsub = books.shape

    def encode(batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_vecs(batch, vec_col))
        assign = np.argmax(
            np.round(mat @ cents.T, 6), axis=1
        ).astype(np.int32)
        n = mat.shape[0]
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub: (j + 1) * dsub]
            d2 = np.round(
                -2.0 * (sub @ books[j].T)
                + (books[j] ** 2).sum(axis=1)[None, :], 6,
            )
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "centroid": pa.array(assign),
                "pq_code": pa.array(
                    codes.tolist(), pa.list_(pa.uint8(), m)
                ),
            }
        )

    return emb_ds.map_batches(encode, batch_format="pyarrow"), cents, books


def ivfpq_topk(codes_ds, cents: np.ndarray, books: np.ndarray,
               query_ids: list[int], query_vecs: np.ndarray, k: int, *,
               nprobe: int = 4, id_col: str = "vec_id",
               concurrency=4, batch_size: int = 4096,
               round6: bool = False):
    """IVF-PQ query: probe the ``nprobe`` nearest coarse centroids per
    query, ADC-score ONLY rows in probed partitions (lookup-table sums
    over uint8 codes, no decode), exact k-merge. Doubly approximate
    (probe recall x codebook resolution), deterministic given the seeded
    build. Returns (query_id, vec_id, sim, rank)."""
    import pyarrow.compute as pc
    import ray

    m, nc, dsub = books.shape
    qmat, probe_set, allowed = _probe_plan(
        cents, query_ids, query_vecs, nprobe, round6=round6
    )
    lut = np.einsum(
        "qjd,jcd->qjc", qmat.reshape(len(qmat), m, dsub), books
    )
    qids = [int(q) for q in query_ids]
    ref = ray.put({"lut": lut, "allowed": allowed})

    pruned = codes_ds.map_batches(
        lambda t, cs=probe_set: t.filter(
            pc.is_in(t.column("centroid"), pa.array(cs, pa.int32()))
        ),
        batch_format="pyarrow",
    )

    def score(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        lut_b, allowed_b = s["lut"], s["allowed"]
        cents_b = batch.column("centroid").to_numpy()
        ids = batch.column(id_col).to_numpy()
        col = batch.column("pq_code")
        codes = (
            col.combine_chunks().values.to_numpy(zero_copy_only=False)
            .reshape(batch.num_rows, m).astype(np.int64)
        )
        cols = np.arange(m)
        out_q, out_i, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.fromiter(
                (int(c) in allowed_b[qid] for c in cents_b),
                dtype=bool, count=len(cents_b),
            )
            if not mask.any():
                continue
            sims = lut_b[qi][cols[None, :], codes[mask]].sum(axis=1)
            if round6:
                sims = np.round(sims, 6)  # portable rank key (pq_topk)
            v = ids[mask]
            kk = min(k, sims.size)
            sel = np.lexsort((v, -sims))[:kk]
            out_q.append(np.full(kk, qid))
            out_i.append(v[sel])
            out_s.append(sims[sel])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 id_col: pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_i), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = pruned.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )


def sq8_train(emb_ds, *, vec_col: str = "embedding") -> dict:
    """Scalar-quantization params for int8 vector compression (the ES
    ``dense_vector`` ``int8`` quantization direction): EXACT global
    per-dimension (min, max) of the L2-NORMALIZED vectors — min/max are
    order-free, so the params are partition-independent. One streaming
    pass; only per-batch (lo, hi) vector pairs leave the workers.
    Returns ``{"lo": (d,), "hi": (d,)}`` float64."""
    def mm(batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_vecs(batch, vec_col))
        if mat.shape[0] == 0:
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        return pa.table(
            {
                "lo": pa.array([mat.min(axis=0).tolist()]),
                "hi": pa.array([mat.max(axis=0).tolist()]),
            }
        )

    parts = emb_ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    lo = np.min(np.array(parts["lo"].tolist(), np.float64), axis=0)
    hi = np.max(np.array(parts["hi"].tolist(), np.float64), axis=0)
    return {"lo": lo, "hi": hi}


def _sq8_scale(params: dict) -> tuple[np.ndarray, np.ndarray]:
    lo = np.asarray(params["lo"], np.float64)
    span = np.asarray(params["hi"], np.float64) - lo
    return lo, span


def sq8_encode(emb_ds, params: dict, *, id_col: str = "vec_id",
               vec_col: str = "embedding"):
    """Normalized vectors -> ``(id, sq8_code list<uint8, d>)``:
    ``code = floor((v − lo) / span · 255 + 0.5)`` clipped to [0, 255]
    (floor(x + 0.5) is the one rounding both engines agree on for
    non-negative x; numpy round() is half-even, SQL round() half-away —
    measured divergence class). Zero-span dimensions encode 0. An 8x
    memory cut over float64 — the piece that keeps a 100x-scale
    embedding table resident."""
    lo, span = _sq8_scale(params)
    safe = np.where(span > 0, span, 1.0)

    def encode(batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_vecs(batch, vec_col))
        x = (mat - lo) / safe * 255.0
        codes = np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)
        codes[:, span <= 0] = 0
        return pa.table(
            {
                id_col: batch.column(id_col),
                "sq8_code": pa.array(
                    codes.tolist(), pa.list_(pa.uint8(), codes.shape[1])
                ),
            }
        )

    return emb_ds.map_batches(encode, batch_format="pyarrow")


def sq8_topk(codes_ds, emb_ds, params: dict, query_ids: list[int],
             query_vecs: np.ndarray, k: int, *, oversample: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency=4, batch_size: int = 4096):
    """Quantized-scan + exact-rescore top-k (the ES int8 dense_vector
    query path): the uint8 code table is scanned for approximate sims
    ``q · (lo + code · span/255)`` (decoded vectors, NOT re-normalized —
    pinned), the global top ``k · oversample`` candidates per query
    survive, and ONLY those rows are re-scored with exact cosine against
    the float table (broadcast candidate-id semi-join — rescore cost is
    queries x k x oversample rows, never the corpus).

    Returns ``(query_id, vec_id, sim, rank)`` with EXACT sims: the
    quantization affects recall only, never the correctness of returned
    scores — tests gate recall and rescore exactness separately."""
    import ray

    lo, span = _sq8_scale(params)
    step = span / 255.0
    qmat = _normalize(np.asarray(query_vecs, np.float64))
    ref = ray.put({"qids": list(query_ids), "qmat": qmat,
                   "lo": lo, "step": step})
    kk = k * oversample

    def approx(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        vids = batch.column(id_col).to_numpy()
        codes = np.array(
            batch.column("sq8_code").to_pylist(), dtype=np.float64
        )
        dec = st["lo"] + codes * st["step"]
        sims = st["qmat"] @ dec.T
        kb = min(kk, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        if kb:
            kth = -np.partition(-sims, kb - 1, axis=1)[:, kb - 1]
            for qi, qid in enumerate(st["qids"]):
                sel = np.flatnonzero(sims[qi] >= kth[qi])
                out_q.extend([qid] * sel.size)
                out_v.extend(vids[sel].tolist())
                out_s.extend(sims[qi, sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "asim": pa.array(out_s, pa.float64()),
            }
        )

    def cand_merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["asim", "vec_id"], ascending=[False, True]
        ).head(kk)
        return g[["query_id", "vec_id"]]

    cands = (
        codes_ds.map_batches(approx, batch_format="pyarrow",
                             batch_size=batch_size,
                             concurrency=concurrency)
        .groupby("query_id")
        .map_groups(cand_merge, batch_format="pandas")
        .to_pandas()  # queries x k x oversample rows — broadcast-sized
    )
    by_vec: dict[int, list[int]] = {}
    for qid, vid in zip(cands["query_id"], cands["vec_id"]):
        by_vec.setdefault(int(vid), []).append(int(qid))
    cref = ray.put({"by_vec": by_vec, "qids": list(query_ids),
                    "qmat": qmat})

    def rescore(batch: pa.Table) -> pa.Table:
        st = ray.get(cref)
        vids = batch.column(id_col).to_numpy()
        keep = np.array([int(v) in st["by_vec"] for v in vids], bool)
        if not keep.any():
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        sub = batch.filter(pa.array(keep))
        svids = sub.column(id_col).to_numpy()
        mat = _normalize(_batch_vecs(sub, vec_col))
        sims = st["qmat"] @ mat.T
        qpos = {q: i for i, q in enumerate(st["qids"])}
        out_q, out_v, out_s = [], [], []
        for ci, vid in enumerate(svids):
            for qid in st["by_vec"][int(vid)]:
                out_q.append(qid)
                out_v.append(int(vid))
                out_s.append(float(sims[qpos[qid], ci]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return (
        emb_ds.map_batches(rescore, batch_format="pyarrow",
                           batch_size=batch_size)
        .groupby("query_id")
        .map_groups(_merge_topk_factory(k), batch_format="pandas")
    )


def semdedup(emb_ds, *, n_clusters: int = 8, eps: float = 0.93,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    clustering embeddings, then thresholded pairwise cosine WITHIN each
    cluster — the clustering bounds the quadratic term, which is the
    whole point of the method at corpus scale (pairwise over a cluster,
    never over the corpus).

    Pinned spec (replayed exactly by the DuckDB oracle):
    - coarse clusters = :func:`seed_centroids` (n smallest-id vectors)
      + :func:`ivf_assign` argmax-cosine assignment, ties -> lowest
      centroid index;
    - within a cluster, rows order by (cent_sim ASC, id ASC) — SemDeDup
      keeps the LOW-centroid-similarity representative (paper §3);
    - row i is a duplicate iff some EARLIER row j has cos(i, j) > eps
      (the paper's upper-triangular implementation: suppression does
      not consult whether j itself was dropped, so there is no
      recursion and the rule is one self-join);
    - both the ordering key and the threshold compare 6dp-ROUNDED
      cosines, so the decision boundary is engine-portable (the repo's
      bm25_scores rounding precedent).

    Scale shape: one tiny centroid broadcast, one stateless assignment
    pass, one hash shuffle on ``centroid``, quadratic work only within
    clusters (at 100 TB: n_clusters grows so cluster size stays
    bounded; the paper uses 50k clusters for LAION). Returns
    ``(id, centroid, cent_sim_r, dup)`` for every input row."""
    import pandas as pd

    cents = seed_centroids(emb_ds, n_clusters, id_col=id_col,
                           vec_col=vec_col)
    assigned = ivf_assign(emb_ds, cents, vec_col=vec_col, round6=True)

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        c = int(g["centroid"].iloc[0])
        ids = g[id_col].to_numpy(np.int64)
        mat = _normalize(np.array(g[vec_col].tolist(), dtype=np.float64))
        cs = np.round(mat @ cents[c], 6)
        order = np.lexsort((ids, cs))  # cent_sim asc, id asc
        m, oids, ocs = mat[order], ids[order], cs[order]
        sims = np.round(m @ m.T, 6)
        n = oids.size
        dup = np.zeros(n, dtype=np.int64)
        if n > 1:
            tri = np.tril(np.ones((n, n), dtype=bool), k=-1).T  # j < i
            masked = np.where(tri, sims, -np.inf)
            dup = (masked.max(axis=0) > eps).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: oids,
                "centroid": np.full(n, c, dtype=np.int64),
                "cent_sim_r": ocs,
                "dup": dup,
            }
        )

    return assigned.groupby("centroid").map_groups(
        per_cluster, batch_format="pandas"
    )
