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
from collections import Counter
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


# SQL-expressible base hash (the "poly" variant): polynomial over the
# string's code points mod the Mersenne prime — bit-identical to DuckDB's
#   list_reduce(list_prepend(0::HUGEINT,
#     list_transform(regexp_extract_all(s, '.'), x -> ascii(x)::HUGEINT)),
#     (acc, x) -> (acc * 1000003 + x) % (2^61-1))
# so minhash/simhash signatures become DuckDB-oracle-checkable end to end.
_POLY_B = 1000003
_ASCII_WORD_RE = re.compile(r"[a-z0-9]+")


def _poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * _POLY_B + ord(ch)) % _MERSENNE
    return h


def _grams(toks: list[str], k: int) -> list[str]:
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i: i + k]) for i in range(len(toks) - k + 1)]


def _shingle_hashes(text: str, k: int,
                    base_hash: str = "blake2b") -> np.ndarray:
    """Distinct word-k-gram 61-bit hashes. ``base_hash="poly"`` switches
    to the SQL-expressible polynomial hash over ASCII tokens (tokens via
    ``[a-z0-9]+`` on the lowercased text, matching the SQL oracle's
    regexp)."""
    if base_hash == "poly":
        grams = _grams(_ASCII_WORD_RE.findall((text or "").lower()), k)
        if not grams:
            return np.empty(0, dtype=np.uint64)
        return np.fromiter(
            (_poly_hash(g) for g in set(grams)), dtype=np.uint64
        )
    toks = _WORD_RE.findall(text.lower())
    grams = _grams(toks, k)
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

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, seed: int = 1,
                 base_hash: str = "blake2b"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.base_hash = base_hash

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k, self.base_hash)
        if sh.size == 0:
            return np.full(self.num_perm, _MAX_HASH, dtype=np.uint64)
        return _mod_p_mul_add(sh, self.a, self.b).min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # per-doc permutation math is the MEASURED fastest shape on this
        # host: a doc's (shingles x 128) temps stay L2-resident, while
        # concatenating docs into bigger chunks (tried 512-16k shingle
        # chunks, minimum.reduceat mins) pushed _mod_p_mul_add's temp
        # matrices out of cache and ran 1.2-2x SLOWER end to end
        texts = batch.column("text").to_pylist()
        if texts:
            sigs = np.stack([self.signature(t or "") for t in texts])
        else:
            sigs = np.zeros((0, self.num_perm), np.uint64)
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).astype(np.int64), pa.int64()),
            self.num_perm,
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "sig": sig_arr}
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


def exact_dedup(ds, text_col: str = "text", n_parts: int = 64):
    """Keep the min-doc_id row per exact text; one hash-partition shuffle.

    text_hash is row-cardinality (mostly-unique texts), so this routes
    through a pinned hash partitioning with ONE vectorized keep-first
    per partition — never Ray's native per-key groupby, which at key
    cardinality near the row count measures ~50x slower (CLAUDE.md
    rule; same shape as exact_pair_dedup)."""

    def add_part(batch: pa.Table) -> pa.Table:
        batch = add_text_hash(batch, text_col)
        from .relational import _int_key_u64
        h = _int_key_u64(batch.column("text_hash"), "text_hash")
        part = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(n_parts)
        return batch.append_column(
            "_part", pa.array(part.astype(np.int32))
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_hash", "doc_id"], kind="mergesort")
        g = g[~g["text_hash"].duplicated()]
        return g.drop(columns=["text_hash", "_part"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(keep_first, batch_format="pandas")
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
        g = g.drop(columns=["part2"])
        if set(g.columns) == {"a", "b", "truncated"}:
            # OR the diagnostic flag across duplicate pairs (first-wins
            # would depend on block arrival order)
            return g.groupby(["a", "b"], as_index=False, sort=False)[
                "truncated"
            ].max()
        return g.drop_duplicates(["a", "b"])

    parts = pairs_ds.map_batches(add_part, batch_format="pyarrow")
    return parts.groupby("part2").map_groups(dedup, batch_format="pandas")


def count_truncated_pairs(pairs_ds) -> int:
    """Candidate pairs that touched a ``> max_bucket`` bucket —
    per-batch partial sums reduced distributed; only the final scalar
    reaches the driver (the old iter_batches walk streamed every block
    through the driver sequentially)."""
    import pyarrow.compute as pc

    def psum(b: pa.Table) -> pa.Table:
        s = pc.sum(b.column("truncated")).as_py() or 0
        return pa.table({"n": pa.array([int(s)], pa.int64())})

    out = pairs_ds.select_columns(["truncated"]).map_batches(
        psum, batch_format="pyarrow"
    ).sum("n")
    return int(out or 0)


def _warn_truncated(pairs_ds, op: str) -> None:
    """Surface bucket truncation to the caller: pairs whose ONLY shared
    bucket was truncated are silently absent from the candidate set, so a
    nonzero count means candidate generation was not complete."""
    import warnings

    n = count_truncated_pairs(pairs_ds)
    if n:
        warnings.warn(
            f"{op}: {n} candidate pairs touch buckets truncated at "
            f"max_bucket; pairs sharing ONLY truncated buckets are "
            f"missing — raise max_bucket for complete candidates",
            stacklevel=3,
        )


_MIX64 = np.uint64(0x9E3779B97F4A7C15)


def _arrow_schema(ds) -> pa.Schema:
    """Dataset schema as pyarrow (pandas-block datasets report numpy dtypes)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
        elif np.dtype(t) == np.dtype(object):
            fields.append(pa.field(n, pa.string()))
        else:
            fields.append(pa.field(n, pa.from_numpy_dtype(np.dtype(t))))
    return pa.schema(fields)


def attach_pair_payloads(pairs_ds, payload_ds, payload_cols: list[str],
                         id_col: str = "doc_id", num_partitions: int = 32,
                         broadcast_limit: int = 20_000,
                         payload_types: dict | None = None):
    """Hash-join payload columns onto BOTH sides of a candidate pair list.

    (a, b, ...) x (doc_id, c1, c2, ...) -> (a, b, ..., c1_a, c1_b, ...).
    Implemented as union + hash-partitioned groupby + per-partition pandas
    merge (the repo's standard co-location shape) rather than
    ``Dataset.join``: the join operator's aggregator actors deadlock small
    CPU budgets and emit schema-less empty blocks that break chained
    joins. The corpus never materializes on the driver; only the (small,
    LSH-pruned) pair list and the matched payload rows flow. This is the
    CC-scale verify shape the dedup operators use. ``num_partitions`` is
    pinned logical partitioning; results are partition-independent.

    ``payload_types`` ({col: pa.DataType}) lets a caller that built the
    payload itself skip the schema probe: ``Dataset.schema()`` on an
    unexecuted ``map_batches`` chain executes a one-block prefix to learn
    the schema, and that extra execute-then-discard has been observed to
    trip a fatal Ray-core race (``task_manager.cc: Tried to complete task
    that was not pending``) under contention. Callers passing blobs or
    signatures they constructed know the types statically.
    """
    # Route on the TOUCHED-payload size, not the pair count: only pair
    # endpoints (<= 2 x pairs, LSH-pruned — never corpus-sized) are ever
    # matched, and when that set is broadcast-sized the whole attach is
    # a zero-shuffle searchsorted against one shared side table. The
    # per-side shuffle shape costs two SORT exchanges of wide string
    # rows (measured: 68 s vs ~2 s broadcast for 256k pairs / 30k
    # touched docs at 400k-doc scale), so broadcast wins far beyond the
    # old 20k-pairs proxy gate; ``broadcast_limit`` now bounds the
    # endpoint COUNT (the side-table rows actually shipped). The caller
    # has already materialized pairs_ds, so count() is free.
    try:
        n_pairs = pairs_ds.count()
    except Exception:
        n_pairs = None
    need = None
    if n_pairs is not None and n_pairs <= 20_000_000:
        chunks = []
        for b in pairs_ds.select_columns(["a", "b"]).iter_batches(
            batch_format="pyarrow"
        ):
            chunks.append(b.column("a").combine_chunks())
            chunks.append(b.column("b").combine_chunks())
        if chunks:
            need = pa.concat_arrays(chunks).unique()
    if need is not None and len(need) <= max(broadcast_limit, 300_000):
        return _attach_broadcast(
            pairs_ds, payload_ds, payload_cols, id_col, need=need
        )

    if payload_types and all(c in payload_types for c in payload_cols):
        ptypes = {c: payload_types[c] for c in payload_cols}
    else:
        pay_schema = _arrow_schema(payload_ds)
        ptypes = {c: pay_schema.field(c).type for c in payload_cols}

    # Partitioned path (endpoint set too big to broadcast its payload):
    # still pre-filter the payload to touched ids — every other payload
    # row would be shuffled through BOTH per-side joins and matched by
    # neither; at corpus scale that is almost all of them.
    if need is not None:
        import pyarrow.compute as pc
        import ray

        need_ref = ray.put(need)

        def keep_touched(batch: pa.Table, _ref=need_ref) -> pa.Table:
            ids = ray.get(_ref)  # zero-copy broadcast
            return batch.filter(
                pc.is_in(batch.column(id_col).cast(pa.int64()), ids)
            )

        # materialize: both per-side joins consume the filtered
        # payload — without this the corpus scan+filter lineage
        # re-executes per side
        payload_ds = payload_ds.map_batches(
            keep_touched, batch_format="pyarrow"
        ).materialize()

    out = pairs_ds
    for side in ("a", "b"):
        out = _attach_side(
            out, payload_ds, payload_cols, ptypes, id_col, side,
            num_partitions,
        )
    return out


def _attach_broadcast(pairs_ds, payload_ds, payload_cols, id_col,
                      need=None):
    import pyarrow.compute as pc
    import ray

    if need is None:
        # endpoint ids not precomputed by the caller: one bounded driver
        # pass over the (LSH-pruned) pair ids
        chunks = []
        for b in pairs_ds.select_columns(["a", "b"]).iter_batches(
            batch_format="pyarrow"
        ):
            chunks.append(b.column("a").combine_chunks())
            chunks.append(b.column("b").combine_chunks())
        need = (pa.concat_arrays(chunks).unique() if chunks
                else pa.array([], pa.int64()))

    def keep(batch: pa.Table, ids=need) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column(id_col).cast(pa.int64()), ids)
        )

    side_tab = pa.concat_tables(
        list(
            payload_ds.select_columns([id_col] + payload_cols)
            .map_batches(keep, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    # sort ONCE by id before the broadcast — every attach batch would
    # otherwise repeat the O(s log s) argsort of the identical table
    sids = side_tab.column(id_col).to_numpy()
    order = np.argsort(sids, kind="stable")
    side_tab = side_tab.take(pa.array(order, pa.int64()))
    ref = ray.put(side_tab)

    def attach(batch: pa.Table) -> pa.Table:
        side = ray.get(ref)  # zero-copy from the object store
        sorted_ids = side.column(id_col).to_numpy()
        cols = {c: batch.column(c) for c in batch.column_names}
        keep_mask = np.ones(batch.num_rows, dtype=bool)
        sel = {}
        for s in ("a", "b"):
            key = batch.column(s).to_numpy()
            pos = np.searchsorted(sorted_ids, key)
            pos = np.minimum(pos, max(sorted_ids.size - 1, 0))
            hit = (
                sorted_ids[pos] == key
                if sorted_ids.size
                else np.zeros(key.size, dtype=bool)
            )
            keep_mask &= hit
            sel[s] = pos
        out = pa.table(cols).filter(pa.array(keep_mask))
        for s in ("a", "b"):
            take = pa.array(sel[s][keep_mask], pa.int64())
            for c in payload_cols:
                out = out.append_column(
                    f"{c}_{s}", side.column(c).take(take)
                )
        return out

    return pairs_ds.map_batches(attach, batch_format="pyarrow")


def _attach_side(pairs_ds, payload_ds, payload_cols, ptypes, id_col,
                 side, n_parts):
    pair_schema = _arrow_schema(pairs_ds)
    pair_cols = list(pair_schema.names)
    new_cols = [f"{c}_{side}" for c in payload_cols]

    def tag_pairs(batch: pa.Table) -> pa.Table:
        key = batch.column(side).to_numpy().astype(np.uint64)
        part = ((key * _MIX64) >> np.uint64(33)) % np.uint64(n_parts)
        cols = {
            "_part": pa.array(part.astype(np.int32)),
            "_kind": pa.array(np.ones(batch.num_rows, np.int8)),
        }
        for c in pair_cols:
            cols[c] = batch.column(c)
        for c, nc in zip(payload_cols, new_cols):
            cols[nc] = pa.nulls(batch.num_rows, ptypes[c])
        return pa.table(cols)

    def tag_pay(batch: pa.Table) -> pa.Table:
        key = batch.column(id_col).to_numpy().astype(np.uint64)
        part = ((key * _MIX64) >> np.uint64(33)) % np.uint64(n_parts)
        cols = {
            "_part": pa.array(part.astype(np.int32)),
            "_kind": pa.array(np.zeros(batch.num_rows, np.int8)),
        }
        for c in pair_cols:
            if c == side:
                cols[c] = batch.column(id_col).cast(pa.int64())
            else:
                cols[c] = pa.nulls(batch.num_rows, pair_schema.field(c).type)
        for c, nc in zip(payload_cols, new_cols):
            cols[nc] = batch.column(c)
        return pa.table(cols)

    # the per-partition merge runs on ARROW (not pandas): pandas coerces
    # nullable int64 to float64, which silently rounds values past 2^53
    # (e.g. 64-bit simhash signatures) — arrow keeps exact types
    def join_group(g: pa.Table) -> pa.Table:
        kind = g.column("_kind").to_numpy()
        pay = g.filter(pa.array(kind == 0))
        prs = g.filter(pa.array(kind == 1))
        prs = prs.drop_columns(["_part", "_kind"])
        if prs.num_rows == 0 or pay.num_rows == 0:
            return prs.slice(0, 0)
        pay_keys = pay.column(side).to_numpy()
        order = np.argsort(pay_keys, kind="stable")
        pk_sorted = pay_keys[order]
        pr_keys = prs.column(side).to_numpy()
        pos = np.searchsorted(pk_sorted, pr_keys)
        pos = np.minimum(pos, pk_sorted.size - 1)
        hit = pk_sorted[pos] == pr_keys
        prs_f = prs.filter(pa.array(hit))
        pay_taken = pay.take(pa.array(order[pos[hit]], pa.int64()))
        cols = {c: prs_f.column(c) for c in pair_cols}
        for nc in new_cols:
            cols[nc] = pay_taken.column(nc)
        return pa.table(cols)

    tagged = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
        payload_ds.map_batches(tag_pay, batch_format="pyarrow")
    )
    return (
        tagged.groupby("_part")
        .map_groups(join_group, batch_format="pyarrow")
    )


def connected_components(pairs: pd.DataFrame) -> pd.DataFrame:
    """Min-label union-find over the (a, b) edge list -> (doc_id, cluster).

    Driver-side fast path for small candidate-pair frames; above
    ``driver_threshold`` the dedup operators route to the distributed
    :func:`connected_components_ds` (identical labels).
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


def connected_components_ds(pairs_ds, *, n_parts: int = 64,
                            max_rounds: int = 64):
    """Distributed connected components over an (a, b) edge Dataset.

    Hash-to-min label propagation (Rastogi et al., "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds", ICDE 2013): each node
    keeps a member set C(v); per round every set sends its min to all
    members and its members to the min. Converges in O(log n) rounds; at
    the fixed point every node's min is its component's global min docID.

    Each round is ONE hash-partitioned groupby over the message rows (the
    edge list never leaves the cluster, nothing touches the driver except
    a per-round fingerprint scalar used for convergence detection).
    Returns a Dataset of (doc_id, cluster) — labels are identical to the
    driver-side :func:`connected_components` union-find.
    """
    _MIXC = np.uint64(0x9E3779B97F4A7C15)

    def seed(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b, a, b]), pa.int64()),
                "member": pa.array(np.concatenate([b, a, a, b]), pa.int64()),
                "lab": pa.array(np.zeros(4 * len(a), dtype=bool)),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy().astype(np.uint64)
        part = ((node * _MIXC) >> np.uint64(33)) % np.uint64(n_parts)
        return batch.append_column(
            "part", pa.array(part.astype(np.int32))
        )

    def step(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["node", "member"]].drop_duplicates()
        mn = g.groupby("node")["member"].transform("min").to_numpy(np.int64)
        node = g["node"].to_numpy(np.int64)
        member = g["member"].to_numpy(np.int64)
        # label rows (node -> its current min); also valid messages, so
        # they flow into the next round, which keeps mins monotone
        labs = (
            pd.DataFrame({"node": node, "member": mn, "lab": True})
            .drop_duplicates(["node", "member"])
        )
        msgs = (
            pd.DataFrame(
                {
                    "node": np.concatenate([member, mn]),
                    "member": np.concatenate([mn, member]),
                    "lab": False,
                }
            ).drop_duplicates(["node", "member"])
        )
        # a (node, member) row that is a label keeps lab=True
        msgs = msgs.merge(
            labs[["node", "member"]].assign(_l=True),
            on=["node", "member"], how="left",
        )
        msgs = msgs[msgs["_l"].isna()].drop(columns=["_l"])
        return pd.concat([labs, msgs], ignore_index=True)

    def fingerprint(batch: pa.Table) -> pa.Table:
        # commutative, partition-independent hash of the message multiset:
        # equal across rounds <=> fixed point reached
        node = batch.column("node").to_numpy().astype(np.uint64)
        member = batch.column("member").to_numpy().astype(np.uint64)
        h = (node * _MIXC) ^ (member + _MIXC)
        h = h * _MIXC
        return pa.table(
            {"fp": pa.array([int(np.sum(h, dtype=np.uint64))], pa.uint64()),
             "n": pa.array([batch.num_rows], pa.int64())}
        )

    cur = pairs_ds.map_batches(seed, batch_format="pyarrow").materialize()
    prev_fp = None
    for _ in range(max_rounds):
        cur = (
            cur.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(step, batch_format="pandas")
            .materialize()
        )
        fps = cur.map_batches(fingerprint, batch_format="pyarrow").to_pandas()
        fp = (int(np.sum(fps["fp"].to_numpy(np.uint64), dtype=np.uint64)),
              int(fps["n"].sum()))
        if fp == prev_fp:
            break
        prev_fp = fp

    def emit_labels(batch: pa.Table) -> pa.Table:
        keep = batch.filter(batch.column("lab"))
        return pa.table(
            {"doc_id": keep.column("node"), "cluster": keep.column("member")}
        )

    return cur.map_batches(emit_labels, batch_format="pyarrow")


def _empty_labels_ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "cluster": pa.array([], pa.int64())})
    )


def cluster_pairs(pairs_ds, *, mode: str = "auto",
                  driver_threshold: int = 100_000,
                  n_parts: int = 64):
    """Verified pair Dataset -> (doc_id, cluster) DATASET, routing between
    the driver union-find (small inputs) and distributed hash-to-min
    rounds.

    The Dataset is the primary surface: at web scale the cluster-
    membership table is billions of rows (30-50%% duplication), so
    callers join/filter against it distributed and only ``.to_pandas()``
    results they know are small. Below ``driver_threshold`` PAIRS the
    labels are computed with the driver union-find (identical labels)
    and re-wrapped — the convenience path, never the contract."""
    pairs_ds = pairs_ds.materialize()
    n = pairs_ds.count()
    if n == 0:
        return _empty_labels_ds()
    if mode == "driver" or (mode == "auto" and n <= driver_threshold):
        import ray.data as rd

        return rd.from_pandas(connected_components(pairs_ds.to_pandas()))
    return connected_components_ds(pairs_ds, n_parts=n_parts)


def dedup_keep_canonical(docs_ds, labels_ds, *, id_col: str = "doc_id",
                         rows_types: dict | None = None,
                         n_parts: int = 64):
    """Apply a (doc_id, cluster) label Dataset to the corpus: keep every
    unclustered doc plus each cluster's canonical member (its min-docID,
    which IS the cluster label), dropping the other members.

    This is the canonical DISTRIBUTED consumption of the dedup
    surfaces' Dataset output — one hash-partitioned anti-join against
    the dropped-id set; neither the corpus nor the labels ever touch
    the driver (D4 set-difference at membership-table scale)."""
    import pyarrow.compute as pc

    from webindex.relational import hash_semi_join

    drops = labels_ds.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column(id_col), t.column("cluster"))
        ).select([id_col]),
        batch_format="pyarrow",
    )
    if rows_types is None:
        rows_types = {
            f.name: f.type for f in _arrow_schema(docs_ds)
        }
    return hash_semi_join(
        docs_ds, id_col, drops, rows_types=rows_types,
        n_parts=n_parts, anti=True,
    )


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup
# ---------------------------------------------------------------------------


def minhash_bands(sig_ds, num_perm: int = 128, bands: int = 16):
    """signatures -> (band_id, band_hash, doc_id) rows (flat explode).

    Fully vectorized: the fixed-size sig column reshapes to a
    (docs, bands, r) matrix and each band row is hashed with r
    xor-multiply mix rounds over whole columns — no per-(doc, band)
    Python work. The hash only needs the band slices' EQUALITY
    structure (equal slices -> equal hashes by construction). A 64-bit
    collision can only ADD a candidate pair; exact-verify discards it
    when its true Jaccard is below threshold (the common case), but a
    colliding pair that happens to sit at/above threshold WOULD be
    kept — a ~2^-64-probability divergence from the SQL oracle, which
    buckets by the slice itself (the equality-structure claim is
    one-directional). Negligible, not impossible."""
    r = num_perm // bands
    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"band_id": pa.array([], pa.int32()),
                 "band_hash": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64())}
            )
        col = batch.column("sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        # when bands does not divide num_perm, the tail permutations are
        # unused — same semantics as the old per-band slices
        mat = flat.astype(np.uint64).reshape(n, num_perm)[:, : bands * r]
        mat = mat.reshape(n, bands, r)
        h = np.zeros((n, bands), np.uint64)
        for j in range(r):
            h = (h ^ (mat[:, :, j] + _MIX)) * _MIX
        dids = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table(
            {
                "band_id": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(h.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(dids, bands)),
            }
        )

    return sig_ds.map_batches(explode, batch_format="pyarrow")


def jaccard(text_a: str, text_b: str, k: int = 3,
            base_hash: str = "blake2b") -> float:
    sa = set(_shingle_hashes(text_a, k, base_hash))
    sb = set(_shingle_hashes(text_b, k, base_hash))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _jaccard_keep(ta: list, tb: list, k: int, thr: float,
                  base_hash: str) -> list[bool]:
    """Vector of ``jaccard(a, b) >= thr`` over pair columns, shingling
    each DISTINCT text once per batch — bucketed candidate pairs repeat
    the same docs heavily, so per-pair re-shingling (the dominant cost:
    tokenize + hash per text) would redo the same work many times."""
    cache: dict[str, frozenset] = {}

    def sets(t: str) -> frozenset:
        s = cache.get(t)
        if s is None:
            s = cache[t] = frozenset(_shingle_hashes(t, k, base_hash))
        return s

    out = []
    for x, y in zip(ta, tb):
        sa, sb = sets(x or ""), sets(y or "")
        if not sa and not sb:
            out.append(thr <= 1.0)
            continue
        if not sa or not sb:
            out.append(thr <= 0.0)
            continue
        out.append(len(sa & sb) / len(sa | sb) >= thr)
    return out


def lsh_plan(threshold: float, num_perm: int = 128) -> tuple[int, int]:
    """Optimal (bands, rows_per_band) for a MinHash-LSH Jaccard
    ``threshold`` — the datasketch/Broder planning rule: over every
    factorization b*r = num_perm, minimize the weighted sum of the
    false-positive area (∫₀^t P(s)) and false-negative area (∫ₜ¹ 1−P(s))
    of the S-curve P(s) = 1 − (1 − s^r)^b. A 100-TB user picks num_perm
    for memory and gets the banding that centers the collision
    threshold (≈ (1/b)^(1/r)) at their target instead of hand-tuning.

    Pure driver-side math (a few hundred curve evaluations); feed the
    result straight into :func:`minhash_dedup`'s ``bands``."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    trapz = getattr(np, "trapezoid", None) or np.trapz  # numpy 2 rename
    xs = np.linspace(0.0, 1.0, 201)
    below = xs <= threshold
    best, best_cost = None, None
    for b in range(1, num_perm + 1):
        if num_perm % b:
            continue
        r = num_perm // b
        p = 1.0 - (1.0 - xs ** r) ** b
        fp = float(trapz(p[below], xs[below]))
        fn = float(trapz((1.0 - p)[~below], xs[~below]))
        cost = 0.5 * fp + 0.5 * fn
        if best_cost is None or cost < best_cost:
            best, best_cost = (b, r), cost
    return best


def _minhash_sig_ds(ds, *, num_perm: int, shingle_k: int, base_hash: str):
    """(doc_id, text) -> (doc_id, sig) via the process-global stage cache
    (stateless tasks; actors pay per-actor startup that dominates small
    inputs — the minhash_dedup measurement)."""

    def sig_batch(batch: pa.Table, num_perm=num_perm, shingle_k=shingle_k,
                  base_hash=base_hash):
        key = ("minhash", num_perm, shingle_k, base_hash)
        st = _STAGE_CACHE.get(key)
        if st is None:
            st = _STAGE_CACHE[key] = MinHashStage(
                num_perm=num_perm, shingle_k=shingle_k, base_hash=base_hash
            )
        return st(batch)

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def minhash_dedup(ds, *, num_perm: int = 128, bands: int = 16,
                  shingle_k: int = 3, threshold: float = 0.8,
                  concurrency: int | tuple = 4, cc_mode: str = "auto",
                  driver_threshold: int = 100_000,
                  base_hash: str = "blake2b"):
    """Full MinHash-LSH near-dup pipeline -> (doc_id, cluster) Dataset.

    ``ds`` needs (doc_id, text). Verification hash-joins the LSH candidate
    pair list against the corpus (both sides) and recomputes exact shingle
    Jaccard inside ``map_batches`` — the corpus never materializes on the
    driver, and neither do the labels: the result is a Dataset callers
    join/filter distributed (``.to_pandas()`` only when known-small).
    """
    # stateless tasks with a process-global stage cache: actor pools pay
    # startup per actor, which dominates on small inputs (measured ~2s of
    # a 6.8s sf0.1 run); tasks scale elastically with the data
    del concurrency

    sig = _minhash_sig_ds(ds, num_perm=num_perm, shingle_k=shingle_k,
                          base_hash=base_hash)
    bands_ds = minhash_bands(sig, num_perm=num_perm, bands=bands)
    pairs_ds = pairs_from_buckets(
        bands_ds, ["band_id", "band_hash"]
    ).materialize()
    if pairs_ds.count() == 0:
        return _empty_labels_ds()
    _warn_truncated(pairs_ds, "minhash_dedup")
    withpay = attach_pair_payloads(
        pairs_ds, ds.select_columns(["doc_id", "text"]), ["text"]
    )

    def verify(batch: pa.Table, k=shingle_k, thr=threshold,
               bh=base_hash) -> pa.Table:
        keep = pa.array(_jaccard_keep(
            batch.column("text_a").to_pylist(),
            batch.column("text_b").to_pylist(), k, thr, bh,
        ))
        return batch.filter(keep).select(["a", "b"])

    verified = withpay.map_batches(verify, batch_format="pyarrow")
    return cluster_pairs(
        verified, mode=cc_mode, driver_threshold=driver_threshold
    )


def build_minhash_store(ds, store_dir: str, *, num_perm: int = 128,
                        bands: int = 16, shingle_k: int = 3,
                        base_hash: str = "blake2b") -> None:
    """Persist the LSH index of a (deduped) corpus for INCREMENTAL dedup:
    ``bands/`` partitioned parquet of (band_id, band_hash, doc_id) rows,
    ``docs/`` (doc_id, text) payloads for the verify join, ``meta.json``
    pinning the signature parameters (an incremental query with different
    params would silently bucket against garbage — refuse instead).

    The band table is the index (``bands`` rows per doc, two int64s each);
    at corpus scale it is a small multiple of a docID column, not a copy
    of the corpus. Partitioned parquet = resumable output."""
    import os

    from webindex.util import atomic_write_json

    sig = _minhash_sig_ds(ds, num_perm=num_perm, shingle_k=shingle_k,
                          base_hash=base_hash)
    minhash_bands(sig, num_perm=num_perm, bands=bands).write_parquet(
        os.path.join(store_dir, "bands")
    )
    ds.select_columns(["doc_id", "text"]).write_parquet(
        os.path.join(store_dir, "docs")
    )
    atomic_write_json(
        os.path.join(store_dir, "meta.json"),
        {"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k,
         "base_hash": base_hash},
    )


def minhash_dedup_incremental(new_ds, store_dir: str, *,
                              threshold: float = 0.8,
                              max_bucket: int = 2000, n_parts: int = 64):
    """NEW docs vs a persisted corpus LSH store (the ongoing-crawl shape:
    the existing corpus is never re-signed or relabeled) -> Dataset
    (doc_id, dup_of): every new doc whose exact shingle Jaccard with some
    STORED doc is >= ``threshold``; ``dup_of`` is the smallest matching
    stored docID. Callers keep the survivors with
    ``relational.hash_semi_join(new, labels, anti=True)`` and append
    them (+ their band rows) to the store.

    Shuffle shape: ONE hash partition co-locating stored and new band
    rows by (band_id, band_hash); each partition emits old x new pairs
    with a vectorized merge (never old x old — the store was deduped
    when built); verify hash-joins the texts of ONLY the touched docs;
    the dup_of reduce is the same partitioned min. Nothing corpus-sized
    reaches the driver."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(store_dir, "meta.json")) as f:
        meta = json.load(f)
    sig = _minhash_sig_ds(new_ds, num_perm=meta["num_perm"],
                          shingle_k=meta["shingle_k"],
                          base_hash=meta["base_hash"])
    new_bands = minhash_bands(sig, num_perm=meta["num_perm"],
                              bands=meta["bands"])
    old_bands = rd.read_parquet(os.path.join(store_dir, "bands"))

    def tag(kind: int):
        def f(t: pa.Table) -> pa.Table:
            key = t.column("band_hash").to_numpy()
            bid = t.column("band_id").to_numpy()
            part = ((key.astype(np.uint64) * _MIX64
                     + bid.astype(np.uint64)) >> np.uint64(40)) % n_parts
            return pa.table(
                {"part": pa.array(part.astype(np.int32)),
                 "kind": pa.array(np.full(t.num_rows, kind, np.int8)),
                 "band_id": t.column("band_id"),
                 "band_hash": t.column("band_hash"),
                 "doc_id": t.column("doc_id")}
            )
        return f

    tagged = old_bands.map_batches(tag(0), batch_format="pyarrow").union(
        new_bands.map_batches(tag(1), batch_format="pyarrow")
    )
    keys = ["band_id", "band_hash"]

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype=np.int64),
             "b": pd.Series(dtype=np.int64),
             "truncated": pd.Series(dtype=bool)}
        )
        sizes = g.groupby(keys)["doc_id"].transform("size")
        g = g.assign(_trunc=sizes > max_bucket)
        g = (
            g.sort_values(["kind", "doc_id"])
            .groupby(keys, sort=False)
            .head(max_bucket)
        )
        old = g[g["kind"] == 0]
        new = g[g["kind"] == 1]
        if old.empty or new.empty:
            return empty
        m = old.merge(new, on=keys, suffixes=("_a", "_b"))
        if m.empty:
            return empty
        out = pd.DataFrame(
            {"a": m["doc_id_a"].to_numpy(np.int64),
             "b": m["doc_id_b"].to_numpy(np.int64),
             "truncated": (m["_trunc_a"] | m["_trunc_b"]).to_numpy(bool)}
        )
        return out.drop_duplicates(["a", "b"])

    pairs_ds = exact_pair_dedup(
        tagged.groupby("part").map_groups(emit, batch_format="pandas"),
        n_parts=n_parts,
    ).materialize()
    if pairs_ds.count() == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "dup_of": pa.array([], pa.int64())})
        )
    _warn_truncated(pairs_ds, "minhash_dedup_incremental")

    payload = rd.read_parquet(os.path.join(store_dir, "docs")).union(
        new_ds.select_columns(["doc_id", "text"])
    )
    withpay = attach_pair_payloads(
        pairs_ds, payload, ["text"], payload_types={"text": pa.string()}
    )

    def verify(batch: pa.Table, k=meta["shingle_k"], thr=threshold,
               bh=meta["base_hash"]) -> pa.Table:
        keep = pa.array(_jaccard_keep(
            batch.column("text_a").to_pylist(),
            batch.column("text_b").to_pylist(), k, thr, bh,
        ))
        return batch.filter(keep).select(["a", "b"])

    verified = withpay.map_batches(verify, batch_format="pyarrow")

    def add_part_b(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy().astype(np.uint64)
        part = ((b * _MIX64) >> np.uint64(33)) % np.uint64(n_parts)
        return t.append_column("part", pa.array(part.astype(np.int32)))

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("b", as_index=False)["a"].min()
        return pd.DataFrame(
            {"doc_id": out["b"].to_numpy(np.int64),
             "dup_of": out["a"].to_numpy(np.int64)}
        )

    return (
        verified.map_batches(add_part_b, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_min, batch_format="pandas")
    )


def ngram_jaccard_dedup(ds, *, shingle_k: int = 3, threshold: float = 0.5,
                        max_bucket: int = 2000, cc_mode: str = "auto",
                        driver_threshold: int = 100_000):
    """Exact n-gram Jaccard near-dup -> (doc_id, cluster) Dataset.

    Candidate generation is COMPLETE for threshold > 0 *as long as no
    bucket exceeds* ``max_bucket``: any pair with nonzero Jaccard shares
    at least one word-k-gram, so bucketing docs by distinct shingle hash
    finds every qualifying pair. Buckets larger than ``max_bucket`` —
    ultra-common shingles whose pairs usually have low Jaccard — are
    truncated; a pair whose ONLY shared shingles are truncated is then
    missing, so truncation is surfaced as a ``UserWarning`` with the
    affected-pair count (raise ``max_bucket`` to restore completeness).
    Verification recomputes
    exact shingle-set Jaccard inside ``map_batches`` after the payload
    join; clustering routes like the other dedup flavors.
    """

    def explode(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_pylist()
        out_h, out_d = [], []
        for did, t in zip(dids, batch.column("text").to_pylist()):
            hs = _shingle_hashes(t or "", shingle_k)
            out_h.extend((hs.astype(np.int64)).tolist())
            out_d.extend([did] * hs.size)
        return pa.table(
            {
                "band_id": pa.array(np.zeros(len(out_h), np.int32)),
                "band_hash": pa.array(out_h, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
            }
        )

    buckets = ds.map_batches(explode, batch_format="pyarrow")
    pairs_ds = pairs_from_buckets(
        buckets, ["band_id", "band_hash"], max_bucket=max_bucket
    ).materialize()
    if pairs_ds.count() == 0:
        return _empty_labels_ds()
    _warn_truncated(pairs_ds, "ngram_jaccard_dedup")
    withpay = attach_pair_payloads(
        pairs_ds, ds.select_columns(["doc_id", "text"]), ["text"]
    )

    def verify(batch: pa.Table, k=shingle_k, thr=threshold) -> pa.Table:
        keep = pa.array(_jaccard_keep(
            batch.column("text_a").to_pylist(),
            batch.column("text_b").to_pylist(), k, thr, "blake2b",
        ))
        return batch.filter(keep).select(["a", "b"])

    verified = withpay.map_batches(verify, batch_format="pyarrow")
    return cluster_pairs(
        verified, mode=cc_mode, driver_threshold=driver_threshold
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHashStage:
    """text -> 64-bit simhash (tf-weighted token hash majority vote).

    ``base_hash="poly"``: SQL-expressible variant — ASCII tokens, the
    polynomial base hash (61 significant bits, so the output fits int64
    unshifted and a DuckDB oracle reproduces it bit for bit)."""

    def __init__(self, base_hash: str = "blake2b"):
        self.base_hash = base_hash
        self.nbits = 61 if base_hash == "poly" else 64
        # per-actor word->hash memo (Zipf vocabulary makes repeated token
        # hashing near-free, the Analyzer._stem_cache pattern)
        self._hash_cache: dict[str, int] = {}
        self._shifts = np.arange(self.nbits, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        poly = self.base_hash == "poly"
        nbits = self.nbits
        shifts = self._shifts
        hf = _poly_hash if poly else _hash64
        cache = self._hash_cache
        out = []
        for t in batch.column("text").to_pylist():
            toks = (
                _ASCII_WORD_RE.findall((t or "").lower())
                if poly
                else _WORD_RE.findall((t or "").lower())
            )
            if not toks:
                out.append(0)
                continue
            cnt = Counter(toks)
            hs = np.empty(len(cnt), dtype=np.uint64)
            counts = np.empty(len(cnt), dtype=np.int64)
            for i, (w, n) in enumerate(cnt.items()):
                h = cache.get(w)
                if h is None:
                    h = cache[w] = hf(w)
                hs[i] = h
                counts[i] = n
            # tf-weighted per-bit majority vote (+count for a 1 bit,
            # -count for a 0 bit): bitwise expand, weighted column sums —
            # identical acc to hashing every occurrence since integer
            # sums are order-independent and exact
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            # bit assembly: sum of distinct powers of two == bitwise OR
            sh = int(((acc > 0).astype(np.uint64) << shifts).sum(
                dtype=np.uint64
            ))
            out.append(sh - (1 << 63) if not poly else sh)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "simhash": pa.array(out, pa.int64())}
        )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(
        np.int64
    )


def simhash_dedup(ds, *, max_hamming: int = 3,
                  concurrency: int | tuple = 4, cc_mode: str = "auto",
                  driver_threshold: int = 100_000,
                  base_hash: str = "blake2b"):
    """SimHash near-dup -> (doc_id, cluster) Dataset: 4 x 16-bit band
    buckets (any doc pair within hamming distance 3 shares at least one
    exact band), verified by full hamming distance computed in
    ``map_batches`` after hash-joining the signatures onto both pair
    sides (no driver materialization, labels included)."""
    del concurrency

    def sig_batch(batch: pa.Table, base_hash=base_hash):
        key = ("simhash", base_hash)
        st = _STAGE_CACHE.get(key)
        if st is None:
            st = _STAGE_CACHE[key] = SimHashStage(base_hash=base_hash)
        return st(batch)

    # signatures are 16 bytes/doc: materializing keeps them in the object
    # store for both the band explode and the verify join (one compute)
    sig = ds.map_batches(sig_batch, batch_format="pyarrow").materialize()

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized 4 x 16-bit band split: one shift/mask broadcast,
        # row-major flatten matches the tile/repeat ordering
        sh = batch.column("simhash").to_numpy().astype(np.int64)
        u = sh.view(np.uint64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        vals = (
            (u[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)
        ).astype(np.int64)
        dids = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table(
            {"band_id": pa.array(np.tile(np.arange(4, dtype=np.int32),
                                         u.size)),
             "band_hash": pa.array(vals.reshape(-1)),
             "doc_id": pa.array(np.repeat(dids, 4))}
        )

    bands_ds = sig.map_batches(explode, batch_format="pyarrow")
    pairs_ds = pairs_from_buckets(
        bands_ds, ["band_id", "band_hash"]
    ).materialize()
    if pairs_ds.count() == 0:
        return _empty_labels_ds()
    _warn_truncated(pairs_ds, "simhash_dedup")
    withpay = attach_pair_payloads(
        pairs_ds, sig, ["simhash"],
        payload_types={"simhash": pa.int64()},
    )

    def verify(batch: pa.Table, maxh=max_hamming) -> pa.Table:
        xa = batch.column("simhash_a").to_numpy().astype(np.int64).view(np.uint64)
        xb = batch.column("simhash_b").to_numpy().astype(np.int64).view(np.uint64)
        dist = _popcount64(xa ^ xb)
        out = batch.filter(pa.array(dist <= maxh))
        return out.select(["a", "b"])

    verified = withpay.map_batches(verify, batch_format="pyarrow")
    return cluster_pairs(
        verified, mode=cc_mode, driver_threshold=driver_threshold
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dedup(emb_ds, *, threshold: float = 0.95, n_planes: int = 12,
                    seed: int = 5, id_col: str = "vec_id",
                    vec_col: str = "embedding", cc_mode: str = "auto",
                    driver_threshold: int = 100_000):
    """Near-dup by cosine >= threshold -> (doc_id, cluster) Dataset,
    bucketed by random-hyperplane LSH.

    Candidate generation: sign pattern of ``n_planes`` random projections
    (near-identical vectors almost surely share the exact pattern);
    verification: exact cosine inside ``map_batches`` after hash-joining
    the embedding column onto both pair sides (no driver materialization).
    """

    def bucket(batch: pa.Table) -> pa.Table:
        from webindex.ann import _batch_vecs

        vecs = _batch_vecs(batch, vec_col)
        # plane matrix is seed-deterministic: memoize per worker instead
        # of re-drawing it every batch
        key = ("embdedup_planes", seed, vecs.shape[1], n_planes)
        planes = _STAGE_CACHE.get(key)
        if planes is None:
            rng = np.random.default_rng(seed)
            planes = _STAGE_CACHE[key] = rng.standard_normal(
                (vecs.shape[1], n_planes)
            )
        signs = (vecs @ planes) > 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table(
            {"band_id": pa.array(np.zeros(len(keys), np.int32)),
             "band_hash": pa.array(keys, pa.int64()),
             "doc_id": batch.column(id_col)}
        )

    buckets = emb_ds.map_batches(bucket, batch_format="pyarrow")
    pairs_ds = pairs_from_buckets(
        buckets, ["band_id", "band_hash"]
    ).materialize()
    if pairs_ds.count() == 0:
        return _empty_labels_ds()

    # Arrow's hash join rejects list<float> payload columns — carry the
    # vectors through the join as float64 byte blobs instead
    def to_blob(batch: pa.Table) -> pa.Table:
        from webindex.ann import _batch_vecs

        mat = np.ascontiguousarray(_batch_vecs(batch, vec_col))
        n = mat.shape[0]
        step = (mat.shape[1] if mat.ndim == 2 else 0) * 8
        if n and step and n * step < 2**31:
            # build the binary array straight from the flat float64
            # buffer (fixed row stride -> arithmetic offsets, zero
            # Python-row hops)
            offsets = np.arange(n + 1, dtype=np.int32) * step
            blobs = pa.BinaryArray.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offsets), pa.py_buffer(mat.tobytes())],
            )
        else:
            blobs = pa.array(
                [mat[i].tobytes() for i in range(n)], pa.binary()
            )
        return pa.table(
            {id_col: batch.column(id_col), "vecblob": blobs}
        )

    _warn_truncated(pairs_ds, "embedding_dedup")
    blob_ds = emb_ds.map_batches(to_blob, batch_format="pyarrow")
    withpay = attach_pair_payloads(
        pairs_ds, blob_ds, ["vecblob"], id_col=id_col,
        payload_types={"vecblob": pa.binary()},
    )

    def verify(batch: pa.Table, thr=threshold) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["a", "b"])
        va = np.stack(
            [np.frombuffer(x, np.float64)
             for x in batch.column("vecblob_a").to_pylist()]
        )
        vb = np.stack(
            [np.frombuffer(x, np.float64)
             for x in batch.column("vecblob_b").to_pylist()]
        )
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        dot = np.einsum("ij,ij->i", va, vb)
        denom = na * nb
        cos = np.where(denom > 0, dot / np.where(denom > 0, denom, 1.0), 0.0)
        cos = np.where((na == 0) & (nb == 0), 1.0, cos)
        out = batch.filter(pa.array(cos >= thr))
        return out.select(["a", "b"])

    verified = withpay.map_batches(verify, batch_format="pyarrow")
    return cluster_pairs(
        verified, mode=cc_mode, driver_threshold=driver_threshold
    )


# ---------------------------------------------------------------------------
# Cross-document duplicate n-grams (training-data curation signal)
# ---------------------------------------------------------------------------


def cross_doc_dup_ngrams(docs_ds, *, n: int = 3, min_count: int = 2,
                         n_parts: int = 64, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Per-document CROSS-corpus duplicate n-gram statistics — the signal
    behind span-level training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", public
    paper: repeated spans across documents, not just within one).

    Output per doc (docs with >= 1 shingle): ``(doc_id, n_shingles,
    n_dup, dup_frac)`` where a shingle is ``n`` consecutive
    ``[a-z0-9]+`` lowercase tokens (the SQL-reproducible analyzer of
    ``textstats.repetition_batch``), ``n_dup`` counts shingle POSITIONS
    whose shingle occurs >= ``min_count`` times in the whole corpus
    (multiplicity across and within docs), and ``dup_frac`` is the one
    ``n_dup / n_shingles`` IEEE division (exact-int inputs, so a DuckDB
    oracle matches bit for bit).

    Scale shape: one pass emits per-(doc, shingle-hash) partial counts
    (pre-aggregated per doc — repeats inside a doc never fan out), ONE
    hash shuffle co-locates each shingle's rows (``h % n_parts``,
    partition count PINNED), the per-partition kernel is vectorized
    (sort + reduceat group sums) and emits per-doc PARTIALS, and a final
    small ``groupby(doc_id).Sum`` merge reassembles — nothing
    corpus-sized reaches the driver and no string leaves the first
    stage. Shingles are keyed by a vectorized 64-bit polynomial combine
    of memoized per-token blake2b hashes (order-sensitive, avalanche
    finalizer): a cross-shingle collision (~2^-64 per pair)
    could overcount one doc's dup positions — the same documented
    tradeoff as the docids key128 path.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    if n < 1:
        raise ValueError("n must be >= 1")

    def shingle_rows(batch: pa.Table) -> pa.Table:
        cache = shingle_rows.__dict__.setdefault("_tok_cache", {})
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, hs_parts, occ_parts = [], [], []
        for did, t in zip(ids, texts):
            acc = _ngram_pos_hashes(t, n, cache)
            if acc.size == 0:
                continue
            uh, cnts = np.unique(acc, return_counts=True)
            o_id.extend([did] * uh.size)
            hs_parts.append(uh)
            occ_parts.append(cnts.astype(np.int64))
        h = (
            np.concatenate(hs_parts) if hs_parts
            else np.empty(0, np.uint64)
        )
        occ = (
            np.concatenate(occ_parts) if occ_parts
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(o_id, pa.int64()),
                "h": pa.array(h),
                "occ": pa.array(occ),
                "part": pa.array(
                    (h % np.uint64(n_parts)).astype(np.int32)
                ),
            }
        )

    def mark_partition(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy(np.uint64)
        occ = g["occ"].to_numpy(np.int64)
        dids = g[id_col].to_numpy(np.int64)
        order = np.argsort(h, kind="stable")
        hs, occs, idss = h[order], occ[order], dids[order]
        new_grp = np.empty(hs.size, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(new_grp)
        totals = np.add.reduceat(occs, starts)
        grp_of = np.cumsum(new_grp) - 1
        dup_row = (totals >= min_count)[grp_of]
        pdf = pd.DataFrame(
            {
                id_col: idss,
                "occ_p": occs,
                "dup_p": np.where(dup_row, occs, 0),
            }
        )
        return (
            pdf.groupby(id_col, sort=False).sum().reset_index()
        )

    partials = (
        docs_ds.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(mark_partition, batch_format="pandas")
    )

    # final per-doc merge via the repo's hash-partitioned groupby (one
    # vectorized pandas sum per partition) — Ray's per-key
    # groupby().aggregate() costs ~50x more at doc-count cardinality
    # (measured 15.8 s vs 0.3 s over 320k partial rows / 5k docs)
    from webindex.relational import hash_partitioned_groupby

    def psum(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(id_col, sort=False)[["occ_p", "dup_p"]]
            .sum()
            .reset_index()
        )

    merged = hash_partitioned_groupby(
        partials, [id_col], psum, psum, n_parts=n_parts
    )

    def add_frac(batch: pa.Table) -> pa.Table:
        tot = batch.column("occ_p").to_numpy().astype(np.int64)
        dup = batch.column("dup_p").to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_shingles": pa.array(tot),
                "n_dup": pa.array(dup),
                "dup_frac": pa.array(dup / tot, pa.float64()),
            }
        )

    return merged.map_batches(add_frac, batch_format="pyarrow")


_SHINGLE_P = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier


def _ngram_pos_hashes(text: str, n: int, cache: dict) -> np.ndarray:
    """Per-position 64-bit shingle hashes of ``n`` consecutive
    ``[a-z0-9]+`` lowercase tokens: an order-sensitive polynomial combine
    of per-token blake2b hashes (memoized in ``cache`` per worker — Zipf
    vocab makes the memo near-free), vectorized over the token-hash
    array (one multiply-add per window offset), avalanche-finalized.
    Equal shingle strings always hash equal; cross-shingle collisions
    ~2^-64 per pair for natural text (documented tradeoff)."""
    from webindex.textstats import _ASCII_TOK_RE
    from webindex.util import stable_hash64

    toks = _ASCII_TOK_RE.findall((text or "").lower())
    total = len(toks) - n + 1
    if total <= 0:
        return np.empty(0, np.uint64)
    th = np.empty(len(toks), dtype=np.uint64)
    for i, tok in enumerate(toks):
        hv = cache.get(tok)
        if hv is None:
            hv = cache[tok] = np.uint64(stable_hash64(tok))
        th[i] = hv
    with np.errstate(over="ignore"):
        weights = _SHINGLE_P ** np.arange(n - 1, -1, -1, dtype=np.uint64)
        acc = np.zeros(total, dtype=np.uint64)
        for j in range(n):
            acc += th[j: j + total] * weights[j]
    acc ^= acc >> np.uint64(33)
    return acc


def contamination(docs_ds, eval_texts: list[tuple[int, str]], *,
                  n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Benchmark-decontamination scan: per corpus document, how many of
    its n-gram positions also occur in a (small) EVAL/BENCHMARK set —
    the n-gram-overlap contamination check LLM training pipelines run
    before training (e.g. GPT-3 appendix C / PaLM-style n-gram overlap;
    public methodology).

    ``eval_texts`` is the small side: ``[(eval_id, text)]`` shingled on
    the driver into ONE sorted 64-bit hash array and broadcast via
    ``ray.put``; the corpus streams through a stateless ``map_batches``
    whose per-doc work is one vectorized ``searchsorted`` membership
    probe. Output per doc (docs with >= 1 shingle): ``(doc_id,
    n_shingles, n_overlap, overlap_frac)`` with ``overlap_frac`` the one
    exact-int IEEE division, so a DuckDB string-join oracle matches bit
    for bit (same shingle-hash collision caveat as
    :func:`cross_doc_dup_ngrams`)."""
    import ray

    cache: dict = {}
    ev_parts = [
        _ngram_pos_hashes(t, n, cache) for _eid, t in eval_texts
    ]
    ev = (
        np.unique(np.concatenate(ev_parts)) if ev_parts
        else np.empty(0, np.uint64)
    )
    ev_ref = ray.put(ev)

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(ev_ref)  # zero-copy numpy from the object store
        c = probe.__dict__.setdefault("_tok_cache", {})
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_tot, o_hit = [], [], []
        for did, t in zip(ids, texts):
            acc = _ngram_pos_hashes(t, n, c)
            if acc.size == 0:
                continue
            if bench.size:
                pos = np.searchsorted(bench, acc)
                pos_c = np.minimum(pos, bench.size - 1)
                hits = int(np.count_nonzero(bench[pos_c] == acc))
            else:
                hits = 0
            o_id.append(did)
            o_tot.append(int(acc.size))
            o_hit.append(hits)
        tot = np.array(o_tot, dtype=np.int64)
        hit = np.array(o_hit, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(o_id, pa.int64()),
                "n_shingles": pa.array(tot),
                "n_overlap": pa.array(hit),
                "overlap_frac": pa.array(
                    hit / np.maximum(tot, 1), pa.float64()
                ),
            }
        )

    return docs_ds.map_batches(probe, batch_format="pyarrow")


def dedup_spans(docs_ds, *, n: int = 5, min_count: int = 2,
                n_parts: int = 64, id_col: str = "doc_id",
                text_col: str = "text"):
    """Span-level training-data dedup (Lee et al. 2022's ExactSubstr
    REMOVAL step, n-gram-windowed): rewrite each document with every
    token covered by a corpus-duplicated ``n``-gram REMOVED, not just
    flagged (``cross_doc_dup_ngrams`` is the flag-only signal).

    A shingle is ``n`` consecutive ``[a-z0-9]+`` lowercase tokens; it is
    duplicated when it occurs >= ``min_count`` times corpus-wide
    (multiplicity across and within docs). A token is removed when ANY
    of the <= n shingle windows covering it is duplicated. Output per
    input doc (ALL docs, including empty and fully-removed ones):
    ``(doc_id, clean_text, n_tokens, n_removed)`` where ``clean_text``
    is the KEPT tokens joined by single spaces — the canonical
    re-tokenized surface (original inter-token whitespace around removed
    spans is not reconstructible, and the canonical form is what a
    DuckDB string_agg oracle reproduces exactly; no floats anywhere, so
    the contract hash is exact).

    Scale shape: pass 1 emits one (doc, pos, shingle-hash) row per
    shingle POSITION (corpus-token-sized, never wider), ONE pinned hash
    shuffle co-locates each shingle's rows so corpus totals are a
    partition-local sort+reduceat, and only DUPLICATED positions — the
    small side — survive; pass 2 hash-partitions docs and dup-positions
    together by doc (padded union, one shuffle) and rebuilds each doc
    with a vectorized interval-coverage cumsum. Shingle identity is the
    64-bit polynomial hash of ``_ngram_pos_hashes`` (equal strings
    always collide-equal; a cross-string collision ~2^-64 per pair could
    remove one extra span — the documented dup_ngrams tradeoff)."""
    import pandas as pd

    from webindex.textstats import _ASCII_TOK_RE

    if n < 1:
        raise ValueError("n must be >= 1")

    def shingle_pos_rows(batch: pa.Table) -> pa.Table:
        cache = shingle_pos_rows.__dict__.setdefault("_tok_cache", {})
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, pos_parts, h_parts = [], [], []
        for did, t in zip(ids, texts):
            acc = _ngram_pos_hashes(t, n, cache)
            if acc.size == 0:
                continue
            o_id.extend([did] * acc.size)
            pos_parts.append(np.arange(acc.size, dtype=np.int64))
            h_parts.append(acc)
        h = np.concatenate(h_parts) if h_parts else np.empty(0, np.uint64)
        pos = (
            np.concatenate(pos_parts) if pos_parts
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(o_id, pa.int64()),
                "pos": pa.array(pos),
                "h": pa.array(h),
                "part": pa.array(
                    (h % np.uint64(n_parts)).astype(np.int32)
                ),
            }
        )

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy(np.uint64)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        new_grp = np.empty(hs.size, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(new_grp)
        totals = np.add.reduceat(np.ones(hs.size, np.int64), starts)
        dup_row = (totals >= min_count)[np.cumsum(new_grp) - 1]
        keep = order[dup_row]
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64)[keep],
                "pos": g["pos"].to_numpy(np.int64)[keep],
            }
        )

    dup_pos = (
        docs_ds.map_batches(shingle_pos_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dup_positions, batch_format="pandas")
    )

    # pass 2: padded union of docs + dup positions, ONE doc-hash shuffle
    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "kind": pa.array(np.zeros(len(ids), np.int8)),
                text_col: batch.column(text_col),
                "pos": pa.nulls(len(ids), pa.int64()),
                "part": pa.array(
                    (ids.astype(np.uint64) * _SHINGLE_P
                     >> np.uint64(33)).astype(np.int64) % n_parts
                ),
            }
        )

    def tag_pos(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "kind": pa.array(np.ones(len(ids), np.int8)),
                text_col: pa.nulls(len(ids), pa.string()),
                "pos": batch.column("pos"),
                "part": pa.array(
                    (ids.astype(np.uint64) * _SHINGLE_P
                     >> np.uint64(33)).astype(np.int64) % n_parts
                ),
            }
        )

    tagged = docs_ds.map_batches(tag_docs, batch_format="pyarrow").union(
        dup_pos.map_batches(tag_pos, batch_format="pyarrow")
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["kind"] == 0]
        pmap: dict[int, list[int]] = {}
        for did, p in zip(
            g.loc[g["kind"] == 1, id_col].to_numpy(np.int64),
            g.loc[g["kind"] == 1, "pos"].to_numpy(np.int64),
        ):
            pmap.setdefault(int(did), []).append(int(p))
        o_id, o_text, o_nt, o_rm = [], [], [], []
        for did, t in zip(
            docs[id_col].to_numpy(np.int64), docs[text_col].tolist()
        ):
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            m = len(toks)
            starts = pmap.get(int(did))
            if starts:
                delta = np.zeros(m + 1, np.int64)
                s = np.asarray(starts, np.int64)
                np.add.at(delta, s, 1)
                np.add.at(delta, np.minimum(s + n, m), -1)
                covered = np.cumsum(delta[:-1]) > 0
                kept = [tok for tok, c in zip(toks, covered) if not c]
            else:
                kept = toks
            o_id.append(did)
            o_text.append(" ".join(kept))
            o_nt.append(m)
            o_rm.append(m - len(kept))
        return pd.DataFrame(
            {
                id_col: np.asarray(o_id, np.int64),
                "clean_text": o_text,
                "n_tokens": np.asarray(o_nt, np.int64),
                "n_removed": np.asarray(o_rm, np.int64),
            }
        )

    return tagged.groupby("part").map_groups(
        rebuild, batch_format="pandas"
    )


_PARA_SHIFT = 20  # para_id < 2^20 (a doc would need P * 2^20 tokens)


def paragraph_dedup(docs_ds, *, para_tokens: int = 20,
                    id_col: str = "doc_id", text_col: str = "text",
                    n_parts: int = 64):
    """Dolma-style PARAGRAPH-level exact deduplication: split every doc
    into non-overlapping ``para_tokens``-token paragraphs (this corpus
    has no newline structure, so the paragraph rule is pinned to fixed
    token windows — the chunk_documents convention), keep each distinct
    paragraph's GLOBALLY FIRST occurrence (min (doc_id, para_id)), and
    REWRITE every doc as the space-join of its kept paragraphs.

    Output: ``(doc_id, text, n_kept, n_paras)`` — every input doc
    appears; fully-duplicated docs come back with ``text = ''``.

    Scale shape (the dedup_spans recipe): one stateless chunk pass, ONE
    paragraph-text hash shuffle whose partials are per-batch min-key
    combiners (first-wins is a min — commutative, so the shuffle moves
    one row per distinct paragraph per batch, not every occurrence),
    then one doc-hash shuffle to reassemble docs. The winner key packs
    (doc_id << 20 | para_id) into one int64 — the same composite min
    the SQL oracle takes, exact while para_id < 2^20."""
    from webindex.relational import hash_partitioned_groupby
    from webindex.textstats import chunk_documents

    paras = chunk_documents(
        docs_ds, max_tokens=para_tokens, overlap=0,
        id_col=id_col, text_col=text_col,
    )

    def win_partial(df: pd.DataFrame) -> pd.DataFrame:
        k = (
            df[id_col].to_numpy(np.int64) << _PARA_SHIFT
        ) | df["chunk_id"].to_numpy(np.int64)
        out = pd.DataFrame({"chunk_text": df["chunk_text"], "k": k})
        return (
            out.groupby("chunk_text", sort=False)["k"].min().reset_index()
        )

    def win_final(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby("chunk_text", sort=False)["k"].min().reset_index()
        w[id_col] = (w["k"].to_numpy(np.int64) >> _PARA_SHIFT)
        w["para_id"] = (
            w["k"].to_numpy(np.int64) & ((1 << _PARA_SHIFT) - 1)
        )
        return w[[id_col, "para_id", "chunk_text"]]

    winners = hash_partitioned_groupby(
        paras, ["chunk_text"], win_partial, win_final, n_parts=n_parts
    )

    def markers(batch: pa.Table) -> pa.Table:
        from webindex.textstats import _ASCII_TOK_RE

        texts = batch.column(text_col).to_pylist()
        n_paras = [
            -(-len(_ASCII_TOK_RE.findall((t or "").lower()))
              // para_tokens)
            for t in texts
        ]
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "para_id": pa.array([-1] * len(texts), pa.int64()),
                "chunk_text": pa.array([""] * len(texts), pa.string()),
                "n_paras": pa.array(n_paras, pa.int64()),
            }
        )

    marker_ds = docs_ds.map_batches(markers, batch_format="pyarrow")

    def as_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_paras"] = np.int64(0)
        return df[[id_col, "para_id", "chunk_text", "n_paras"]]

    union = winners.map_batches(as_rows, batch_format="pandas").union(
        marker_ds
    )

    def rebuild_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        o_id, o_text, o_kept, o_np = [], [], [], []
        for did, sub in g.groupby(id_col, sort=False):
            kept = sub[sub["para_id"] >= 0].sort_values("para_id")
            o_id.append(did)
            o_text.append(" ".join(kept["chunk_text"].tolist()))
            o_kept.append(len(kept))
            o_np.append(int(sub["n_paras"].max()))
        return pd.DataFrame(
            {
                id_col: np.asarray(o_id, np.int64),
                text_col: o_text,
                "n_kept": np.asarray(o_kept, np.int64),
                "n_paras": np.asarray(o_np, np.int64),
            }
        )

    return hash_partitioned_groupby(
        union, [id_col], rebuild_partial, rebuild, n_parts=n_parts
    )
