"""High-cardinality grouped aggregation: hash-partitioned, vectorized.

Ray Data's built-in ``groupby().aggregate()`` degrades when the number of
distinct keys approaches the number of rows (per-key reduce overhead). The
scalable shape used across this repo instead:

  map_batches(partial_agg)        # combiner: one vectorized pandas groupby
                                  # per batch -> one row per (key, batch)
  -> add part = hash(keys) % P    # every key lands wholly in one partition
  -> groupby("part").map_groups(final_agg)   # P vectorized pandas groupbys

Only the (much smaller) partials cross the shuffle, and Python is invoked
P times, not once per key. P should be ~2-4x the cluster cores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .util import stable_hash64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _int_key_u64(arr, col: str) -> np.ndarray:
    """Arrow integer ChunkedArray -> uint64 numpy, REFUSING nulls.

    ``to_numpy()`` on a nulled int array silently yields float64 with
    NaN, whose uint64 cast is undefined — nondeterministic partition
    assignment instead of a loud error. Every hash-partition key path
    routes through here."""
    if arr.null_count:
        raise ValueError(
            f"null value in integer join/partition key column {col!r} "
            f"({arr.null_count} nulls) — drop or fill nulls before "
            "hash-partitioning"
        )
    return arr.to_numpy().astype(np.uint64)


def _key_hash(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        col = df[k]
        if str(col.dtype).startswith("datetime"):
            v = col.astype("int64").to_numpy().astype(np.uint64)
        elif col.dtype == object:
            # Python's hash() is per-process randomized (PYTHONHASHSEED);
            # partition assignment must agree across Ray workers.
            v = np.fromiter(
                (stable_hash64(str(x)) for x in col),
                dtype=np.uint64, count=len(col),
            )
        else:
            v = col.to_numpy().astype(np.uint64)
        h = (h ^ v) * _MIX
    return h


def hash_partitioned_groupby(ds, keys: list[str], partial_fn, final_fn,
                             n_parts: int = 64):
    """``partial_fn(df) -> partial rows`` (must include ``keys``),
    ``final_fn(df) -> final rows`` (applied per hash partition)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = partial_fn(df)
        out = out.reset_index(drop=True)
        out["_part"] = (_key_hash(out, keys) % n_parts).astype(np.int32)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return final_fn(g.drop(columns=["_part"]))

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(final, batch_format="pandas")
    )


def hash_partitioned_groupby_arrow(ds, keys: list[str], partial_fn,
                                   final_fn, n_parts: int = 64):
    """Arrow-native sibling of :func:`hash_partitioned_groupby`:
    ``partial_fn`` / ``final_fn`` take and return ``pyarrow.Table`` — no
    pandas block hop, which for string-heavy tables (anchor text) drops
    an object-dtype copy per block on both sides of the shuffle. Same
    partitioning rule (xor-mix of key columns, strings via
    stable_hash64)."""
    import pyarrow as pa

    def _hash_tab(t: "pa.Table") -> np.ndarray:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for k in keys:
            col = t.column(k)
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                col.type
            ):
                v = np.fromiter(
                    (stable_hash64(x) for x in col.to_pylist()),
                    dtype=np.uint64, count=t.num_rows,
                )
            elif pa.types.is_timestamp(col.type):
                v = col.cast(pa.int64()).to_numpy().astype(np.uint64)
            else:
                v = col.to_numpy().astype(np.uint64)
            h = (h ^ v) * _MIX
        return h

    def partial(t):
        out = partial_fn(t)
        part = (_hash_tab(out) % n_parts).astype(np.int32)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def final(g):
        return final_fn(g.drop_columns(["_part"]))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_topk(ds, keys: list[str], order_col: str, k: int, *,
                 descending: bool = True, tie_cols: list[str] | None = None,
                 n_parts: int = 64):
    """Per-group top-k rows (the grouped variant of the chunked-top-k
    pattern, SURVEY.md §2.6 K1): each batch keeps only its LOCAL top-k per
    key (a valid superset of the global winners — any global top-k row is
    in its own batch's top-k), so at most k x #keys rows per batch cross
    the shuffle; the final per-partition pass re-ranks exactly.

    Deterministic: ties on ``order_col`` break by ``tie_cols`` ascending
    (required — a top-k cut without a total order is partition-dependent).
    Output adds an int32 ``rank`` column (1-based).
    """
    if not tie_cols:
        raise ValueError("grouped_topk: tie_cols is required for a "
                         "partition-independent cut")
    sort_cols = keys + [order_col] + tie_cols
    asc = [True] * len(keys) + [not descending] + [True] * len(tie_cols)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=asc, kind="mergesort")
        return df.groupby(keys, sort=False).head(k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=asc, kind="mergesort")
        out = df.groupby(keys, sort=False).head(k).reset_index(drop=True)
        out["rank"] = (
            out.groupby(keys, sort=False).cumcount() + 1
        ).astype(np.int32)
        return out

    return hash_partitioned_groupby(ds, keys, topk, final, n_parts=n_parts)


def _md5_prefix(key: str, salt: str = "") -> str:
    from hashlib import md5

    return md5((salt + key).encode("utf-8")).hexdigest()[:8]


def deterministic_sample(ds, frac: float, *, key_col: str = "doc_id",
                         salt: str = ""):
    """Deterministic content-hash sampling: keep a row iff the first 8 hex
    chars of ``md5(salt + str(key))`` fall below ``frac`` of the hash
    space. Partition- and engine-independent (DuckDB's ``md5()`` produces
    the identical digest, and fixed-width lowercase hex compares
    lexicographically like the number it encodes), repeatable across
    runs, and a superset/subset relation holds across fracs — the
    properties a training-data subsampling step needs that
    ``Dataset.random_sample`` cannot give. Stateless ``map_batches``; no
    shuffle.
    """
    thresh = format(min(int(frac * 16**8), 16**8), "08x")

    def keep(batch):
        import pyarrow as pa

        keys = batch.column(key_col).to_pylist()
        m = [_md5_prefix(str(k), salt) < thresh for k in keys]
        return batch.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, strata_col: str, fracs: dict, *,
                      default_frac: float = 0.0, key_col: str = "doc_id",
                      salt: str = ""):
    """Per-stratum deterministic sampling (e.g. per-language quotas in a
    corpus mix): each row's keep-threshold comes from its stratum's frac.
    Same md5-prefix rule as :func:`deterministic_sample`, so strata can
    be re-balanced later and previously-kept rows stay kept whenever a
    stratum's frac only grows."""
    th = {
        k: format(min(int(f * 16**8), 16**8), "08x")
        for k, f in fracs.items()
    }
    th_default = format(min(int(default_frac * 16**8), 16**8), "08x")

    def keep(batch):
        import pyarrow as pa

        keys = batch.column(key_col).to_pylist()
        strata = batch.column(strata_col).to_pylist()
        m = [
            _md5_prefix(str(k), salt) < th.get(s, th_default)
            for k, s in zip(keys, strata)
        ]
        return batch.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_join_attach(rows_ds, key_col: str, side_ds, val_cols: list[str],
                     *, rows_types: dict, val_types: dict,
                     n_parts: int = 64, out_prefix: str = "",
                     side_key: str | None = None):
    """Inner hash-join ``val_cols`` from ``side_ds`` (key_col, *val_cols)
    onto ``rows_ds`` — the repo's padded-union + hash-partition +
    per-partition vectorized merge shape (never ``Dataset.join``; see
    dedup.attach_pair_payloads for why). ONE shuffle for both sides;
    nothing materializes on the driver. ``rows_types`` / ``val_types``
    are {col: pa.DataType} (callers know their schemas statically — a
    schema probe would execute a one-block prefix). String or int keys.
    """
    import pyarrow as pa

    row_cols = list(rows_types)
    new_cols = [out_prefix + c for c in val_cols]
    side_key = side_key or key_col

    def key_hash(arr: "pa.ChunkedArray", n: int) -> np.ndarray:
        if pa.types.is_integer(arr.type):
            h = _int_key_u64(arr, f"{key_col} (or side {side_key})") * _MIX
        else:
            h = np.fromiter(
                (stable_hash64(str(x)) for x in arr.to_pylist()),
                dtype=np.uint64, count=n,
            )
        return ((h >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32)

    def tag_rows(batch: pa.Table) -> pa.Table:
        cols = {
            "_part": pa.array(key_hash(batch.column(key_col),
                                       batch.num_rows)),
            "_kind": pa.array(np.ones(batch.num_rows, np.int8)),
        }
        for c in row_cols:
            cols[c] = batch.column(c)
        for c, nc in zip(val_cols, new_cols):
            cols[nc] = pa.nulls(batch.num_rows, val_types[c])
        return pa.table(cols)

    def tag_side(batch: pa.Table) -> pa.Table:
        cols = {
            "_part": pa.array(key_hash(batch.column(side_key),
                                       batch.num_rows)),
            "_kind": pa.array(np.zeros(batch.num_rows, np.int8)),
        }
        for c in row_cols:
            if c == key_col:
                cols[c] = batch.column(side_key)
            else:
                cols[c] = pa.nulls(batch.num_rows, rows_types[c])
        for c, nc in zip(val_cols, new_cols):
            cols[nc] = batch.column(c)
        return pa.table(cols)

    import pyarrow as _pa

    tagged = rows_ds.map_batches(tag_rows, batch_format="pyarrow").union(
        side_ds.map_batches(tag_side, batch_format="pyarrow")
    )

    def join_group(g: "_pa.Table") -> "_pa.Table":
        kind = g.column("_kind").to_numpy()
        pay = g.filter(_pa.array(kind == 0))
        rows = g.filter(_pa.array(kind == 1)).drop_columns(
            ["_part", "_kind"] + new_cols
        )
        if rows.num_rows == 0 or pay.num_rows == 0:
            empty = {c: rows.column(c).slice(0, 0) for c in row_cols}
            for c, nc in zip(val_cols, new_cols):
                empty[nc] = _pa.nulls(0, val_types[c])
            return _pa.table(empty)
        pk = pay.column(key_col)
        rk = rows.column(key_col)
        if _pa.types.is_integer(pk.type):
            pk_np, rk_np = pk.to_numpy(), rk.to_numpy()
        else:
            pk_np = np.asarray(pk.to_pylist(), dtype=object)
            rk_np = np.asarray(rk.to_pylist(), dtype=object)
        order = np.argsort(pk_np, kind="stable")
        pk_sorted = pk_np[order]
        pos = np.searchsorted(pk_sorted, rk_np)
        pos = np.minimum(pos, pk_sorted.size - 1)
        hit = pk_sorted[pos] == rk_np
        rows_f = rows.filter(_pa.array(hit))
        taken = pay.take(_pa.array(order[pos[hit]], _pa.int64()))
        cols = {c: rows_f.column(c) for c in row_cols}
        for c, nc in zip(val_cols, new_cols):
            cols[nc] = taken.column(nc)
        return _pa.table(cols)

    return tagged.groupby("_part").map_groups(
        join_group, batch_format="pyarrow"
    )


def hash_semi_join(rows_ds, key_col: str, side_ds, *, rows_types: dict,
                   n_parts: int = 64, side_key: str | None = None,
                   anti: bool = False):
    """Semi-join (``anti=False``: keep rows whose key appears in
    ``side_ds``) or anti-join (``anti=True``: keep rows whose key does
    NOT) — the same padded-union + hash-partition shape as
    :func:`hash_join_attach`, ONE shuffle for both sides, nothing on
    the driver. The canonical consumer is dedup key-removal: docs minus
    a Dataset of dropped doc_ids (set difference, D4 at scale)."""
    import pyarrow as pa

    row_cols = list(rows_types)
    side_key = side_key or key_col

    def key_hash(arr: "pa.ChunkedArray", n: int) -> np.ndarray:
        if pa.types.is_integer(arr.type):
            h = _int_key_u64(arr, f"{key_col} (or side {side_key})") * _MIX
        else:
            h = np.fromiter(
                (stable_hash64(str(x)) for x in arr.to_pylist()),
                dtype=np.uint64, count=n,
            )
        return ((h >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32)

    def tag_rows(batch: pa.Table) -> pa.Table:
        cols = {
            "_part": pa.array(key_hash(batch.column(key_col),
                                       batch.num_rows)),
            "_kind": pa.array(np.ones(batch.num_rows, np.int8)),
        }
        for c in row_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def tag_side(batch: pa.Table) -> pa.Table:
        cols = {
            "_part": pa.array(key_hash(batch.column(side_key),
                                       batch.num_rows)),
            "_kind": pa.array(np.zeros(batch.num_rows, np.int8)),
        }
        for c in row_cols:
            if c == key_col:
                cols[c] = batch.column(side_key)
            else:
                cols[c] = pa.nulls(batch.num_rows, rows_types[c])
        return pa.table(cols)

    tagged = rows_ds.map_batches(tag_rows, batch_format="pyarrow").union(
        side_ds.map_batches(tag_side, batch_format="pyarrow")
    )

    def join_group(g: "pa.Table") -> "pa.Table":
        kind = g.column("_kind").to_numpy()
        rows = g.filter(pa.array(kind == 1)).drop_columns(
            ["_part", "_kind"]
        )
        keys = g.filter(pa.array(kind == 0)).column(key_col)
        if rows.num_rows == 0:
            return rows
        if keys.length() == 0:
            return rows.slice(0, 0) if not anti else rows
        rk = rows.column(key_col)
        if pa.types.is_integer(rk.type):
            kk = np.sort(keys.to_numpy())
            rk_np = rk.to_numpy()
            pos = np.searchsorted(kk, rk_np)
            pos = np.minimum(pos, kk.size - 1)
            hit = kk[pos] == rk_np
        else:
            # Arrow-native membership (hash set in C++), no Python rows
            import pyarrow.compute as pc

            hit = pc.is_in(
                rk, value_set=keys.combine_chunks()
                if isinstance(keys, pa.ChunkedArray) else keys
            ).to_numpy(zero_copy_only=False)
        return rows.filter(pa.array(~hit if anti else hit))

    return tagged.groupby("_part").map_groups(
        join_group, batch_format="pyarrow"
    )


def temperature_mix(docs_ds, *, source_col: str = "source",
                    text_col: str = "text", key_col: str = "doc_id",
                    n_parts: int = 64, salt: str = ""):
    """Temperature-based data mixing at T = 0.5 (the PaLM/GPT corpus-mix
    recipe, public methodology: sample source s proportionally to
    ``n_s^T`` so big sources stop drowning small ones). Expected kept
    tokens ~ sqrt(n_s): each source keeps the deterministic md5-prefix
    fraction ``sqrt(n_min / n_s)`` (the smallest source keeps ~all).

    T is pinned to 0.5 because sqrt is the one libm operation IEEE-754
    requires to be correctly rounded — the derived per-source thresholds
    are bit-identical in numpy, CPython, and DuckDB, so the sampled SET
    is engine-portable (general ``pow`` is not). Token counts are exact
    int64 partials (one combiner + one hash-partitioned merge); the
    per-source table is value-domain-bounded; the filter is the same
    md5-prefix rule as :func:`deterministic_sample` (stateless, no
    shuffle, repeatable, monotone across re-mixes)."""
    import math

    import pandas as pd

    from webindex.textstats import _ASCII_TOK_RE

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = np.fromiter(
            (len(_ASCII_TOK_RE.findall((t or "").lower()))
             for t in df[text_col]),
            dtype=np.int64, count=len(df),
        )
        out = pd.DataFrame(
            {source_col: df[source_col].to_numpy(), "n": n_tok}
        )
        return out.groupby(source_col, sort=False).sum().reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(source_col, sort=False).sum().reset_index()

    counts = hash_partitioned_groupby(
        docs_ds.map_batches(
            lambda t: t.select([key_col, text_col, source_col]),
            batch_format="pyarrow",
        ),
        [source_col], partial, final, n_parts=n_parts,
    ).to_pandas()  # bounded: one row per source
    n_by_src = dict(zip(counts[source_col], counts["n"].astype(int)))
    n_min = min(n_by_src.values())
    fracs = {
        s: math.sqrt(n_min / n) for s, n in n_by_src.items()
    }
    # threshold clamp: frac == 1.0 would format to 9 hex chars and break
    # the fixed-width string compare — cap at the max 8-char prefix
    th = {
        s: format(min(int(f * 16**8), 16**8 - 1), "08x")
        for s, f in fracs.items()
    }

    def keep(batch):
        import pyarrow as pa

        keys = batch.column(key_col).to_pylist()
        srcs = batch.column(source_col).to_pylist()
        m = [
            _md5_prefix(str(k), salt) < th.get(s, "00000000")
            for k, s in zip(keys, srcs)
        ]
        return batch.select([key_col, source_col]).filter(pa.array(m))

    return docs_ds.map_batches(
        lambda t: t.select([key_col, text_col, source_col]),
        batch_format="pyarrow",
    ).map_batches(keep, batch_format="pyarrow")
