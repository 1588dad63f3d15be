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
