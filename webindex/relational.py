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
