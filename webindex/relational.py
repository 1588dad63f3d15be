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
