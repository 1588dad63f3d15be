"""Exact distributed per-group median via rank selection.

``groupby(key).median()`` is the aggregate Ray Data cannot express
scale-safely: an exact median needs global rank information, and the
naive ``map_groups(np.median)`` ships EVERY row of a group to one worker
— a single hot key at corpus scale is billions of rows. This module
implements the classic distributed selection instead:

1. one counting pass for per-key (n, min, max);
2. binary search on the value domain — each round one vectorized
   counting pass (#rows touched per round: all, but only counts cross
   the wire: #keys x #blocks small rows), narrowing a per-key bracket
   that holds the target rank(s). The midpoint is taken in IEEE-754
   ORDERED-BIT space, not value space, so the search is guaranteed to
   converge in <= 64 rounds regardless of value distribution (a 1e300
   outlier over a dense cluster would defeat an arithmetic midpoint);
3. when a key's bracket holds few enough values, a bounded final pull
   selects the exact rank(s) driver-side; a bracket that degenerates to
   adjacent floats IS the answer (duplicate mass) and never pulls.

NaN values are skipped (pandas/SQL NULL convention); an all-NaN group
yields NaN. For an even group the median is the mean of ranks (n-1)//2
and n//2 (numpy/DuckDB ``median`` semantics). When a round's count
splits the two middle ranks, one extra pass resolves it exactly as
(max value <= mid + min value > mid) / 2 — no pull needed.

Determinism: counts are integers, the bracket update is exact integer
arithmetic on ordered float bits, and the final selection is a sort of
exact values — independent of partitioning and worker order. Keys keep
their native dtype end-to-end (int keys stay int).

The input should be pre-projected to (key, value) columns; pass a
``materialize()``-d dataset when the upstream is expensive, since each
round re-executes the plan (the standard iterative-algorithm pattern).
The per-key state lives on the driver: key cardinality must be driver-
sized (the usual assumption for a per-group scalar aggregate result).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_M64 = (1 << 64) - 1
_SIGN = 1 << 63


def _f2k(x: float) -> int:
    """float64 -> orderable uint64 key (monotonic with float ordering)."""
    u = int(np.float64(x).view(np.uint64))
    return (u ^ _SIGN) if not (u >> 63) else ((~u) & _M64)


def _k2f(k: int) -> float:
    u = (k ^ _SIGN) if (k >> 63) else ((~k) & _M64)
    return float(np.uint64(u).view(np.float64))


def _bit_mid(lo: float, hi: float) -> float:
    """Midpoint in ordered-bit space: halves the number of representable
    floats in the bracket every round -> <= 64 rounds to adjacency."""
    return _k2f((_f2k(lo) + _f2k(hi)) // 2)


def _kv_frame(batch: pa.Table, key: str, value_col: str) -> pd.DataFrame:
    """(key, value) pandas frame with NaN values dropped (NULL skip)."""
    df = pd.DataFrame(
        {
            "k": batch.column(key).to_pandas(),
            "v": batch.column(value_col).to_numpy(zero_copy_only=False),
        }
    )
    return df[df["v"].notna()]


def _empty_key_array(batch: pa.Table, key: str) -> pa.Array:
    return batch.column(key).slice(0, 0).combine_chunks()


def _count_pass(ds, key: str, value_col: str, state: pd.DataFrame):
    """One vectorized counting round: per key, #values <= mid and
    #values in (lo, hi]. Only #keys x #blocks count rows leave workers."""
    mids = state["mid"].to_dict()
    los = state["lo"].to_dict()
    his = state["hi"].to_dict()

    def count(batch: pa.Table) -> pa.Table:
        df = _kv_frame(batch, key, value_col)
        df = df[df["k"].isin(mids)]
        if df.empty:
            return pa.table(
                {key: _empty_key_array(batch, key),
                 "c_mid": pa.array([], pa.int64()),
                 "c_in": pa.array([], pa.int64())}
            )
        mid = df["k"].map(mids)
        lo = df["k"].map(los)
        hi = df["k"].map(his)
        df = df.assign(
            le_mid=(df["v"] <= mid).astype(np.int64),
            in_win=((df["v"] > lo) & (df["v"] <= hi)).astype(np.int64),
        )
        g = df.groupby("k", sort=False).agg(
            c_mid=("le_mid", "sum"), c_in=("in_win", "sum")
        ).reset_index()
        return pa.table(
            {key: pa.array(g["k"]),
             "c_mid": pa.array(g["c_mid"], pa.int64()),
             "c_in": pa.array(g["c_in"], pa.int64())}
        )

    parts = ds.map_batches(count, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({key: [], "c_mid": [], "c_in": []})
    return parts.groupby(key, sort=False).sum().reset_index()


def grouped_median(ds, key: str, value_col: str, *,
                   pull_threshold: int = 65536, max_rounds: int = 80):
    """Exact per-key median -> pandas DataFrame (key, median).

    ``pull_threshold`` bounds how many in-bracket values one key may pull
    to the driver at the end (the memory guarantee the map_groups version
    cannot give).
    """
    # pass 0: per-key n/min/max (partial per batch, tiny reduce). Keys are
    # taken from ALL rows (an all-NaN group must still appear in the
    # result, like a SQL GROUP BY with a NULL median); n/min/max skip NaN.
    def stats(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": batch.column(key).to_pandas(),
                "v": batch.column(value_col).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("k", sort=False).agg(
            n=("v", "count"), mn=("v", "min"), mx=("v", "max")
        ).reset_index()
        return pa.table(
            {key: pa.array(g["k"]),
             "n": pa.array(g["n"], pa.int64()),
             "mn": pa.array(g["mn"], pa.float64()),
             "mx": pa.array(g["mx"], pa.float64())}
        )

    st = (
        ds.map_batches(stats, batch_format="pyarrow")
        .to_pandas()
        .groupby(key, sort=False)
        .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        .reset_index()
    )
    st["k1"] = (st["n"] - 1) // 2  # 0-indexed lower middle rank
    st["k2"] = st["n"] // 2  # upper middle rank (== k1 for odd n)
    # bracket invariant: cnt(<= lo) <= k1 and cnt(<= hi) >= k2 + 1
    # (lo starts just below min so the min itself stays inside)
    st["lo"] = np.nextafter(st["mn"].to_numpy(), -np.inf)
    st["hi"] = st["mx"]
    st["median"] = np.nan
    st["pull"] = False
    st["split_mid"] = np.nan
    st["done"] = st["n"] == 0  # all-NaN / empty group -> NaN (NULL)
    one = st["mn"] == st["mx"]  # single-value groups short-circuit
    st.loc[one, "median"] = st.loc[one, "mn"]
    st.loc[one, "done"] = True

    for _ in range(max_rounds):
        live = st[~st["done"]].copy()
        if live.empty:
            break
        live["mid"] = [
            _bit_mid(lo, hi) for lo, hi in zip(live["lo"], live["hi"])
        ]
        # bit fixpoint: lo and hi are adjacent representable floats ->
        # both middle ranks sit on hi (duplicate mass), no pull
        fix = live["mid"] <= live["lo"]
        if fix.any():
            idx = live.index[fix]
            st.loc[idx, "median"] = st.loc[idx, "hi"]
            st.loc[idx, "done"] = True
            live = live[~fix]
            if live.empty:
                continue
        counts = _count_pass(
            ds, key, value_col, live.set_index(key)[["mid", "lo", "hi"]]
        )
        cm = counts.set_index(key)["c_mid"]
        ci = counts.set_index(key)["c_in"]
        for idx, row in live.iterrows():
            kname = row[key]
            c = int(cm.get(kname, 0))
            n_in = int(ci.get(kname, 0))
            k1, k2 = int(row["k1"]), int(row["k2"])
            if n_in <= pull_threshold:
                st.loc[idx, "pull"] = True
                st.loc[idx, "done"] = True
                continue
            if c <= k1:
                st.loc[idx, "lo"] = row["mid"]
            elif c >= k2 + 1:
                st.loc[idx, "hi"] = row["mid"]
            else:
                # k1 < c <= k2 (even n): mid splits the two middle ranks;
                # resolve exactly as (max <= mid) and (min > mid)
                st.loc[idx, "split_mid"] = row["mid"]
                st.loc[idx, "done"] = True

    if (~st["done"]).any():
        # bit bisection reaches adjacency in <= 64 rounds; hitting this
        # means max_rounds was lowered below that
        stuck = st.loc[~st["done"], key].tolist()
        raise RuntimeError(
            f"grouped_median: selection did not converge for keys {stuck} "
            f"within max_rounds={max_rounds}"
        )

    # resolve split keys: one extremum pass
    split = st[st["split_mid"].notna()]
    if not split.empty:
        smids = split.set_index(key)["split_mid"].to_dict()

        def extrema(batch: pa.Table) -> pa.Table:
            df = _kv_frame(batch, key, value_col)
            df = df[df["k"].isin(smids)]
            if df.empty:
                return pa.table(
                    {key: _empty_key_array(batch, key),
                     "below": pa.array([], pa.float64()),
                     "above": pa.array([], pa.float64())}
                )
            m = df["k"].map(smids)
            lo_side = df[df["v"] <= m].groupby("k", sort=False)[
                "v"
            ].max().rename("below")
            hi_side = df[df["v"] > m].groupby("k", sort=False)[
                "v"
            ].min().rename("above")
            g = pd.concat([lo_side, hi_side], axis=1).reset_index()
            return pa.table(
                {key: pa.array(g["k"]),
                 "below": pa.array(g["below"], pa.float64()),
                 "above": pa.array(g["above"], pa.float64())}
            )

        ext = (
            ds.map_batches(extrema, batch_format="pyarrow")
            .to_pandas()
            .groupby(key, sort=False)
            .agg(below=("below", "max"), above=("above", "min"))
        )
        for idx, row in split.iterrows():
            e = ext.loc[row[key]]
            st.loc[idx, "median"] = (
                float(e["below"]) + float(e["above"])
            ) / 2.0

    # final bounded pull for bracketed keys
    pulls = st[st["pull"]]
    if not pulls.empty:
        bounds = pulls.set_index(key)[["lo", "hi"]]
        lod, hid = bounds["lo"].to_dict(), bounds["hi"].to_dict()

        def window(batch: pa.Table) -> pa.Table:
            df = _kv_frame(batch, key, value_col)
            df = df[df["k"].isin(lod)]
            if df.empty:
                return pa.table(
                    {key: _empty_key_array(batch, key),
                     "v": pa.array([], pa.float64())}
                )
            lo = df["k"].map(lod)
            hi = df["k"].map(hid)
            df = df[(df["v"] > lo) & (df["v"] <= hi)]
            return pa.table(
                {key: pa.array(df["k"]),
                 "v": pa.array(df["v"], pa.float64())}
            )

        vals = ds.map_batches(window, batch_format="pyarrow").to_pandas()
        grouped = (
            dict(tuple(vals.groupby(key, sort=False)))
            if not vals.empty else {}
        )
        # ranks are global; within the bracket the target local ranks are
        # k - cnt(<= lo). cnt(<= lo) needs one more counting pass.
        lo_state = pulls.set_index(key)[["lo"]].copy()
        lo_state["mid"] = lo_state["lo"]
        lo_state["hi"] = lo_state["lo"]
        counts_below = _count_pass(ds, key, value_col, lo_state)
        cb = (
            counts_below.set_index(key)["c_mid"]
            if not counts_below.empty else pd.Series(dtype=np.int64)
        )
        for idx, row in pulls.iterrows():
            kname = row[key]
            g = grouped.get(kname)
            v = np.sort(g["v"].to_numpy()) if g is not None else np.empty(0)
            below = int(cb.get(kname, 0))
            k1l = int(row["k1"]) - below
            k2l = int(row["k2"]) - below
            st.loc[idx, "median"] = (float(v[k1l]) + float(v[k2l])) / 2.0

    out = st[[key, "median"]].copy()
    return out.sort_values(key).reset_index(drop=True)


def grouped_quantile_disc(ds, key: str, value_col: str,
                          frac: tuple[int, int], *,
                          pull_threshold: int = 65536,
                          max_rounds: int = 80):
    """Exact per-key NEAREST-RANK quantile: the ``ceil(num·n/den)``-th
    smallest value (1-based) of each key's non-NaN values — the discrete
    quantile (DuckDB ``quantile_disc``, the facet_percentiles rule),
    selected distributedly by the same ordered-bit rank-selection rounds
    as :func:`grouped_median` (one counting pass per round, a bounded
    final pull). ``frac = (num, den)`` keeps the target rank in exact
    integer arithmetic (``(1, 3)`` = lower tercile) so both engines
    agree on the rank itself. Returns pandas ``(key, value)``; empty
    groups yield NaN. Unlike the median there is no two-rank averaging:
    a bracket that degenerates to adjacent floats resolves to ``hi``."""
    num, den = frac
    if not (0 < num < den):
        raise ValueError("frac must satisfy 0 < num < den")

    def stats(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": batch.column(key).to_pandas(),
                "v": batch.column(value_col).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("k", sort=False).agg(
            n=("v", "count"), mn=("v", "min"), mx=("v", "max")
        ).reset_index()
        return pa.table(
            {key: pa.array(g["k"]),
             "n": pa.array(g["n"], pa.int64()),
             "mn": pa.array(g["mn"], pa.float64()),
             "mx": pa.array(g["mx"], pa.float64())}
        )

    st = (
        ds.map_batches(stats, batch_format="pyarrow")
        .to_pandas()
        .groupby(key, sort=False)
        .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        .reset_index()
    )
    st["k1"] = -(-(st["n"] * num) // den)  # 1-based target rank
    st["lo"] = np.nextafter(st["mn"].to_numpy(), -np.inf)
    st["hi"] = st["mx"]
    st["value"] = np.nan
    st["pull"] = False
    st["done"] = st["n"] == 0
    one = st["mn"] == st["mx"]
    st.loc[one & ~st["done"], "value"] = st.loc[one & ~st["done"], "mn"]
    st.loc[one, "done"] = True

    for _ in range(max_rounds):
        live = st[~st["done"]].copy()
        if live.empty:
            break
        live["mid"] = [
            _bit_mid(lo, hi) for lo, hi in zip(live["lo"], live["hi"])
        ]
        fix = live["mid"] <= live["lo"]
        if fix.any():
            idx = live.index[fix]
            st.loc[idx, "value"] = st.loc[idx, "hi"]
            st.loc[idx, "done"] = True
            live = live[~fix]
            if live.empty:
                continue
        counts = _count_pass(
            ds, key, value_col, live.set_index(key)[["mid", "lo", "hi"]]
        )
        cm = counts.set_index(key)["c_mid"]
        ci = counts.set_index(key)["c_in"]
        for idx, row in live.iterrows():
            kname = row[key]
            c = int(cm.get(kname, 0))
            n_in = int(ci.get(kname, 0))
            k1 = int(row["k1"])
            if n_in <= pull_threshold:
                st.loc[idx, "pull"] = True
                st.loc[idx, "done"] = True
                continue
            # invariant: cnt(<= lo) <= k1 - 1 and cnt(<= hi) >= k1
            if c <= k1 - 1:
                st.loc[idx, "lo"] = row["mid"]
            else:
                st.loc[idx, "hi"] = row["mid"]

    if (~st["done"]).any():
        stuck = st.loc[~st["done"], key].tolist()
        raise RuntimeError(
            f"grouped_quantile_disc: no convergence for keys {stuck} "
            f"within max_rounds={max_rounds}"
        )

    pulls = st[st["pull"]]
    if not pulls.empty:
        bounds = pulls.set_index(key)[["lo", "hi"]]
        lod, hid = bounds["lo"].to_dict(), bounds["hi"].to_dict()

        def window(batch: pa.Table) -> pa.Table:
            df = _kv_frame(batch, key, value_col)
            df = df[df["k"].isin(lod)]
            if df.empty:
                return pa.table(
                    {key: _empty_key_array(batch, key),
                     "v": pa.array([], pa.float64())}
                )
            lo = df["k"].map(lod)
            hi = df["k"].map(hid)
            df = df[(df["v"] > lo) & (df["v"] <= hi)]
            return pa.table(
                {key: pa.array(df["k"]),
                 "v": pa.array(df["v"], pa.float64())}
            )

        vals = ds.map_batches(window, batch_format="pyarrow").to_pandas()
        grouped = (
            dict(tuple(vals.groupby(key, sort=False)))
            if not vals.empty else {}
        )
        lo_state = pulls.set_index(key)[["lo"]].copy()
        lo_state["mid"] = lo_state["lo"]
        lo_state["hi"] = lo_state["lo"]
        counts_below = _count_pass(ds, key, value_col, lo_state)
        cb = (
            counts_below.set_index(key)["c_mid"]
            if not counts_below.empty else pd.Series(dtype=np.int64)
        )
        for idx, row in pulls.iterrows():
            kname = row[key]
            g = grouped.get(kname)
            v = np.sort(g["v"].to_numpy()) if g is not None else np.empty(0)
            below = int(cb.get(kname, 0))
            st.loc[idx, "value"] = float(v[int(row["k1"]) - below - 1])

    out = st[[key, "value"]].copy()
    return out.sort_values(key).reset_index(drop=True)
