"""Temporal operators Ray Data lacks natively: as-of join + sliding window.

Two of the "custom operators" the engine needs beyond the reference's own
inventory (SURVEY.md §2 extension surface; the reference joins runs/qrels
on exact keys only — e.g. /root/reference/biencoder/beir/beir_dense_retriever.py
evaluation joins — and has no temporal alignment at all):

- ``asof_join``: each left row matched to the right row with the same key
  and the greatest timestamp <= the left row's timestamp (inner: unmatched
  left rows drop). Semantics of DuckDB's ``ASOF JOIN`` / pandas
  ``merge_asof(direction="backward")``, re-expressed Ray-Data-first.
- ``range_join``: all same-key pairs with ``right_ts <= left_ts <
  right_ts + window`` (attribution-window inequality join), bin-replicated
  so the shuffle key includes time.
- ``sliding_window_agg``: trailing ROWS-window aggregate (mean/sum) over a
  per-key ordered series — SQL ``AVG(v) OVER (PARTITION BY key ORDER BY t
  ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``.

Partitioning assumption (documented per the scale contract): both inputs
are hash-partitioned by the join/group key, so one key's rows land wholly
in one partition and the per-partition kernel (vectorized
``pd.merge_asof`` / cumsum) sees every row it needs. A pathologically hot
key bounds the partition size; salt upstream if one key exceeds a worker's
heap. One all-to-all shuffle per input — the minimum any as-of join needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from webindex.util import stable_hash64

_PART_COL = "__asof_part"
_SIDE_COL = "__asof_side"


def _attach_part(ds, key: str, n_parts: int):
    """Stable content-hash partition id (never Python hash(): PYTHONHASHSEED
    randomization would split a key across Ray worker processes)."""

    def add(batch: pa.Table) -> pa.Table:
        keys = batch.column(key)
        if pa.types.is_integer(keys.type):
            ids = keys.to_numpy(zero_copy_only=False).astype(np.uint64)
            # splitmix64-style mix so consecutive int keys spread
            ids = ids * np.uint64(0x9E3779B97F4A7C15)
            part = (ids >> np.uint64(40)).astype(np.int64) % n_parts
        else:
            part = np.fromiter(
                (stable_hash64(str(k)) % n_parts for k in keys.to_pylist()),
                dtype=np.int64, count=len(keys),
            )
        return batch.append_column(_PART_COL, pa.array(part, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def _arrow_types(ds) -> dict:
    """name -> pa.DataType for Arrow- OR pandas-block datasets."""
    sch = ds.schema()
    out = {}
    for name, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            try:
                t = pa.from_numpy_dtype(t)
            except (pa.ArrowNotImplementedError, TypeError):
                t = pa.string()  # object dtype
        out[name] = t
    return out


def _restore_dtypes(out_names: list[str], types: dict) -> dict:
    """pandas dtypes to restore after a null-introducing union upcasts
    int/bool columns to float/object."""
    restore = {}
    for c in out_names:
        t = types[c]
        if pa.types.is_integer(t):
            restore[c] = t.to_pandas_dtype()
        elif pa.types.is_boolean(t):
            restore[c] = np.bool_
    return restore


_I53 = 1 << 53


def _join_schema(left_ds, right_ds, key: str, right_key: str,
                 right_ts: str, right_cols, op: str):
    """Shared temporal-join schema plan: canonical union column order,
    per-column arrow types (key keeps the left type), output names and
    the int/bool dtype-restore map. Raises on name collisions that would
    silently merge the two sides' payloads."""
    right_cols = right_cols or [
        c for c in right_ds.schema().names if c not in (right_key, right_ts)
    ]
    lmap = _arrow_types(left_ds)
    rmap_full = _arrow_types(right_ds)
    left_names = list(lmap)
    if right_ts in left_names:
        raise ValueError(
            f"{op}: right_ts column name collides with a left column; "
            "rename one side"
        )
    clash = set(right_cols) & set(left_names)
    if clash:
        raise ValueError(
            f"{op}: right payload columns {sorted(clash)} collide with "
            "left columns; rename one side"
        )
    rmap = {(key if c == right_key else c): rmap_full[c]
            for c in [right_key, right_ts] + right_cols}
    all_cols = list(lmap) + [c for c in rmap if c not in lmap]
    types = {**rmap, **lmap}  # key keeps the left type
    out_names = left_names + right_cols
    # the pandas group block holds each side's missing columns as nulls,
    # which upcasts int/bool to float/object; declared dtypes are restored
    # after the join filter removes every null
    restore = _restore_dtypes(out_names, types)
    return left_names, right_cols, all_cols, types, out_names, restore


def _conform_cols(batch: pa.Table, all_cols, types, op: str):
    """Select/cast the union schema, padding absent columns with typed
    nulls. Integer columns are guarded at ±2^53: the null-union upcasts
    them to float64 in the pandas group block, and a silent lossy
    round-trip would corrupt large ids (snowflake-style ~1e18) with no
    error — fail loudly instead."""
    import pyarrow.compute as pc

    n = batch.num_rows
    cols = []
    for c in all_cols:
        if c in batch.schema.names:
            col = batch.column(c).cast(types[c])
            if n and pa.types.is_integer(types[c]):
                mm = pc.min_max(col).as_py()
                if mm["min"] is not None and (
                    mm["min"] < -_I53 or mm["max"] > _I53
                ):
                    raise ValueError(
                        f"{op}: integer column {c!r} holds values beyond "
                        "±2^53; they would lose precision crossing the "
                        "null-union float upcast — cast to string upstream"
                    )
            cols.append(col)
        else:
            cols.append(pa.nulls(n, types[c]))
    return cols


def asof_join(left_ds, right_ds, *, key: str, left_ts: str, right_ts: str,
              right_key: str | None = None, right_cols: list[str] | None = None,
              n_parts: int = 32):
    """Backward as-of join -> Dataset of left columns + ``right_cols``.

    For each left row: the right row with ``right_key == key`` and the
    greatest ``right_ts <= left_ts``; left rows with no such right row are
    dropped (inner semantics, like DuckDB ``ASOF JOIN``). Ties on
    ``right_ts`` within a key must be resolved upstream (dedupe the right
    side) — ``pd.merge_asof`` keeps the last row in sort order, which is
    input-order-dependent; this function asserts uniqueness per group.

    Shape: one hash shuffle per side on the key, then a vectorized
    ``pd.merge_asof(by=key)`` per partition — many keys per group, no
    per-key Python loop.
    """
    right_key = right_key or key
    left_names, right_cols, all_cols, types, out_names, restore = (
        _join_schema(left_ds, right_ds, key, right_key, right_ts,
                     right_cols, "asof_join")
    )

    def conform(side: int, rename_from: str | None = None):
        def add(batch: pa.Table) -> pa.Table:
            if rename_from and rename_from != key:
                batch = batch.rename_columns(
                    [key if c == rename_from else c for c in batch.schema.names]
                )
            cols = _conform_cols(batch, all_cols, types, "asof_join")
            cols.append(pa.array(np.full(batch.num_rows, side, np.int8)))
            return pa.table(cols, names=all_cols + [_SIDE_COL])

        return add

    left_t = _attach_part(
        left_ds.map_batches(conform(0), batch_format="pyarrow"), key, n_parts
    )
    right_t = _attach_part(
        right_ds.map_batches(conform(1, rename_from=right_key),
                             batch_format="pyarrow"),
        key, n_parts,
    )

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g[_SIDE_COL] == 0]
        rt = g[g[_SIDE_COL] == 1]
        if lf.empty or rt.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype=restore.get(c, g[c].dtype))
                 for c in out_names}
            )
        lf = lf[left_names].sort_values(
            [left_ts, key], kind="mergesort"
        ).reset_index(drop=True)
        rt = rt[[key, right_ts] + right_cols].sort_values(
            [right_ts, key], kind="mergesort"
        ).reset_index(drop=True)
        if rt.duplicated([key, right_ts]).any():
            raise ValueError(
                "asof_join: right side has duplicate (key, ts) rows — "
                "dedupe upstream; the match would be input-order dependent"
            )
        # merge_asof requires identical on-key dtypes; parquet reads give
        # timestamp[us] while pandas-block upstreams give [ns] — align
        lt, rtt = lf[left_ts].dtype, rt[right_ts].dtype
        if lt != rtt:
            if str(lt).startswith("datetime64") and str(rtt).startswith(
                "datetime64"
            ):
                lf[left_ts] = lf[left_ts].astype("datetime64[ns]")
                rt[right_ts] = rt[right_ts].astype("datetime64[ns]")
            else:
                rt[right_ts] = rt[right_ts].astype(lt)
        out = pd.merge_asof(
            lf, rt, left_on=left_ts, right_on=right_ts, by=key,
            direction="backward",
        )
        out = out[out[right_ts].notna()]  # inner: unmatched left rows drop
        out = out[out_names].reset_index(drop=True)
        for c, t in restore.items():
            out[c] = out[c].astype(t)
        return out

    both = left_t.union(right_t)
    return both.groupby(_PART_COL).map_groups(join_part, batch_format="pandas")


def range_join(left_ds, right_ds, *, key: str, left_ts: str, right_ts: str,
               window, right_key: str | None = None,
               right_cols: list[str] | None = None, n_parts: int = 32):
    """Windowed range join: all (left, right) pairs with the same key and
    ``right_ts <= left_ts < right_ts + window`` (an attribution window) —
    the inequality-join shape SQL writes as ``ON l.key = r.key AND l.ts >=
    r.ts AND l.ts < r.ts + INTERVAL window`` and Ray Data has no operator
    for. Returns left columns + ``right_cols``; a left row matching k right
    rows emits k output rows.

    Scale shape (bin replication): time is cut into ``window``-width bins;
    each right row replicates to the two bins its window can overlap, each
    left row goes to its own bin, and pair generation is an exact
    vectorized filter inside one ``groupby((key_hash, bin))`` — the
    shuffle key includes time, so a key whose rows span a long period
    spreads over many partitions instead of hot-spotting one (the skew
    failure mode of sharding on key alone). Replication is exactly 2x the
    right side, independent of window length. Every (left, right) match is
    produced exactly once: the left row lives in one bin, and each right
    row reaches that bin via exactly one of its two copies.
    """
    right_key = right_key or key
    left_names, right_cols, all_cols, types, out_names, restore = (
        _join_schema(left_ds, right_ds, key, right_key, right_ts,
                     right_cols, "range_join")
    )

    win = pd.Timedelta(window)
    win_us = np.int64(win.value // 1000)

    def _ts_us(col) -> np.ndarray:
        return (
            col.cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )

    def conform(side: int, rename_from: str | None, bins: "np.ndarray",
                batch: pa.Table) -> pa.Table:
        if rename_from and rename_from != key:
            batch = batch.rename_columns(
                [key if c == rename_from else c for c in batch.schema.names]
            )
        cols = _conform_cols(batch, all_cols, types, "range_join")
        cols.append(pa.array(np.full(batch.num_rows, side, np.int8)))
        cols.append(pa.array(bins, pa.int64()))
        return pa.table(cols, names=all_cols + [_SIDE_COL, "__bin"])

    def prep_left(batch: pa.Table) -> pa.Table:
        bins = _ts_us(batch.column(left_ts)) // win_us
        return conform(0, None, bins, batch)

    def prep_right(batch: pa.Table) -> pa.Table:
        # a right window [t, t+win) can only match left bins
        # floor(t/win) and floor(t/win)+1 — replicate to both
        b0 = _ts_us(batch.column(right_ts)) // win_us
        both = pa.concat_tables([batch, batch])
        bins = np.concatenate([b0, b0 + 1])
        return conform(1, right_key, bins, both)

    lb = _attach_part(
        left_ds.map_batches(prep_left, batch_format="pyarrow"), key, n_parts
    )
    rb = _attach_part(
        right_ds.map_batches(prep_right, batch_format="pyarrow"), key, n_parts
    )

    rcols = [key, right_ts] + right_cols

    def join_bin(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g[_SIDE_COL] == 0][left_names]
        rt = g[g[_SIDE_COL] == 1][rcols]
        if lf.empty or rt.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype=restore.get(c, g[c].dtype))
                 for c in out_names}
            )
        m = lf.merge(rt, on=key)
        lt = m[left_ts].astype("datetime64[us]")
        rt_ts = m[right_ts].astype("datetime64[us]")
        out = m[(rt_ts <= lt) & (lt < rt_ts + win)]
        out = out[out_names].reset_index(drop=True)
        for c, t in restore.items():
            out[c] = out[c].astype(t)
        return out

    both = lb.union(rb)
    return both.groupby([_PART_COL, "__bin"]).map_groups(
        join_bin, batch_format="pandas"
    )


def sliding_window_agg(ds, *, key: str, order_col: str, value_col: str,
                       window: int, agg: str = "mean",
                       out_col: str | None = None):
    """Trailing ROWS-window aggregate per key (window rows ending at the
    current row), ordered by ``order_col`` — the streaming-window stage of
    a metrics pipeline, ROWS semantics so it matches SQL's
    ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW`` exactly even over
    gaps in the time axis.

    One hash shuffle on the key; the per-group kernel is a vectorized
    cumsum difference (O(n), no Python loop). Ties on ``order_col`` within
    a key are broken deterministically only if upstream rows are unique
    per (key, order_col) — asserted.
    """
    out_col = out_col or f"{agg}_{value_col}_w{window}"

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        if g[order_col].duplicated().any():
            raise ValueError(
                "sliding_window_agg: duplicate order values within a key — "
                "pre-aggregate so (key, order) is unique"
            )
        v = g[value_col].to_numpy(np.float64)
        cs = np.concatenate(([0.0], np.cumsum(v)))
        lo = np.maximum(0, np.arange(len(v)) - window + 1)
        s = cs[np.arange(1, len(v) + 1)] - cs[lo]
        if agg == "mean":
            s = s / (np.arange(len(v)) - lo + 1)
        elif agg != "sum":
            raise ValueError(f"unsupported agg {agg!r}")
        g[out_col] = s
        return g

    return ds.groupby(key).map_groups(roll, batch_format="pandas")


def session_windows(ds, *, key: str, ts_col: str, gap_us: int):
    """Gap-based sessionization — the classic streaming session window
    (Flink/Beam session windows; Ray Data has no native analog): per
    key, events ordered by timestamp split into sessions wherever the
    gap to the previous event EXCEEDS ``gap_us`` microseconds; emits one
    row per session: ``(key, session_id, session_start, session_end,
    n_events)`` with ``session_id`` 1-based in per-key time order.

    Exactly the SQL sessionization idiom the oracle uses::

        1 + SUM(CASE WHEN ts - lag(ts) > gap THEN 1 ELSE 0 END)
            OVER (PARTITION BY key ORDER BY ts, ...)

    One hash shuffle on the key (Ray groupby); the per-key kernel is a
    vectorized diff + cumsum — no Python loop. Ties on the timestamp stay in one session (gap 0
    is never > gap_us for gap_us >= 0). Timestamps are compared in
    integer microseconds, so the split is exact."""
    if gap_us < 0:
        raise ValueError("gap_us must be >= 0")

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [ts_col, key], kind="mergesort"
        ).reset_index(drop=True)
        ts = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        new = np.empty(len(g), dtype=np.int64)
        new[0] = 1
        new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        out = pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "session_id": sid,
                "_ts": ts,
            }
        )
        agg = out.groupby("session_id", sort=True).agg(
            **{
                key: (key, "first"),
                "session_start": ("_ts", "min"),
                "session_end": ("_ts", "max"),
                "n_events": ("_ts", "size"),
            }
        ).reset_index()
        agg["session_start"] = agg["session_start"].astype(
            "datetime64[us]"
        )
        agg["session_end"] = agg["session_end"].astype("datetime64[us]")
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg[
            [key, "session_id", "session_start", "session_end", "n_events"]
        ]

    return ds.groupby(key).map_groups(sessionize, batch_format="pandas")


# ES auto_date_histogram interval ladder (fixed intervals, microseconds;
# pinned — shared by the engine and the generated SQL oracle so the
# interval CHOICE is part of the verified contract)
AUTO_DH_LADDER_US: tuple[tuple[str, int], ...] = (
    ("1m", 60_000_000),
    ("5m", 300_000_000),
    ("30m", 1_800_000_000),
    ("1h", 3_600_000_000),
    ("3h", 10_800_000_000),
    ("12h", 43_200_000_000),
    ("1d", 86_400_000_000),
    ("7d", 604_800_000_000),
)


def pick_auto_interval(min_us: int, max_us: int,
                       target_buckets: int) -> tuple[str, int]:
    """The pinned auto_date_histogram rule: the SMALLEST ladder interval
    whose bucket-count upper bound ``floor(max/iv) − floor(min/iv) + 1``
    fits ``target_buckets`` (ES coarsens from fine until the bucket
    count fits). Falls back to the coarsest rung when nothing fits —
    integer arithmetic only, so both engines agree exactly."""
    for label, iv in AUTO_DH_LADDER_US:
        if (max_us // iv) - (min_us // iv) + 1 <= target_buckets:
            return label, iv
    return AUTO_DH_LADDER_US[-1]


def auto_date_histogram(ds, ts_col: str, *, target_buckets: int = 50,
                        n_parts: int = 64):
    """(interval, bucket, n_events) — the ES ``auto_date_histogram``
    aggregation: the engine picks the bucketing interval from a pinned
    ladder so the bucket count stays within ``target_buckets``, then
    runs the ordinary fixed-interval date_histogram at that rung.

    Two passes: an exact int64 (min, max) of the epoch-microsecond
    timestamp (per-batch partials + one tiny reduce — the only
    driver-resident values are two scalars), then the hash-partitioned
    combiner/final histogram (the events_hourly shape). Empty buckets
    are omitted (min_doc_count=1, like the histogram facet)."""
    from webindex.relational import hash_partitioned_groupby

    def to_us(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"us": df[ts_col].astype("datetime64[us]").astype("int64")}
        )

    from ray.data.aggregate import Max, Min

    mm = ds.map_batches(to_us, batch_format="pandas").aggregate(
        Min("us"), Max("us")
    )
    lo, hi = int(mm["min(us)"]), int(mm["max(us)"])
    label, iv = pick_auto_interval(lo, hi, target_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].astype("datetime64[us]").astype("int64")
        bucket = (us // iv) * iv
        out = (
            pd.DataFrame({"bucket": bucket.values.astype("datetime64[us]")})
            .groupby("bucket", sort=False).size().reset_index(name="n_p")
        )
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("bucket", sort=False)
            .agg(n_events=("n_p", "sum")).reset_index()
        )
        out.insert(0, "interval", label)
        return out

    return hash_partitioned_groupby(
        ds, ["bucket"], partial, final, n_parts=n_parts
    )


def date_range_agg(ds, ts_col: str, ranges: list[tuple[str, str, str]], *,
                   n_parts: int = 16):
    """(range, n_events) — the ES ``date_range`` aggregation: NAMED
    half-open ``[from, to)`` timestamp buckets; open ends allowed
    (``""``), overlaps allowed (an event counts in every bucket that
    holds it), empty named buckets kept at count 0 (the caller-fixed
    bucket set, like the filters aggregation). ``ranges`` rows are
    ``(name, from_iso, to_iso)``.

    Per-batch vectorized membership counts (one comparison pair per
    bucket) summed by one tiny groupby — nothing row-sized leaves the
    map stage."""
    names = [r[0] for r in ranges]
    bounds = []
    for _name, lo, hi in ranges:
        lo_us = (
            np.datetime64(lo, "us").astype("int64") if lo else None
        )
        hi_us = (
            np.datetime64(hi, "us").astype("int64") if hi else None
        )
        bounds.append((lo_us, hi_us))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        cnts = []
        for lo_us, hi_us in bounds:
            m = np.ones(us.size, dtype=bool)
            if lo_us is not None:
                m &= us >= lo_us
            if hi_us is not None:
                m &= us < hi_us
            cnts.append(int(m.sum()))
        return pd.DataFrame(
            {"range": names, "n_p": np.array(cnts, np.int64)}
        )

    import ray.data  # noqa: F401  (Dataset API)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("range")
        .sum("n_p")
        .map_batches(
            lambda df: df.rename(columns={"sum(n_p)": "n_events"}),
            batch_format="pandas",
        )
    )
