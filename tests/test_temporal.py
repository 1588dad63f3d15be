"""Temporal operators: as-of join + sliding window vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_asof_join_matches_merge_asof():
    """Distributed as-of join over real events/orders == one-process
    pd.merge_asof on the same (deduped) inputs."""
    import ray.data as rd

    from webindex.temporal import asof_join

    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    od = rd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("o_orderkey", kind="mergesort")
        return g.groupby("o_orderdate", as_index=False).last()

    od_u = od.groupby("o_custkey").map_groups(dedupe, batch_format="pandas")

    got = asof_join(
        ev.repartition(5), od_u, key="user_id", left_ts="ts",
        right_key="o_custkey", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"], n_parts=7,
    ).to_pandas()

    lf = ev.to_pandas().sort_values("ts", kind="mergesort")
    rt = (
        od_u.to_pandas()
        .rename(columns={"o_custkey": "user_id"})
        .sort_values("o_orderdate", kind="mergesort")
    )
    lf["ts"] = lf["ts"].astype("datetime64[ns]")
    rt["o_orderdate"] = rt["o_orderdate"].astype("datetime64[ns]")
    want = pd.merge_asof(
        lf, rt, left_on="ts", right_on="o_orderdate", by="user_id",
        direction="backward",
    )
    want = want[want["o_orderdate"].notna()].drop(columns=["o_orderdate"])

    a = got.sort_values("event_id").reset_index(drop=True)
    b = want.sort_values("event_id").reset_index(drop=True)[a.columns]
    a["ts"] = a["ts"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # sanity: joins happen (not vacuously empty), inner semantics drop some
    assert 0 < len(a) <= ev.count()


@pytest.mark.usefixtures("ray_session")
def test_asof_join_string_key_and_unmatched():
    """String keys route through the stable hash; keys with no right rows
    drop (inner); right-only keys produce nothing."""
    import ray.data as rd

    from webindex.temporal import asof_join

    lf = pd.DataFrame(
        {
            "k": ["a", "a", "b", "c", "c"],
            "t": pd.to_datetime(
                ["2023-01-02", "2023-01-05", "2023-01-01", "2023-01-03",
                 "2023-01-04"]
            ),
            "x": [1, 2, 3, 4, 5],
        }
    )
    rt = pd.DataFrame(
        {
            "k": ["a", "a", "c", "d"],
            "rt": pd.to_datetime(
                ["2023-01-01", "2023-01-04", "2023-01-04", "2023-01-01"]
            ),
            "payload": [10.0, 20.0, 30.0, 40.0],
        }
    )
    out = asof_join(
        rd.from_pandas(lf).repartition(3), rd.from_pandas(rt),
        key="k", left_ts="t", right_ts="rt", right_cols=["payload"],
        n_parts=5,
    ).to_pandas().sort_values("x").reset_index(drop=True)
    # a@01-02 -> 10, a@01-05 -> 20, b -> dropped, c@01-03 -> dropped
    # (right c is 01-04 > 01-03), c@01-04 -> 30
    assert list(out["x"]) == [1, 2, 5]
    assert list(out["payload"]) == [10.0, 20.0, 30.0]


@pytest.mark.usefixtures("ray_session")
def test_asof_join_rejects_duplicate_right_ts():
    import ray.data as rd

    from webindex.temporal import asof_join

    lf = pd.DataFrame(
        {"k": [1], "t": pd.to_datetime(["2023-01-02"]), "x": [1]}
    )
    rt = pd.DataFrame(
        {
            "k": [1, 1],
            "rt": pd.to_datetime(["2023-01-01", "2023-01-01"]),
            "payload": [1.0, 2.0],
        }
    )
    ds = asof_join(
        rd.from_pandas(lf), rd.from_pandas(rt), key="k", left_ts="t",
        right_ts="rt", right_cols=["payload"],
    )
    with pytest.raises(Exception, match="duplicate"):
        ds.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_sliding_window_matches_pandas_rolling():
    import ray.data as rd

    from webindex.temporal import sliding_window_agg

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": np.repeat(["p", "q", "r"], 40),
            "t": np.tile(np.arange(40), 3),
            "v": rng.integers(0, 50, 120).astype(np.int64),
        }
    )
    for agg in ("mean", "sum"):
        got = (
            sliding_window_agg(
                rd.from_pandas(df).repartition(4), key="k", order_col="t",
                value_col="v", window=5, agg=agg, out_col="w",
            )
            .to_pandas()
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["k", "t"]).reset_index(drop=True)
        roll = want.groupby("k")["v"].rolling(5, min_periods=1)
        want["w"] = getattr(roll, agg)().to_numpy()
        pd.testing.assert_frame_equal(
            got[["k", "t", "v", "w"]], want[["k", "t", "v", "w"]],
            check_dtype=False,
        )


@pytest.mark.usefixtures("ray_session")
def test_range_join_matches_bruteforce():
    """Bin-replicated range join == driver-side brute-force double loop,
    including pairs that straddle bin boundaries and multi-match rows."""
    import ray.data as rd

    from webindex.temporal import range_join

    rng = np.random.default_rng(9)
    base = pd.Timestamp("2024-01-01")
    lf = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 80),
            "t": base + pd.to_timedelta(rng.integers(0, 500, 80), unit="h"),
            "x": np.arange(80),
        }
    )
    rt = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 40),
            "rt": base + pd.to_timedelta(rng.integers(0, 500, 40), unit="h"),
            "pay": np.arange(40) * 1.5,
        }
    )
    win = pd.Timedelta("48h")
    got = (
        range_join(
            rd.from_pandas(lf).repartition(4), rd.from_pandas(rt),
            key="k", left_ts="t", right_ts="rt", right_cols=["pay"],
            window="48h", n_parts=5,
        )
        .to_pandas()
        .sort_values(["x", "pay"])
        .reset_index(drop=True)
    )
    want = lf.merge(rt, on="k")
    want = want[(want["rt"] <= want["t"]) & (want["t"] < want["rt"] + win)]
    want = (
        want[["k", "t", "x", "pay"]]
        .sort_values(["x", "pay"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got[["k", "t", "x", "pay"]], want, check_dtype=False
    )


@pytest.mark.usefixtures("ray_session")
def test_joins_reject_int64_beyond_float_precision():
    """Int columns cross a float64 upcast through the null-union; ids
    beyond ±2^53 would silently round — both joins must fail loudly."""
    import ray.data as rd

    from webindex.temporal import asof_join

    big = (1 << 60) + 1
    lf = pd.DataFrame(
        {"k": [1], "t": pd.to_datetime(["2023-01-02"]), "x": [big]}
    )
    rt = pd.DataFrame(
        {"k": [1], "rt": pd.to_datetime(["2023-01-01"]), "pay": [1.0]}
    )
    ds = asof_join(
        rd.from_pandas(lf), rd.from_pandas(rt), key="k", left_ts="t",
        right_ts="rt", right_cols=["pay"],
    )
    with pytest.raises(Exception, match="2\\^53"):
        ds.to_pandas()


def test_session_windows_matches_brute(ray_session):
    import ray.data as rd

    from webindex.temporal import session_windows

    import pyarrow as pa

    rng = np.random.default_rng(5)
    n = 400
    users = rng.integers(0, 12, size=n)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 3_600_000_000, size=n).astype(
        "timedelta64[us]"
    )
    gap = 120_000_000  # 2 minutes
    ds = rd.from_arrow(
        pa.table({"user_id": pa.array(users, pa.int64()),
                  "ts": pa.array(ts)})
    )
    out = session_windows(ds, key="user_id", ts_col="ts", gap_us=gap)
    got = out.to_pandas().sort_values(
        ["user_id", "session_id"]
    ).reset_index(drop=True)

    rows = []
    for u in sorted(set(users.tolist())):
        uts = np.sort(ts[users == u]).astype("datetime64[us]").astype(
            np.int64
        )
        sid, start, prev, cnt = 0, None, None, 0
        for t in uts.tolist():
            if prev is None or t - prev > gap:
                if prev is not None:
                    rows.append((u, sid, start, prev, cnt))
                sid += 1
                start, cnt = t, 0
            cnt += 1
            prev = t
        rows.append((u, sid, start, prev, cnt))
    import pandas as pd

    want = pd.DataFrame(
        rows,
        columns=["user_id", "session_id", "session_start",
                 "session_end", "n_events"],
    )
    want["session_start"] = want["session_start"].astype("datetime64[us]")
    want["session_end"] = want["session_end"].astype("datetime64[us]")
    got = got[want.columns].astype(want.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    assert (want["n_events"] > 1).any() and (want["session_id"] > 1).any()


def test_pick_auto_interval_rule():
    """auto_date_histogram ladder choice: smallest rung whose bucket
    bound fits; coarsest-rung fallback."""
    from webindex.temporal import AUTO_DH_LADDER_US, pick_auto_interval

    m = 60_000_000
    # 30-minute span, target 50 -> 1m gives 31 buckets
    assert pick_auto_interval(0, 30 * m, 50) == ("1m", m)
    # same span, target 10 -> 5m (7 buckets)
    assert pick_auto_interval(0, 30 * m, 10) == ("5m", 5 * m)
    # bucket bound counts rung-aligned edges, not span/iv: a span
    # crossing one 1m edge needs 2 buckets
    assert pick_auto_interval(m - 1, m + 1, 2) == ("1m", m)
    # absurd target falls back to the coarsest rung
    lbl, iv = pick_auto_interval(0, 10**18, 1)
    assert (lbl, iv) == AUTO_DH_LADDER_US[-1]


def test_auto_date_histogram_and_date_range(ray_session):
    """Engine replay over a tiny deterministic series: interval choice,
    bucket counts, named-range counts incl. open ends and empty-kept."""
    import pyarrow as pa
    import ray.data as rd

    from webindex.temporal import auto_date_histogram, date_range_agg

    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = [base + np.timedelta64(i * 137, "s") for i in range(400)]
    ds = rd.from_arrow(pa.table({"ts": pa.array(list(ts))}))
    # span ~15.2h; target 20 -> 1h rung (16 buckets)
    out = auto_date_histogram(ds, "ts", target_buckets=20).to_pandas()
    assert set(out["interval"]) == {"1h"}
    us = np.array([t.astype("int64") for t in ts])
    import collections

    want = collections.Counter((us // 3_600_000_000) * 3_600_000_000)
    got = {
        int(b.astype("datetime64[us]").astype("int64")): int(n)
        for b, n in zip(out["bucket"].to_numpy(), out["n_events"])
    }
    assert got == dict(want)

    ranges = [
        ("early", "2024-03-01", "2024-03-01 05:00:00"),
        ("all", "", ""),
        ("none", "2030-01-01", ""),
    ]
    rout = date_range_agg(ds, "ts", ranges).to_pandas()
    by = dict(zip(rout["range"], rout["n_events"]))
    lo = np.datetime64("2024-03-01T05:00:00", "us").astype("int64")
    assert by["early"] == int((us < lo).sum())
    assert by["all"] == 400
    assert by["none"] == 0
