"""Distributed exact median: rank-selection vs numpy, all edge paths."""

import numpy as np
import pandas as pd
import pytest


def _ds(df: pd.DataFrame, parts: int):
    import ray.data as rd

    return (
        rd.from_pandas(df)
        .map_batches(
            lambda t: t.rename_columns(["event_type", "value"]),
            batch_format="pyarrow",
        )
        .repartition(parts)
        .materialize()
    )


@pytest.mark.usefixtures("ray_session")
def test_grouped_median_matches_numpy_real_table():
    import ray.data as rd

    from webindex.quantile import grouped_median

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_type", "value"],
    ).materialize()
    # tiny pull threshold forces multi-round binary search
    out = grouped_median(ds, "event_type", "value", pull_threshold=16)
    want = (
        ds.to_pandas().groupby("event_type")["value"].median().sort_index()
    )
    got = out.set_index("event_type")["median"]
    assert np.array_equal(got.to_numpy(), want.to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_grouped_median_edge_paths():
    """Duplicate-mass fixpoint (never pulls), even-count split resolution,
    tiny groups, singleton group."""
    from webindex.quantile import grouped_median

    df = pd.DataFrame(
        {
            "k": ["a"] * 101 + ["b"] * 100 + ["c"] * 5 + ["d"],
            "v": [7.0] * 101
            + list(np.arange(100.0))
            + [1.0, 2.0, 2.0, 2.0, 9.0]
            + [4.0],
        }
    )
    out = grouped_median(_ds(df, 6), "event_type", "value", pull_threshold=4)
    got = out.set_index("event_type")["median"]
    want = df.groupby("k")["v"].median().sort_index()
    assert np.array_equal(got.to_numpy(), want.to_numpy())
    assert got["a"] == 7.0 and got["b"] == 49.5


@pytest.mark.usefixtures("ray_session")
def test_grouped_median_pull_is_bounded():
    """The final pull never ships more than pull_threshold values per key
    to the driver: with a huge threshold the very first round pulls, with
    threshold < n it must keep narrowing — both give the exact answer."""
    from webindex.quantile import grouped_median

    rng = np.random.default_rng(17)
    df = pd.DataFrame({"k": ["z"] * 5000, "v": rng.normal(size=5000)})
    want = float(np.median(df["v"]))
    for thr in (10_000, 100, 8):
        out = grouped_median(
            _ds(df, 5), "event_type", "value", pull_threshold=thr
        )
        assert float(out["median"].iloc[0]) == want


@pytest.mark.usefixtures("ray_session")
def test_grouped_median_int_keys():
    """Keys keep their native dtype: int64 grouping columns work (the
    str-coerced v1 state dicts never matched int batch keys)."""
    import ray.data as rd

    from webindex.quantile import grouped_median

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"event_type": rng.integers(0, 4, 400),
         "value": rng.normal(size=400)}
    )
    out = grouped_median(
        rd.from_pandas(df).repartition(5).materialize(),
        "event_type", "value", pull_threshold=8,
    )
    want = df.groupby("event_type")["value"].median().sort_index()
    got = out.set_index("event_type")["median"]
    assert list(got.index) == list(want.index)
    assert np.array_equal(got.to_numpy(), want.to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_grouped_median_skips_nan():
    """NaN values follow the SQL NULL convention: skipped in counts and
    ranks; an all-NaN group yields NaN."""
    from webindex.quantile import grouped_median

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b", "c"],
            "v": [1.0, 2.0, np.nan, np.nan, np.nan, 5.0],
        }
    )
    out = grouped_median(_ds(df, 3), "event_type", "value",
                         pull_threshold=2)
    got = out.set_index("event_type")["median"]
    assert got["a"] == 1.5  # pandas/DuckDB NULL-skipping median
    assert np.isnan(got["b"])
    assert got["c"] == 5.0


@pytest.mark.usefixtures("ray_session")
def test_grouped_median_heavy_tail_converges():
    """Bit-space bisection converges on adversarial value ranges (a 1e300
    outlier over a dense cluster) where an arithmetic midpoint would
    exhaust max_rounds and silently return NaN."""
    from webindex.quantile import grouped_median

    df = pd.DataFrame(
        {"k": ["z"] * 4, "v": [0.0, 1.0, 2.0, 1e300]}
    )
    out = grouped_median(_ds(df, 2), "event_type", "value",
                         pull_threshold=0)
    assert float(out["median"].iloc[0]) == 1.5


def test_grouped_quantile_disc_matches_brute(ray_session):
    """Nearest-rank quantile selection vs numpy brute, both code paths
    (bounded pull and bit-bisection with a tiny pull_threshold)."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(11)
    keys, vals = [], []
    sizes = {"a": 1, "b": 2, "c": 97, "d": 1000}
    for k, n in sizes.items():
        keys += [k] * n
        vals += rng.normal(size=n).tolist()
    # duplicate-heavy group (exercises the adjacency fixpoint)
    keys += ["e"] * 500
    vals += [1.5] * 400 + [2.5] * 100
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.float64())})
    ).repartition(8)

    from webindex.quantile import grouped_quantile_disc

    def brute(q_num, q_den):
        out = {}
        import collections

        by = collections.defaultdict(list)
        for k, v in zip(keys, vals):
            by[k].append(v)
        for k, vs in by.items():
            vs = sorted(vs)
            rank = -(-(len(vs) * q_num) // q_den)
            out[k] = vs[rank - 1]
        return out

    for frac in ((1, 3), (2, 3), (1, 2), (9, 10)):
        for thr in (65536, 4):
            got = grouped_quantile_disc(
                ds, "k", "v", frac, pull_threshold=thr
            )
            want = brute(*frac)
            assert len(got) == len(want)
            for _, r in got.iterrows():
                assert float(r["value"]) == want[r["k"]], (frac, thr, r["k"])
