"""Local replica of the driver's correctness check.

Runs every ``queries()`` entry at the given sf dir, runs the matching
``oracle_sql()`` through DuckDB (tables pre-registered as views), and
compares row count, column names, and an order-insensitive value hash —
the same comparison shape the driver records in CORRECTNESS_r{N}.json.

Usage: PYTHONPATH=/root/repo python tools/check_contract.py [sf_dir] [names...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]").astype("int64")
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        wall = time.time() - t0
        sql = sqls.get(name)
        if sql is None:
            status = f"rows-only rows={len(got)}"
            ok = len(got) >= 0
        else:
            try:
                want = con.execute(sql).df()
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: SQL error {e}")
                n_fail += 1
                continue
            cols_ok = sorted(got.columns) == sorted(want.columns)
            rows_ok = len(got) == len(want)
            hash_ok = cols_ok and rows_ok and value_hash(got) == value_hash(want)
            ok = cols_ok and rows_ok and hash_ok
            status = (
                f"rows {len(got)}/{len(want)} cols_ok={cols_ok} hash_ok={hash_ok}"
            )
            if not cols_ok:
                status += f" got={sorted(got.columns)} want={sorted(want.columns)}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {status} ({wall:.1f}s)")
        n_pass += ok
        n_fail += not ok
    print(f"== {n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
