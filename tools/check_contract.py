"""Local replica of the driver's correctness check.

Runs every ``queries()`` entry at the given sf dir, runs the matching
``oracle_sql()`` through DuckDB (tables pre-registered as views), and
compares row count, column names, and an order-insensitive value hash —
the same comparison shape the driver records in CORRECTNESS_r{N}.json.

Usage: PYTHONPATH=/root/repo python tools/check_contract.py [sf_dir] [names...]
       [--json OUT.json]   # also write a driver-auditable per-entry artifact
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
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
    records = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            n_fail += 1
            records.append({"name": name, "ok": False,
                            "err": f"{type(e).__name__}: {e}"})
            continue
        wall = time.time() - t0
        sql = sqls.get(name)
        rec = {"name": name, "rows": len(got), "wall_sec": round(wall, 1),
               "oracle": "sql" if sql is not None else "rows_only"}
        if sql is None:
            status = f"rows-only rows={len(got)}"
            ok = len(got) >= 0
        else:
            try:
                want = con.execute(sql).df()
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: SQL error {e}")
                n_fail += 1
                records.append({"name": name, "ok": False,
                                "err": f"SQL error: {e}"})
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
            rec.update(cols_ok=bool(cols_ok), rows_match=bool(rows_ok),
                       hash_ok=bool(hash_ok))
        rec["ok"] = bool(ok)
        records.append(rec)
        print(f"{'PASS' if ok else 'FAIL'} {name}: {status} ({wall:.1f}s)")
        n_pass += ok
        n_fail += not ok
    print(f"== {n_pass} pass, {n_fail} fail")
    if json_out:
        import json as _json
        from datetime import date

        payload = {
            "sweep": "check_contract full registry",
            "sf_dir": sf_dir,
            "date": str(date.today()),
            "n_entries": len(records),
            "n_pass": int(n_pass),
            "n_fail": int(n_fail),
            "entries": records,
        }
        with open(json_out, "w") as f:
            _json.dump(payload, f, indent=1)
        print(f"wrote {json_out}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
