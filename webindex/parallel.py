"""Parallel-apply harness with error-channel semantics (SURVEY.md §2.10).

Re-expression of the reference's ``DataFrameParallelizer``
(/root/reference/biencoder/beir/parallelizer/parallelizer.py:129-156,
174-228, 259-311): a UDF applied over rows/batches with

- ``error_handling="log"``: failed rows keep their input columns, output
  columns are null, and ``<prefix>error_message`` / ``<prefix>error_type``
  columns are appended (parallelizer.py:174-228);
- ``error_handling="fail"``: the first error propagates and aborts;
- bounded retries with delay for transient errors (the reference wraps API
  calls in ``@retry(Exception, delay=..., tries=...)``,
  beir_openai_embeddings_batched_parallel.py:192).

The reference builds this on a ThreadPoolExecutor; here the scheduling,
queueing and ordered collection all belong to Ray Data — only the
error-channel and retry semantics remain to implement, inside one
``map_batches`` stage.
"""

from __future__ import annotations

import time

import pandas as pd

DEFAULT_PREFIX = "response_"


def parallel_apply(ds, fn, *, error_handling: str = "log",
                   output_prefix: str = DEFAULT_PREFIX,
                   max_attempts: int = 1, wait_interval: float = 0.0,
                   batch_size: int = 256, concurrency=None):
    """Apply ``fn(row: dict) -> dict`` over a Dataset with error columns.

    Returns a Dataset with the input columns plus ``<prefix>``-prefixed
    output columns and the two error columns (always present, null on
    success — fixed schema regardless of failures).
    """
    if error_handling not in ("log", "fail"):
        raise ValueError(error_handling)

    def apply_batch(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        err_msg = []
        err_type = []
        out_cols: set[str] = set()
        for row in df.to_dict("records"):
            attempt = 0
            while True:
                attempt += 1
                try:
                    res = fn(row) or {}
                    out_rows.append(res)
                    out_cols.update(res)
                    err_msg.append(None)
                    err_type.append(None)
                    break
                except Exception as e:  # noqa: BLE001 — error-channel semantics
                    if attempt < max_attempts:
                        if wait_interval:
                            time.sleep(wait_interval)
                        continue
                    if error_handling == "fail":
                        raise
                    out_rows.append({})
                    err_msg.append(str(e))
                    err_type.append(type(e).__name__)
                    break
        out = df.reset_index(drop=True)
        for c in sorted(out_cols):
            out[f"{output_prefix}{c}"] = [r.get(c) for r in out_rows]
        out[f"{output_prefix}error_message"] = pd.array(err_msg, dtype="string")
        out[f"{output_prefix}error_type"] = pd.array(err_type, dtype="string")
        return out

    return ds.map_batches(
        apply_batch, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
    )
