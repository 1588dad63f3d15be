"""Token-budget sequence packing for LLM pretraining batches.

A pretraining pipeline concatenates documents into fixed-capacity token
sequences ("packing") so no batch slot is wasted on padding. The operator
here is the deterministic distributed version of the standard greedy
packer:

- docs are assigned to ``n_buckets`` independent packing streams by
  ``doc_id % n_buckets`` (pinned logical partitioning — NEVER derived
  from CPU count, per the repo invariant);
- within a bucket, docs pack greedily in ascending doc_id order: a
  running token total starts a new sequence when adding the next doc
  would overflow ``max_tokens``. A doc longer than ``max_tokens`` is
  never split — it gets a sequence of its own;
- output rows are (doc_id, bucket, seq, offset): ``(bucket, seq)`` is
  the globally-unique sequence id, ``offset`` the doc's token start
  within it.

Determinism: bucket assignment and in-bucket order depend only on
doc_id, so the packing is partition- and cluster-shape-independent, and
a DuckDB recursive-CTE oracle replays it row for row. The per-bucket
greedy scan is inherently sequential (each placement depends on the
previous one) — bucketing is what makes it parallel: one ``map_groups``
task per bucket, each a linear pass over its own docs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_sequences(ds, *, max_tokens: int = 512, n_buckets: int = 16,
                   token_col: str = "n_tokens", id_col: str = "doc_id"):
    """(id, n_tokens) Dataset -> (doc_id, bucket, seq, offset) Dataset."""

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": batch.column(token_col).cast(pa.int64()),
                "bucket": pa.array(
                    (ids % n_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    def pack(g: pd.DataFrame, cap=max_tokens) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        nt = g["n_tokens"].to_numpy(np.int64)
        seqs = np.empty(len(g), np.int64)
        offs = np.empty(len(g), np.int64)
        seq = 0
        cum = 0
        for i, t in enumerate(nt):
            if cum > 0 and cum + t > cap:
                seq += 1
                cum = 0
            seqs[i] = seq
            offs[i] = cum
            cum += t
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "bucket": g["bucket"].to_numpy(np.int32),
                "seq": seqs,
                "offset": offs,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )


def pack_reference(rows: list[tuple[int, int]], *, max_tokens: int,
                   n_buckets: int) -> list[tuple[int, int, int, int]]:
    """Single-threaded replay of the exact packing spec (test oracle)."""
    out = []
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for did, nt in sorted(rows):
        by_bucket.setdefault(did % n_buckets, []).append((did, nt))
    for b, docs in sorted(by_bucket.items()):
        seq = cum = 0
        for did, nt in docs:
            if cum > 0 and cum + nt > max_tokens:
                seq += 1
                cum = 0
            out.append((did, b, seq, cum))
            cum += nt
    return sorted(out)
