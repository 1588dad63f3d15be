"""Text/table cleaning helpers (SURVEY.md §2.2 M11/M12), vectorized.

Re-expressions of the reference's dataframe plugin utilities
(/root/reference/biencoder/beir/io_utils/plugin_io_utils.py:14-126) as
pyarrow.compute kernels over Arrow batches (usable directly or inside
``map_batches``), plus the score projections of §2.2 M12
(/root/reference/useb/useb/useb/evaluators/base.py:23-24,
/root/reference/other/sgpt_utils.ipynb cell 43).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# M11 — cleaning / truncation / naming
# ---------------------------------------------------------------------------


def clean_text_array(arr: pa.Array) -> pa.Array:
    """``clean_text_df`` analog (plugin_io_utils.py:65-80): strip whitespace,
    empty strings -> null."""
    stripped = pc.utf8_trim_whitespace(pc.cast(arr, pa.string()))
    return pc.if_else(pc.equal(stripped, ""), pa.nulls(len(arr), pa.string()),
                      stripped)


def drop_empty_text(batch: pa.Table, col: str = "text") -> pa.Table:
    """Filter rows whose cleaned text is null/empty (M1 + clean_text_df)."""
    cleaned = clean_text_array(batch.column(col).combine_chunks())
    batch = batch.set_column(batch.column_names.index(col), col, cleaned)
    return batch.filter(pc.is_valid(cleaned))


def truncate_text_array(arr: pa.Array, max_chars: int,
                        suffix: str = " (...)") -> pa.Array:
    """``truncate_text_list`` analog (plugin_io_utils.py:45-62): cap at
    ``max_chars`` characters and append the ellipsis marker to truncated
    values."""
    s = pc.cast(arr, pa.string())
    too_long = pc.greater(pc.utf8_length(s), max_chars)
    cut = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(s, 0, max_chars), suffix, ""
    )
    return pc.if_else(too_long, cut, s)


_ASCII_RX = re.compile(r"[^A-Za-z0-9_]")


def ascii_fold(name: str) -> str:
    """ASCII-fold a column name (plugin_io_utils.py:95-97): strip accents,
    replace non-alphanumerics with underscores."""
    norm = unicodedata.normalize("NFKD", name)
    ascii_ = norm.encode("ascii", "ignore").decode("ascii")
    return _ASCII_RX.sub("_", ascii_)


def generate_unique(name: str, existing: list[str], prefix: str = "") -> str:
    """``generate_unique`` analog (plugin_io_utils.py:83-106): folded,
    optionally prefixed name made unique against ``existing`` by a numeric
    suffix."""
    base = ascii_fold(f"{prefix}{name}" if prefix else name)
    if base not in existing:
        return base
    i = 1
    while f"{base}_{i}" in existing:
        i += 1
    return f"{base}_{i}"


def unique_list(values) -> list:
    """Order-preserving unique (plugin_io_utils.py:31-42 — §2.7 D2)."""
    seen = set()
    out = []
    for v in values:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def move_columns_after(batch: pa.Table, cols: list[str], after: str) -> pa.Table:
    """``move_columns_after`` analog (plugin_io_utils.py:109-126): reorder
    ``cols`` to sit immediately after column ``after``."""
    names = [c for c in batch.column_names if c not in cols]
    i = names.index(after) + 1
    order = names[:i] + list(cols) + names[i:]
    return batch.select(order)


# ---------------------------------------------------------------------------
# M12 — score projections
# ---------------------------------------------------------------------------


def pct_round(arr, ndigits: int = 2):
    """``round(v * 100, ndigits)`` percentage projection
    (useb/evaluators/base.py:23-24)."""
    a = np.asarray(arr, dtype=np.float64)
    return np.round(a * 100.0, ndigits)


def rescale_minmax(arr) -> np.ndarray:
    """Min-max rescale to [0, 1] (sgpt_utils.ipynb cell 43)."""
    a = np.asarray(arr, dtype=np.float64)
    lo, hi = a.min(), a.max()
    if hi == lo:
        return np.zeros_like(a)
    return (a - lo) / (hi - lo)
