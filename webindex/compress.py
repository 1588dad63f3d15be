"""Delta + varbyte posting-list codec, numpy-vectorized.

The reference keeps posting lists inside Elasticsearch (opaque); per the
north rule we build our own: docID gaps and term frequencies are encoded as
LEB128 varints (7 data bits per byte, MSB=1 means continuation) into Arrow
``binary`` cells — replacing the reference's Python dict-of-lists data model
(SURVEY.md §1).

Both encode and decode are vectorized (no Python loop over postings): encode
computes per-value byte counts with integer comparisons, lays all bytes out
with ``np.repeat`` arithmetic; decode reduces 7-bit groups with
``np.add.reduceat``.
"""

from __future__ import annotations

import numpy as np

def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative int64s as LEB128 varints.

    Values must be in [0, 2^62) (docIDs, gaps, tfs all are). The encode
    builds an (n, max_bytes) uint8 matrix column-by-column (each column a
    contiguous vector op) then compacts it with one boolean mask — ~0.3 us
    per posting, no Python loop over values.
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    if v.size == 0:
        return b""
    if v.min() < 0:
        raise ValueError("varbyte_encode requires non-negative values")
    nb = np.ones(v.size, dtype=np.int8)
    for k in range(1, 9):
        nb += v >= (1 << (7 * k))
    maxnb = int(nb.max())
    mat = np.empty((v.size, maxnb), dtype=np.uint8)
    for j in range(maxnb):
        np.bitwise_and(v >> (7 * j), 0x7F, out=mat[:, j], casting="unsafe")
    cols = np.arange(maxnb, dtype=np.int8)
    # continuation bit on every byte except each value's last
    mat |= (cols[None, :] < (nb[:, None] - 1)).astype(np.uint8) << 7
    out = mat.ravel()[(cols[None, :] < nb[:, None]).ravel()]
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 varints into an int64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    nb = np.diff(np.concatenate(([np.int64(-1)], ends)))
    starts = ends - nb + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, nb)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    vals = np.add.reduceat(contrib, starts)
    return vals.astype(np.int64)


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Varbyte-encode gaps of a strictly-increasing int array.

    First gap is the first value itself; later gaps are successive
    differences (>= 1).
    """
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if ids.size == 0:
        return b""
    gaps = np.empty(ids.size, dtype=np.int64)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return varbyte_encode(gaps)


def delta_decode(buf: bytes) -> np.ndarray:
    gaps = varbyte_decode(buf)
    if gaps.size == 0:
        return gaps
    return np.cumsum(gaps)
