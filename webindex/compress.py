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


# ---------------------------------------------------------------------------
# Elias-Fano docID-stream codec (opt-in: IndexConfig(codec="ef"))
# ---------------------------------------------------------------------------
# Quasi-succinct posting representation (Elias 1974; Vigna 2013 "Quasi-
# succinct indices"): a strictly-increasing sequence in universe u costs
# ~ n * (2 + log2(u/n)) bits — below varbyte's 8-bit floor per gap once
# average gaps drop under ~64. Encoded PER BLOCK over ABSOLUTE docIDs
# (EF is monotone-only and not byte-sliceable like varbyte, so blocks
# are self-contained: 1-byte lo header | packed lower bits | unary upper
# bits). Decode needs n, which the segment metadata already stores per
# block. The tf and position streams stay varbyte (not monotone).


def ef_encode(ids: np.ndarray) -> bytes:
    """Elias-Fano encode a strictly-increasing non-negative int64 array.

    Values are encoded RELATIVE to the block's first id (stored as a
    LEB128 varint prefix), so the EF universe is the block's local id
    span — sharded docIDs carry a large constant prefix
    (``shard << 40``, webindex.docids) that would otherwise cost
    ~log2(first) lower bits per value. Layout: varint ``base`` |
    ``lo`` (1 byte) | lower bits (``ceil(n*lo/8)`` bytes, LSB-first) |
    upper-bits unary bitmap (rest, LSB-first). Vectorized: two
    ``np.packbits`` calls, no Python loop over values.
    """
    v = np.ascontiguousarray(ids, dtype=np.int64)
    n = v.size
    if n == 0:
        return b"\x00\x00"
    if v[0] < 0 or (n > 1 and (v[1:] <= v[:-1]).any()):
        raise ValueError("ef_encode requires strictly increasing "
                         "non-negative values")
    base = int(v[0])
    head = varbyte_encode(np.array([base], dtype=np.int64))
    v = v - base
    u = int(v[-1]) + 1
    q = u // n
    lo = q.bit_length() - 1 if q >= 1 else 0
    # lower bits: (n, lo) bit matrix, LSB-first per value
    if lo:
        shifts = np.arange(lo, dtype=np.int64)
        lbits = ((v[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
        lower = np.packbits(lbits.ravel(), bitorder="little").tobytes()
    else:
        lower = b""
    upper = (v >> lo).astype(np.int64)
    nbits = int(upper[-1]) + n  # highest set position + 1
    bitmap = np.zeros(nbits, dtype=np.uint8)
    bitmap[upper + np.arange(n, dtype=np.int64)] = 1
    ubytes = np.packbits(bitmap, bitorder="little").tobytes()
    return head + bytes([lo]) + lower + ubytes


def ef_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode ``n`` values from an :func:`ef_encode` buffer (absolute,
    strictly increasing int64s)."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # varint base prefix (one value — tiny scalar loop)
    base, shift, off = 0, 0, 0
    while True:
        byte = buf[off]
        base |= (byte & 0x7F) << shift
        off += 1
        if not byte & 0x80:
            break
        shift += 7
    lo = buf[off]
    off += 1
    nlb = (n * lo + 7) // 8
    if lo:
        lbits = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=nlb, offset=off),
            bitorder="little", count=n * lo,
        ).reshape(n, lo)
        weights = (np.int64(1) << np.arange(lo, dtype=np.int64))
        lower = lbits.astype(np.int64) @ weights
    else:
        lower = np.zeros(n, dtype=np.int64)
    ubits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8, offset=off + nlb),
        bitorder="little",
    )
    ones = np.flatnonzero(ubits)[:n].astype(np.int64)
    if ones.size != n:
        raise ValueError(f"ef_decode: {ones.size} set bits for n={n}")
    upper = ones - np.arange(n, dtype=np.int64)
    return ((upper << lo) | lower) + base


def ef_decode_concat(bufs: list, ns: np.ndarray) -> np.ndarray:
    """Decode a list of per-block EF buffers into one absolute-id array
    (the id-stream analog of the joint varbyte decode; EF blocks are
    self-contained so this is a per-block loop, vectorized within)."""
    if not bufs:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(
        [ef_decode(b, int(k)) for b, k in zip(bufs, ns)]
    )
