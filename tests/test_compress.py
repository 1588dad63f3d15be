"""Varbyte/delta codec: roundtrip, boundaries, randomized (seeded)."""

import numpy as np
import pytest

from webindex.compress import (
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.int64)) == b""
    assert varbyte_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.int64)) == b""
    assert delta_decode(b"").size == 0


def test_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2097151, 2097152, (1 << 62) - 1],
        dtype=np.int64,
    )
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_single_byte_values_encode_to_one_byte_each():
    vals = np.arange(128, dtype=np.int64)
    assert len(varbyte_encode(vals)) == 128


def test_negative_rejected():
    with pytest.raises(ValueError):
        varbyte_encode(np.array([-1], dtype=np.int64))


def test_randomized_roundtrip():
    rng = np.random.default_rng(42)
    for _ in range(25):
        n = int(rng.integers(0, 3000))
        v = rng.integers(0, 1 << int(rng.integers(1, 62)), size=n)
        assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)
        ids = np.unique(rng.integers(0, 1 << 40, size=n))
        assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_delta_first_value_is_absolute():
    ids = np.array([1000], dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)
