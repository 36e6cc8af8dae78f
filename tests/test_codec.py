import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from donkey_ray.functions.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)

EDGE_CASES = [
    [],
    [0],
    [2**62],
    [127],
    [128],
    [16383],
    [16384],
    [1, 2, 3, 4, 5],
    list(range(1000)),
    [2**63 - 1],
]


@pytest.mark.parametrize("vals", EDGE_CASES)
def test_varbyte_roundtrip_edges(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(arr))) == vals


def test_varbyte_known_bytes():
    # LSB-first 7-bit groups, continuation high bit
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varbyte_encode(np.array([1, 128], dtype=np.uint64)) == b"\x01\x80\x01"


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_truncated_raises():
    with pytest.raises(ValueError):
        varbyte_decode(b"\x80")


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varbyte_decode(varbyte_encode(arr))
    assert np.array_equal(out, arr)


@settings(max_examples=50, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=2**62), max_size=200)
)
def test_postings_roundtrip_property(ids):
    sorted_ids = np.array(sorted(ids), dtype=np.int64)
    out = decode_postings(encode_postings(sorted_ids))
    assert np.array_equal(out, sorted_ids)


def test_delta_roundtrip_sizes():
    rng = np.random.default_rng(7)
    for n in [0, 1, 127, 128, 129, 10_000]:
        ids = np.unique(rng.integers(0, 2**62, size=n, dtype=np.int64))
        d = delta_encode(ids.astype(np.uint64))
        assert np.array_equal(delta_decode(d).astype(np.int64), ids)
        assert np.array_equal(decode_postings(encode_postings(ids)), ids)


def test_delta_compresses():
    ids = np.arange(1_000_000, 1_010_000, dtype=np.int64)
    buf = encode_postings(ids)
    assert len(buf) < 10_000 + 10  # ~1 byte per delta after the first
