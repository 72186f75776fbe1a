"""Clean-room roaring bitmap codec (the Delta deletion-vector
serialization): portable-format round-trips across container types,
foreign-shape decoding (run containers, cookie 12347), format errors,
and the Z85 codec against the ZeroMQ spec's own test vector."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from novelti_dingo_spark.sources.roaring import (
    MAGIC,
    RoaringFormatError,
    deserialize_roaring64,
    serialize_roaring64,
    z85_decode,
    z85_encode,
)


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0],
        [2**32 - 1, 2**32, 2**32 + 1],          # bucket boundary
        list(range(5000)),                       # bitmap container
        list(range(0, 70000, 7)),                # two 16-bit keys
        [2**40, 2**40 + 65536, 3],               # sparse high buckets
    ],
)
def test_roundtrip_shapes(vals):
    got = deserialize_roaring64(serialize_roaring64(vals)).tolist()
    assert got == sorted(set(vals))


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(vals):
    got = deserialize_roaring64(serialize_roaring64(vals)).tolist()
    assert got == sorted(set(vals))


def test_decodes_foreign_run_containers():
    """Cookie 12347 with run containers — the shape real writers emit
    after runOptimize(); our encoder never produces it, the decoder
    must accept it."""
    buf = bytearray()
    buf += struct.pack("<iQ", MAGIC, 1)
    buf += struct.pack("<I", 0)                  # bucket key 0
    buf += struct.pack("<I", 12347 | (1 << 16))  # 2 containers
    buf += bytes([0b01])                         # container 0 is runs
    buf += struct.pack("<HH", 0, 6 - 1)          # key 0, card 6
    buf += struct.pack("<HH", 1, 3 - 1)          # key 1, card 3
    # n=2 < 4 → no offset header
    buf += struct.pack("<H", 1)                  # 1 run
    buf += struct.pack("<HH", 100, 5)            # 100..105
    buf += struct.pack("<HHH", 7, 9, 11)         # array container
    got = deserialize_roaring64(bytes(buf)).tolist()
    assert got == list(range(100, 106)) + [65536 + 7, 65536 + 9, 65536 + 11]


def test_format_errors_are_loud():
    with pytest.raises(RoaringFormatError):
        deserialize_roaring64(b"\x00" * 4)
    with pytest.raises(RoaringFormatError):
        deserialize_roaring64(struct.pack("<iQ", 12345, 0))
    ok = serialize_roaring64([1, 2, 3])
    with pytest.raises(RoaringFormatError):
        deserialize_roaring64(ok + b"\x00")      # trailing bytes
    with pytest.raises(RoaringFormatError):
        deserialize_roaring64(
            struct.pack("<iQI", MAGIC, 1, 0) + struct.pack("<I", 99)
        )


def test_z85_spec_vector_and_roundtrip():
    # the ZeroMQ Z85 specification's reference test case
    assert z85_encode(
        bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    ) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    rng = np.random.default_rng(7)
    for n in (4, 16, 256):
        d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert z85_decode(z85_encode(d)) == d
    with pytest.raises(ValueError):
        z85_encode(b"abc")
    with pytest.raises(ValueError):
        z85_decode("abcd")
    with pytest.raises(ValueError):
        z85_decode('~~~~~')
