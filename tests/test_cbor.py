"""CBOR surface tests: RFC 8949 primitive golden vectors, filter payload
round-trips mirroring the reference's CborXor8/CborFuse8/CborFuse16 field
sets (feature "cbordata", src/xor8/filter.rs:354-402, src/fuse8.rs:562-621,
src/fuse16.rs:455-519), and probe-equivalence after a CBOR round-trip."""

import numpy as np
import pytest

from xorfilter_spark.cbor import decode, encode
from xorfilter_spark.codec import (
    FUSE8_CBOR_ID,
    XOR8_CBOR_ID,
    fuse_from_cbor,
    fuse_to_cbor,
    xor8_from_cbor,
    xor8_to_cbor,
)


# RFC 8949 appendix-A examples (shortest-form heads)
GOLDEN = [
    (0, bytes([0x00])),
    (1, bytes([0x01])),
    (23, bytes([0x17])),
    (24, bytes([0x18, 0x18])),
    (255, bytes([0x18, 0xFF])),
    (256, bytes([0x19, 0x01, 0x00])),
    (1000000, bytes([0x1A, 0x00, 0x0F, 0x42, 0x40])),
    (18446744073709551615, bytes([0x1B]) + b"\xff" * 8),
    (-1, bytes([0x20])),
    (-1000, bytes([0x39, 0x03, 0xE7])),
    (b"\x01\x02\x03\x04", bytes([0x44, 1, 2, 3, 4])),
    ("a", bytes([0x61, 0x61])),
    ("IETF", bytes([0x64]) + b"IETF"),
    ([1, 2, 3], bytes([0x83, 1, 2, 3])),
    ({"a": 1}, bytes([0xA1, 0x61, 0x61, 0x01])),
    (None, bytes([0xF6])),
    (True, bytes([0xF5])),
    (False, bytes([0xF4])),
]


@pytest.mark.parametrize("value,wire", GOLDEN)
def test_rfc8949_golden(value, wire):
    assert encode(value) == wire
    assert decode(wire) == value


def test_nested_roundtrip():
    obj = {
        "id": "xor8/0.0.1",
        "nested": [{"k": b"\x00" * 300}, -(1 << 40), "ümlaut"],
        "n": None,
    }
    assert decode(encode(obj)) == obj


def test_xor8_cbor_roundtrip():
    fp = bytes(range(256)) * 3
    buf = xor8_to_cbor(seed=2**63 + 17, block_length=256, fingerprints=fp,
                       num_keys=999)
    back = xor8_from_cbor(buf)
    assert back["seed"] == 2**63 + 17
    assert back["block_length"] == 256
    assert back["fingerprints"] == fp
    assert back["num_keys"] == 999
    # field set + ID match the reference's CborXor8 exactly
    raw = decode(buf)
    assert list(raw.keys()) == [
        "id", "hash_builder", "seed", "num_keys", "block_length",
        "finger_prints",
    ]
    assert raw["id"] == XOR8_CBOR_ID


def test_fuse_cbor_roundtrip_8_and_16():
    fp8 = bytes(range(100))
    b8 = fuse_to_cbor(7, segment_length=8, segment_count=10,
                      fingerprints=fp8, fp_bits=8)
    r8 = fuse_from_cbor(b8, fp_bits=8)
    assert r8["fingerprints"] == fp8
    assert decode(b8)["segment_count_length"] == 80
    assert decode(b8)["segment_length_mask"] == 7
    assert decode(b8)["id"] == FUSE8_CBOR_ID

    fp16 = np.arange(100, dtype="<u2")
    b16 = fuse_to_cbor(7, segment_length=8, segment_count=10,
                       fingerprints=fp16, fp_bits=16)
    r16 = fuse_from_cbor(b16, fp_bits=16)
    assert np.array_equal(np.frombuffer(r16["fingerprints"], dtype="<u2"), fp16)
    # reference quirk mirrored: fuse16 reuses fuse8's ID (src/fuse16.rs:477)
    assert decode(b16)["id"] == FUSE8_CBOR_ID


def test_cbor_probe_equivalence():
    """A kernel-built filter survives CBOR: same membership answers."""
    from xorfilter_spark.kernels.xor8 import build_xor8, lookup_xor8

    keys = np.arange(10_000, dtype=np.uint64) * np.uint64(0x9E3779B9)
    r = build_xor8(keys)
    buf = xor8_to_cbor(r["seed"], r["block_length"], r["fingerprints"].tobytes(),
                       num_keys=r["num_keys"])
    back = xor8_from_cbor(buf)
    fp = np.frombuffer(back["fingerprints"], dtype=np.uint8)
    hits = lookup_xor8(keys, back["seed"], back["block_length"], fp)
    assert hits.all()
    misses = lookup_xor8(keys + np.uint64(1), back["seed"],
                         back["block_length"], fp)
    assert misses.mean() < 0.01
