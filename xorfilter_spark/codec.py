"""Exact binary codec for a single bank shard — layout parity with the
reference's versioned format (/root/reference/src/xor8/filter.rs:228-348):

    [^TL2][seed: 8 bytes BE][block_length: 4 BE][fp_len: 4 BE]
    [hasher_len: 4 BE][fingerprints][hasher bytes]

V1 legacy layout (src/xor8/filter.rs:333-348) is read-supported:
    [^TL1][seed: 8 BE][block_length: 4 BE][fp_len: 4 BE][fingerprints]

The hasher payload serializes the hash-strategy name as UTF-8 (the
reference's BuildHasherDefault serializes to empty bytes,
src/hasher.rs:8-33; we carry the strategy so a deserialized shard knows how
to hash probes).
"""

from __future__ import annotations

import struct

SIGNATURE_V1 = b"^TL\x01"
SIGNATURE_V2 = b"^TL\x02"


def shard_to_bytes(seed: int, block_length: int, fingerprints: bytes, hasher: bytes = b"") -> bytes:
    if seed < 0:
        seed += 1 << 64
    return b"".join(
        [
            SIGNATURE_V2,
            struct.pack(">Q", seed),
            struct.pack(">I", block_length),
            struct.pack(">I", len(fingerprints)),
            struct.pack(">I", len(hasher)),
            bytes(fingerprints),
            hasher,
        ]
    )


def shard_from_bytes(buf: bytes) -> dict:
    if len(buf) < 24:
        raise ValueError("invalid byte slice")
    sig = bytes(buf[:4])
    if sig == SIGNATURE_V1:
        return _from_bytes_v1(buf)
    if sig != SIGNATURE_V2:
        raise ValueError("File signature incorrect")
    seed, block_length, fp_len, hb_len = struct.unpack(">QIII", buf[4:24])
    if len(buf) - 24 < fp_len + hb_len:
        raise ValueError("invalid byte slice")
    return {
        "seed": seed,
        "block_length": block_length,
        "fingerprints": bytes(buf[24 : 24 + fp_len]),
        "hasher": bytes(buf[24 + fp_len : 24 + fp_len + hb_len]),
        "version": 2,
    }


def write_filter_file(path: str, seed: int, block_length: int, fingerprints: bytes, hasher: bytes = b"") -> None:
    """Reference ``Xor8::write_file`` (src/xor8/filter.rs:245-251): dump the
    raw ^TL2 buffer to disk.  With ``hasher=b''`` the bytes match what the
    Rust crate's BuildHasherDefault filter writes (its hasher serializes to
    empty), closing the cross-implementation file loop."""
    with open(path, "wb") as f:
        f.write(shard_to_bytes(seed, block_length, fingerprints, hasher))


def read_filter_file(path: str) -> dict:
    """Reference ``Xor8::read_file`` (src/xor8/filter.rs:253-260): parse a
    raw ^TL2/^TL1 file from disk."""
    with open(path, "rb") as f:
        return shard_from_bytes(f.read())


# ---------------------------------------------------------------------------
# CBOR surface (reference feature "cbordata": into_cbor / from_cbor)
# ---------------------------------------------------------------------------

XOR8_CBOR_ID = "xor8/0.0.1"     # reference src/xor8/filter.rs:366
FUSE8_CBOR_ID = "fuse8/0.0.1"   # reference src/fuse8.rs:577
FUSE16_CBOR_ID = "fuse8/0.0.1"  # sic — the reference reuses fuse8's ID
                                # (src/fuse16.rs:477); mirrored verbatim


def xor8_to_cbor(seed: int, block_length: int, fingerprints: bytes,
                 num_keys: int | None = None, hasher: bytes = b"") -> bytes:
    """CBOR payload with the reference's CborXor8 field set
    (src/xor8/filter.rs:354-362): hash_builder, seed, num_keys,
    block_length, finger_prints — plus the version ID."""
    from .cbor import encode

    return encode(
        {
            "id": XOR8_CBOR_ID,
            "hash_builder": bytes(hasher),
            "seed": int(seed) & 0xFFFFFFFFFFFFFFFF,
            "num_keys": None if num_keys is None else int(num_keys),
            "block_length": int(block_length),
            "finger_prints": bytes(fingerprints),
        }
    )


def xor8_from_cbor(buf: bytes) -> dict:
    from .cbor import decode

    val = decode(buf)
    if val.get("id") != XOR8_CBOR_ID:
        raise ValueError(f"not an xor8 CBOR payload: id={val.get('id')!r}")
    return {
        "seed": val["seed"],
        "block_length": val["block_length"],
        "fingerprints": val["finger_prints"],
        "num_keys": val["num_keys"],
        "hasher": val["hash_builder"],
    }


def fuse_to_cbor(seed: int, segment_length: int, segment_count: int,
                 fingerprints, fp_bits: int = 8,
                 num_keys: int | None = None, hasher: bytes = b"") -> bytes:
    """CBOR payload with the reference's CborFuse8/CborFuse16 field set
    (src/fuse8.rs:562-573, src/fuse16.rs:461-472).  fuse8 fingerprints are
    a byte string (Vec<u8>); fuse16's Vec<u16> becomes an integer array."""
    from .cbor import encode

    if fp_bits == 8:
        fp_val = bytes(fingerprints)
        cid = FUSE8_CBOR_ID
    elif fp_bits == 16:
        import numpy as np

        fp_val = [int(x) for x in np.asarray(fingerprints, dtype="<u2")]
        cid = FUSE16_CBOR_ID
    else:
        raise ValueError("fp_bits must be 8 or 16")
    return encode(
        {
            "id": cid,
            "hash_builder": bytes(hasher),
            "seed": int(seed) & 0xFFFFFFFFFFFFFFFF,
            "num_keys": None if num_keys is None else int(num_keys),
            "segment_length": int(segment_length),
            "segment_length_mask": int(segment_length) - 1,
            "segment_count": int(segment_count),
            "segment_count_length": int(segment_count) * int(segment_length),
            "finger_prints": fp_val,
        }
    )


def fuse_from_cbor(buf: bytes, fp_bits: int = 8) -> dict:
    from .cbor import decode

    val = decode(buf)
    if val.get("id") != FUSE8_CBOR_ID:
        raise ValueError(f"not a fuse CBOR payload: id={val.get('id')!r}")
    fp = val["finger_prints"]
    if fp_bits == 16:
        import numpy as np

        fp = np.asarray(fp, dtype="<u2").tobytes()
    return {
        "seed": val["seed"],
        "segment_length": val["segment_length"],
        "segment_count": val["segment_count"],
        "fingerprints": fp,
        "num_keys": val["num_keys"],
        "hasher": val["hash_builder"],
    }


def _from_bytes_v1(buf: bytes) -> dict:
    seed, block_length, fp_len = struct.unpack(">QII", buf[4:20])
    if len(buf) - 20 < fp_len:
        raise ValueError("invalid byte slice")
    return {
        "seed": seed,
        "block_length": block_length,
        "fingerprints": bytes(buf[20 : 20 + fp_len]),
        "hasher": b"",
        "version": 1,
    }
