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
