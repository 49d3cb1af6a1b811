"""Minimal CBOR (RFC 8949) encoder/decoder — no third-party deps.

Covers the data model the filter CBOR payloads need: unsigned/negative
integers, byte strings, text strings, arrays, maps, booleans and null.
Deterministic encoding: shortest-form integer heads, definite lengths,
map keys in insertion order (the filter payloads use a fixed field order,
mirroring the reference's ``Cborize`` derive field order,
/root/reference/src/xor8/filter.rs:354-362).

This backs the reference's feature-gated CBOR surface (``into_cbor`` /
``from_cbor`` for Xor8/Fuse8/Fuse16 — src/xor8/filter.rs:369-402,
src/fuse8.rs:562-621, src/fuse16.rs:461-519).  The *logical* content
(field names, ID string, values) matches the reference's intermediate
Cbor structs; the byte layout is standard RFC 8949 rather than the
``cbordata`` crate's envelope (no Rust-emitted artifact exists in the
reference to pin the envelope bytes against).

Envelope-pinning attempt (round 3): the sandbox's Rust toolchain builds
the reference crate offline (which produced the ^TL2 V2 cross-
implementation goldens in tests/golden/), but the optional ``cbordata``
dependency cannot be fetched — the crates registry is unreachable from
this environment — so no crate-emitted CBOR artifact could be generated.
The ^TL2 byte loop is pinned in both directions instead
(tests/test_codec_golden.py::test_rust_v2_read_golden / _parses_our_v2).
"""

from __future__ import annotations

import struct
from typing import Any

_MT_UINT = 0
_MT_NINT = 1
_MT_BYTES = 2
_MT_TEXT = 3
_MT_ARRAY = 4
_MT_MAP = 5
_MT_SIMPLE = 7


def _head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < (1 << 8):
        return bytes([(major << 5) | 24, arg])
    if arg < (1 << 16):
        return bytes([(major << 5) | 25]) + struct.pack(">H", arg)
    if arg < (1 << 32):
        return bytes([(major << 5) | 26]) + struct.pack(">I", arg)
    if arg < (1 << 64):
        return bytes([(major << 5) | 27]) + struct.pack(">Q", arg)
    raise ValueError("integer too large for CBOR head")


def encode(obj: Any) -> bytes:
    out = bytearray()
    _encode_into(obj, out)
    return bytes(out)


def _encode_into(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xF6)
    elif obj is True:
        out.append(0xF5)
    elif obj is False:
        out.append(0xF4)
    elif isinstance(obj, int):
        if obj >= 0:
            out += _head(_MT_UINT, obj)
        else:
            out += _head(_MT_NINT, -1 - obj)
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        out += _head(_MT_BYTES, len(b))
        out += b
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out += _head(_MT_TEXT, len(b))
        out += b
    elif isinstance(obj, (list, tuple)):
        out += _head(_MT_ARRAY, len(obj))
        for v in obj:
            _encode_into(v, out)
    elif isinstance(obj, dict):
        out += _head(_MT_MAP, len(obj))
        for k, v in obj.items():
            _encode_into(k, out)
            _encode_into(v, out)
    else:
        raise TypeError(f"cannot CBOR-encode {type(obj).__name__}")


def decode(buf: bytes) -> Any:
    obj, end = _decode_at(memoryview(buf), 0)
    if end != len(buf):
        raise ValueError(f"trailing bytes after CBOR item ({len(buf) - end})")
    return obj


def _decode_at(buf: memoryview, i: int):
    if i >= len(buf):
        raise ValueError("truncated CBOR")
    ib = buf[i]
    major, info = ib >> 5, ib & 0x1F
    i += 1
    if major == _MT_SIMPLE:
        if ib == 0xF6:
            return None, i
        if ib == 0xF5:
            return True, i
        if ib == 0xF4:
            return False, i
        raise ValueError(f"unsupported simple value 0x{ib:02x}")
    if info < 24:
        arg = info
    elif info == 24:
        arg = buf[i]
        i += 1
    elif info == 25:
        arg = struct.unpack_from(">H", buf, i)[0]
        i += 2
    elif info == 26:
        arg = struct.unpack_from(">I", buf, i)[0]
        i += 4
    elif info == 27:
        arg = struct.unpack_from(">Q", buf, i)[0]
        i += 8
    else:
        raise ValueError("indefinite lengths not supported")
    if major == _MT_UINT:
        return arg, i
    if major == _MT_NINT:
        return -1 - arg, i
    if major == _MT_BYTES:
        return bytes(buf[i : i + arg]), i + arg
    if major == _MT_TEXT:
        return bytes(buf[i : i + arg]).decode("utf-8"), i + arg
    if major == _MT_ARRAY:
        items = []
        for _ in range(arg):
            v, i = _decode_at(buf, i)
            items.append(v)
        return items, i
    if major == _MT_MAP:
        d = {}
        for _ in range(arg):
            k, i = _decode_at(buf, i)
            v, i = _decode_at(buf, i)
            d[k] = v
        return d, i
    raise ValueError(f"unsupported major type {major}")
