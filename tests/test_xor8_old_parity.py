"""Parity with the reference's deprecated ``xor8_old`` module (SURVEY §2 #28).

The deprecated ``Xor8`` (/root/reference/src/xor8_old.rs, re-exported as
deprecated since 0.6.0 at src/lib.rs:135-137) is the same filter as the
current ``xor8::{Xor8, Xor8Builder}`` in every observable way.  This module
pins the equivalence facts with runnable checks so #28 coverage is proved
rather than asserted:

* construction is line-identical between the two Rust modules — capacity
  ``(32 + ceil(1.23 n)) / 3 * 3`` and the splitmix64 retry-seed schedule
  starting at counter 1 (xor8_old.rs:202-216 vs xor8/builder.rs:144-151) —
  so any filter the old module builds, the new module builds byte-for-byte,
  and the Rust-crate goldens in tests/test_codec_golden.py cover both;
* serialization is line-identical — same ``^TL1``/``^TL2`` signatures and
  big-endian field order (xor8_old.rs:472-560 vs xor8/filter.rs:228-348);
  the crate's shipped V1 golden file is readable by both modules and by us;
* the one API-level difference is dedup-at-insert (old keeps a
  ``BTreeMap<u64, ()>``, xor8_old.rs:157-183; the builder keeps a
  ``HashSet<u64>``, builder.rs:87-117) — both mean "duplicate keys count
  once", which is exactly our kernel's ``np.unique`` dedup.
"""

import math
import os
import struct

import numpy as np
import pytest

from xorfilter_spark.codec import shard_from_bytes, shard_to_bytes
from xorfilter_spark.hashing import (
    XOR8_RNG_COUNTER,
    seed_sequence,
    xor8_geometry,
)
from xorfilter_spark.kernels.xor8 import build_xor8, lookup_xor8

GOLDEN_V1 = "/root/reference/tests/tl1-serialized.data"

MASK64 = (1 << 64) - 1


def _splitmix64_published(state: int) -> tuple[int, int]:
    """Independent splitmix64 (Vigna 2015, public domain), written from the
    published algorithm — NOT imported from the library — so the seed-schedule
    check below is not circular."""
    state = (state + 0x9E3779B97F4A7C15) & MASK64
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return state, (z ^ (z >> 31)) & MASK64


def test_old_capacity_rule_exact():
    """xor8_old.rs:204-207 computes capacity = 32 + ceil(1.23*size), rounded
    down to a multiple of 3 — character-identical to builder.rs:145-148.  Our
    geometry must match the shared formula at every probed size."""
    for size in (0, 1, 2, 3, 100, 9999, 10_000, 123_456, 1_000_000):
        cap_old = (32 + math.ceil(1.23 * size)) // 3 * 3
        capacity, block_length = xor8_geometry(size)
        assert capacity == cap_old, size
        assert block_length == cap_old // 3, size


def test_old_seed_schedule_counter_one():
    """xor8_old.rs:202 starts ``rngcounter = 1`` and takes
    ``splitmix64(&mut rngcounter)`` per attempt (xor8_old.rs:208, retry at
    :371) — same as builder.rs:144,149,312.  Our schedule must emit the same
    u64 stream, checked against an independent splitmix64."""
    assert XOR8_RNG_COUNTER == 1
    seeds = seed_sequence(XOR8_RNG_COUNTER)
    state = 1
    for _ in range(5):
        state, expected = _splitmix64_published(state)
        assert next(seeds) == expected


def test_old_tobytes_field_order_independent_decode():
    """Decode our ^TL2 bytes with a from-scratch reader that follows
    xor8_old::from_bytes (xor8_old.rs:517-560) field by field: 4-byte
    signature, u64 BE seed, u32 BE block_length, u32 BE fp_len, u32 BE
    hb_len, fingerprints, hash-builder bytes.  If the old module's parser
    accepts our writer's layout, the formats are one format."""
    digests = np.arange(1, 5001, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    shard = build_xor8(digests)
    buf = shard_to_bytes(
        shard["seed"], shard["block_length"], shard["fingerprints"].tobytes(),
        hasher=b"nohash",
    )

    # xor8_old.rs:530-534: signature dispatch (V2 here)
    assert buf[:4] == b"^TL\x02"
    n = 4
    seed = struct.unpack(">Q", buf[n : n + 8])[0]          # :541-542
    n += 8
    block_length = struct.unpack(">I", buf[n : n + 4])[0]  # :544-545
    n += 4
    fp_len = struct.unpack(">I", buf[n : n + 4])[0]        # :547-548
    n += 4
    hb_len = struct.unpack(">I", buf[n : n + 4])[0]        # :550-551
    n += 4
    assert len(buf) - n == fp_len + hb_len                 # :553-555
    fingerprints = buf[n : n + fp_len]                     # :558
    hash_builder = buf[n + fp_len : n + fp_len + hb_len]   # :560

    assert seed == shard["seed"]
    assert block_length == shard["block_length"]
    assert fp_len == 3 * block_length
    assert hash_builder == b"nohash"
    hits = lookup_xor8(
        digests, seed, block_length, np.frombuffer(fingerprints, dtype=np.uint8)
    )
    assert hits.all()


@pytest.mark.skipif(not os.path.exists(GOLDEN_V1), reason="reference data absent")
def test_old_v1_golden_geometry():
    """The crate's shipped V1 golden (tests/tl1-serialized.data, 9,999 keys
    ``(1..10000).map(|i| i*2+1)``, tests/xorfilter.rs:38-63) must carry
    exactly the geometry xor8_old's capacity rule dictates for 9,999 keys —
    tying the golden bytes to the old module's build, not just to a reader."""
    with open(GOLDEN_V1, "rb") as f:
        shard = shard_from_bytes(f.read())
    assert shard["version"] == 1
    cap_old, block_old = xor8_geometry(9999)
    assert shard["block_length"] == block_old
    assert len(shard["fingerprints"]) == cap_old


def test_old_insert_dedup_semantics():
    """xor8_old::insert/populate/populate_keys dedup through a BTreeMap
    (xor8_old.rs:157-183): N inserts of one key are one key.  Our kernel's
    np.unique gives the same semantics, and the deduped filter still answers
    membership for every original (duplicated) probe."""
    base = np.arange(1, 1001, dtype=np.uint64) * np.uint64(0xDEADBEEF97F4A7C1)
    dup = np.concatenate([base, base[: 500], base[: 250]])
    shard = build_xor8(dup)
    assert shard["num_keys"] == base.size
    capacity, block_length = xor8_geometry(base.size)
    assert shard["block_length"] == block_length
    hits = lookup_xor8(
        dup, shard["seed"], shard["block_length"], shard["fingerprints"]
    )
    assert hits.all()
