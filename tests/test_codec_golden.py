"""Golden-file parity with the reference crate.

The reference ships a V1-serialized Xor8 filter
(/root/reference/tests/tl1-serialized.data) built over u32 keys
``(1..10000).map(|i| i*2+1)`` with Rust's default hasher, and asserts all
those keys are contained while evens 2..38 are not
(tests/xorfilter.rs:38-63).  We parse the same bytes with our codec,
re-derive digests with the library's SipHash-1-3 (matching Rust's
``DefaultHasher``: keys (0,0); integers hash their native-endian bytes),
and probe with our numpy lookup — exact behavioral parity across
implementations, file format and hash function.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from xorfilter_spark.codec import shard_from_bytes
from xorfilter_spark.hashing import siphash13, siphash13_rust_str
from xorfilter_spark.kernels.xor8 import lookup_xor8

GOLDEN = "/root/reference/tests/tl1-serialized.data"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference data absent")
def test_golden_v1_membership():
    with open(GOLDEN, "rb") as f:
        shard = shard_from_bytes(f.read())
    assert shard["block_length"] * 3 == len(shard["fingerprints"])

    keys = [(i * 2) + 1 for i in range(1, 10000)]
    missing = [i * 2 for i in range(1, 20)]
    # Rust: Hash for u32 -> Hasher::write_u32 -> write(native-endian bytes)
    dk = np.array(
        [siphash13(k.to_bytes(4, "little")) for k in keys], dtype=np.uint64
    )
    dm = np.array(
        [siphash13(k.to_bytes(4, "little")) for k in missing], dtype=np.uint64
    )
    fp = np.frombuffer(shard["fingerprints"], dtype=np.uint8)
    hits = lookup_xor8(dk, shard["seed"], shard["block_length"], fp)
    assert hits.all(), f"{(~hits).sum()} golden keys missing"
    miss_hits = lookup_xor8(dm, shard["seed"], shard["block_length"], fp)
    assert not miss_hits.any(), "golden negatives reported present"


def test_siphash13_self_consistency():
    vals = {siphash13(b""), siphash13(b"a"), siphash13(b"12345678"),
            siphash13(b"123456789")}
    assert len(vals) == 4
    assert siphash13_rust_str("abc") != siphash13(b"abc")


def test_tl2_file_roundtrip_bank(spark, tmp_path):
    """write_bank_tl2 -> raw ^TL2 files on disk -> read_bank_tl2 -> the
    same probeable bank (the file-level loop the parquet checkpoint does
    not cover; VERDICT r1 missing item 2)."""
    from xorfilter_spark import bank as B

    df = spark.createDataFrame(
        [(f"https://example.org/{i}",) for i in range(5000)], "url string"
    )
    bank = B.build_bank(df, "url", num_shards=4)
    d = str(tmp_path / "tl2")
    assert B.write_bank_tl2(bank, d) == 4
    back = B.read_bank_tl2(spark, d)
    key = lambda rows: sorted(
        (r["shard"], r["seed"], r["block_length"], bytes(r["fingerprints"]),
         r["num_keys"], r["num_shards"], r["hash_strategy"])
        for r in rows
    )
    assert key(back.collect()) == key(bank.collect())
    probed = B.contains(df, "url", back, "hit")
    assert probed.where(~F.col("hit")).count() == 0


def test_tl2_write_side_golden(tmp_path):
    """Write-side layout check: our emitted bytes carry the ^TL2 signature,
    parse as V2, and field-roundtrip — including an empty hasher payload
    (what Rust's BuildHasherDefault serializes)."""
    from xorfilter_spark.codec import (
        SIGNATURE_V2,
        read_filter_file,
        write_filter_file,
    )

    fp = bytes(range(256)) * 3
    p = str(tmp_path / "one.tl2")
    write_filter_file(p, seed=0xDEADBEEF12345678, block_length=256, fingerprints=fp)
    raw = open(p, "rb").read()
    assert raw[:4] == SIGNATURE_V2
    assert len(raw) == 4 + 8 + 4 + 4 + 4 + len(fp)  # exact layout, no slack
    back = read_filter_file(p)
    assert back["version"] == 2
    assert back["seed"] == 0xDEADBEEF12345678
    assert back["block_length"] == 256
    assert back["fingerprints"] == fp
    assert back["hasher"] == b""


def test_siphash13_batch_matches_scalar():
    """The vectorized word-column batch form is bit-identical to the scalar
    reference implementation across lengths 0..40 and both key shapes."""
    from xorfilter_spark.hashing import siphash13_batch, siphash13_batch_rust_str

    payloads = [bytes(range(n)) for n in range(41)] + [b"\xff" * 8, b"\x00" * 16]
    got = siphash13_batch(payloads)
    want = np.array([siphash13(p) for p in payloads], dtype=np.uint64)
    assert (got == want).all()
    strs = ["", "a", "abcdefg", "abcdefgh", "https://example.org/p/12345"]
    got_s = siphash13_batch_rust_str(strs)
    want_s = np.array([siphash13_rust_str(s) for s in strs], dtype=np.uint64)
    assert (got_s == want_s).all()


def test_siphash13_nulls_dropped(spark):
    """Null keys must be dropped by the build under every hash strategy
    (previously siphash13 mapped null -> digest 0 and indexed it)."""
    from xorfilter_spark import bank as B

    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "url string"
    )
    for strat in ("xxhash64", "siphash13", "murmur64"):
        col = "url" if strat != "murmur64" else "k"
        d = df if strat != "murmur64" else spark.createDataFrame(
            [(1,), (None,), (2,)], "k long"
        )
        bank = B.build_bank(d, col, num_shards=2, hash_strategy=strat)
        n_keys = B.bank_len(bank)
        assert n_keys == d.where(F.col(col).isNotNull()).distinct().count()


def test_bank_siphash13_strategy(spark):
    """End-to-end: bank built + probed with the Rust-compatible hasher."""
    from xorfilter_spark import bank as B

    df = spark.createDataFrame(
        [(f"https://example.org/{i}",) for i in range(2000)], "url string"
    )
    bank = B.build_bank(df, "url", num_shards=4, hash_strategy="siphash13")
    probed = B.contains(df, "url", bank, "hit")
    assert probed.where(~F.col("hit")).count() == 0
    miss = spark.createDataFrame(
        [(f"https://absent.org/{i}",) for i in range(2000)], "url string"
    )
    fpp = B.contains(miss, "url", bank, "hit").where(F.col("hit")).count() / 2000
    assert fpp <= 0.02
