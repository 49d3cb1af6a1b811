"""Hypothesis property tests for the pure-python/numpy core (no Spark).

Mirrors the reference's seeded-randomized property-test style
(/root/reference/src/xor8/xor8_test.rs:16-34): random key sets of random
sizes, every invariant must hold for every draw.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xorfilter_spark.codec import shard_from_bytes, shard_to_bytes
from xorfilter_spark.hashing import siphash13
from xorfilter_spark.kernels.fuse import build_fuse, lookup_fuse
from xorfilter_spark.kernels.xor8 import build_xor8, lookup_xor8


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(0, 5000),
)
def test_xor8_no_false_negatives(seed, n):
    d = np.random.default_rng(seed).integers(0, 2**63, max(n, 1), dtype=np.int64)
    d = d.astype(np.uint64)[:n]
    r = build_xor8(d)
    assert r["num_keys"] == np.unique(d).size
    if n:
        assert lookup_xor8(d, r["seed"], r["block_length"], r["fingerprints"]).all()


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(0, 3000),
    fp_bits=st.sampled_from([8, 16]),
    arity=st.sampled_from([3, 4]),
)
def test_fuse_no_false_negatives(seed, n, fp_bits, arity):
    d = np.random.default_rng(seed).integers(0, 2**63, max(n, 1), dtype=np.int64)
    d = d.astype(np.uint64)[:n]
    r = build_fuse(d, fp_bits=fp_bits, arity=arity)
    if n:
        assert lookup_fuse(
            d,
            r["seed"],
            r["segment_length"],
            r["segment_count"],
            r["fingerprints"],
            arity=arity,
        ).all()


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**64 - 1),
    block_length=st.integers(1, 4096),
    data=st.binary(min_size=0, max_size=2048),
)
def test_codec_roundtrip_property(seed, block_length, data):
    fp = (data * ((3 * block_length) // max(len(data), 1) + 1))[: 3 * block_length]
    buf = shard_to_bytes(seed, block_length, fp)
    back = shard_from_bytes(buf)
    assert back["seed"] == seed
    assert back["block_length"] == block_length
    assert back["fingerprints"] == fp


@settings(max_examples=50, deadline=None)
@given(data=st.binary(min_size=0, max_size=64))
def test_siphash13_deterministic_and_spread(data):
    a = siphash13(data)
    assert a == siphash13(data)
    assert 0 <= a < 2**64
    # single-byte flip changes the digest (avalanche sanity)
    if data:
        flipped = bytes([data[0] ^ 1]) + data[1:]
        assert siphash13(flipped) != a


@settings(max_examples=50, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=50)
)
def test_siphash13_batch_property(payloads):
    """Word-column batch SipHash is bit-identical to the scalar reference
    for arbitrary byte strings of mixed lengths."""
    from xorfilter_spark.hashing import siphash13_batch

    got = siphash13_batch(payloads)
    want = np.array([siphash13(p) for p in payloads], dtype=np.uint64)
    assert (got == want).all()


_cbor_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.binary(max_size=64),
    st.text(max_size=32),
)
_cbor_values = st.recursive(
    _cbor_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=8), children, max_size=6),
    ),
    max_leaves=20,
)


@settings(max_examples=100, deadline=None)
@given(value=_cbor_values)
def test_cbor_roundtrip_property(value):
    from xorfilter_spark.cbor import decode, encode

    assert decode(encode(value)) == value
