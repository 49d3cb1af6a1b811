"""HyperLogLog: mergeable cardinality sketch (dense registers).

Published algorithm: Flajolet et al. 2007 + the 64-bit practice from
Heule et al. 2013 (HLL++): with a 64-bit hash there is no large-range
correction; small range uses linear counting.  Standard error 1.04/sqrt(m).

The north rule uses HLL for *cardinality-gated sizing* of the filter bank
(estimate distinct keys first, pick shard count / fuse geometry from it) —
the Spark analog of Fuse8::new taking ``size`` upfront
(/root/reference/src/fuse8.rs:209-259).
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .core import agg_by, sketch

_MAGIC = b"HLL1"

# bit_length lookup for one byte
_BITLEN8 = np.zeros(256, dtype=np.uint8)
for _i in range(1, 256):
    _BITLEN8[_i] = _i.bit_length()


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (float log2 is lossy >2^53)."""
    b = np.ascontiguousarray(w, dtype="<u8").view(np.uint8).reshape(-1, 8)
    nz = b != 0
    msb = 7 - np.argmax(nz[:, ::-1], axis=1)
    blen = msb.astype(np.int64) * 8 + _BITLEN8[b[np.arange(b.shape[0]), msb]]
    blen[~nz.any(axis=1)] = 0
    return blen


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HLL:
    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update(self, values: np.ndarray) -> None:
        """values: int64/uint64 digests (already hashed)."""
        u = np.asarray(values).astype(np.uint64)
        idx = (u >> np.uint64(64 - self.p)).astype(np.int64)
        w = u << np.uint64(self.p)  # remaining bits, left-aligned
        # rho = leading zeros of the 64-bit suffix + 1 = 64 - bit_length + 1
        rho = (65 - _bit_length_u64(w)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HLL") -> None:
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = self.m
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = _alpha(m) * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<I", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HLL":
        if buf[:4] != _MAGIC:
            raise ValueError("bad HLL state")
        p = struct.unpack("<I", buf[4:8])[0]
        out = cls(p)
        out.registers = np.frombuffer(buf[8:], dtype=np.uint8).copy()
        return out


def hll_count_distinct(df: DataFrame, col: str, p: int = 14) -> float:
    """Distributed cardinality estimate (error ~1.04/sqrt(2^p))."""
    return sketch(df, col, lambda: HLL(p), HLL).estimate()


def hll_count_distinct_by(df: DataFrame, group_cols: list[str], col: str, p: int = 12) -> DataFrame:
    """Per-group HLL estimates, shuffling only sketch states."""
    return agg_by(
        df,
        group_cols,
        col,
        lambda: HLL(p),
        HLL,
        lambda acc: {"approx_distinct": float(acc.estimate())},
        [T.StructField("approx_distinct", T.DoubleType(), False)],
    )
