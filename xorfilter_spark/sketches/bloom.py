"""Bloom filter: mergeable (OR) bit-array membership sketch.

Published algorithm: Bloom 1970; k = (m/n) ln 2 optimal hash count; double
hashing g_i(x) = h1(x) + i*h2(x) (Kirsch & Mitzenmacher 2006).  Included in
the suite per the north rule; the xor/fuse bank is the space-optimal
replacement (~9.84 vs ~14.4 bits/key at 0.4% FPP), but Bloom supports
incremental insert and OR-merge of *overlapping* key sets, which the
xor bank does not (its merge law requires disjoint shards).
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import DataFrame

from .core import sketch

_MAGIC = b"BLM1"


class Bloom:
    def __init__(self, capacity: int = 1_000_000, fpp: float = 0.01):
        m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, round(self.m / max(capacity, 1) * math.log(2)))
        self.capacity = capacity
        self.fpp = fpp
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        u = np.asarray(values).astype(np.uint64)
        h1 = u & np.uint64(0xFFFFFFFF)
        h2 = (u >> np.uint64(32)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1 + i * h2) % np.uint64(self.m)).astype(np.int64)

    def update(self, values: np.ndarray) -> None:
        pos = self._positions(values).reshape(-1)
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains(self, values: np.ndarray) -> np.ndarray:
        pos = self._positions(values)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def merge(self, other: "Bloom") -> None:
        if other.m != self.m or other.k != self.k:
            raise ValueError("cannot merge Blooms with different geometry")
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).mean())

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<QId", self.m, self.k, self.fpp) + struct.pack("<Q", self.capacity) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "Bloom":
        if buf[:4] != _MAGIC:
            raise ValueError("bad Bloom state")
        m, k, fpp = struct.unpack("<QId", buf[4:24])
        capacity = struct.unpack("<Q", buf[24:32])[0]
        out = cls.__new__(cls)
        out.m, out.k, out.fpp, out.capacity = m, k, fpp, capacity
        out.bits = np.frombuffer(buf[32:], dtype=np.uint8).copy()
        return out


def bloom_build(df: DataFrame, col: str, capacity: int = 1_000_000, fpp: float = 0.01) -> Bloom:
    """Distributed Bloom build: per-partition partial bit arrays, OR-merged."""
    return sketch(df, col, lambda: Bloom(capacity, fpp), Bloom)
