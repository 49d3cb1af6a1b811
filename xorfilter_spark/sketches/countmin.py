"""Count-min sketch: mergeable (elementwise-add) frequency sketch.

Published algorithm: Cormode & Muthukrishnan 2005.  With width w and depth
d, point estimates overshoot true counts by at most eps*N (eps = e/w) with
probability 1 - delta (delta = e^-d); never undershoot.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame

from .core import sketch

_MAGIC = b"CMS1"


class CountMin:
    def __init__(self, width: int = 16384, depth: int = 5):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    def _cols(self, values: np.ndarray) -> np.ndarray:
        u = np.asarray(values).astype(np.uint64)
        h1 = u & np.uint64(0xFFFFFFFF)
        h2 = (u >> np.uint64(32)) | np.uint64(1)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1 + i * h2) % np.uint64(self.width)).astype(np.int64)

    def update(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        cols = self._cols(values)
        w = np.ones(cols.shape[1], dtype=np.int64) if weights is None else np.asarray(weights, dtype=np.int64)
        for d in range(self.depth):
            np.add.at(self.table[d], cols[d], w)
        self.total += int(w.sum())

    def query(self, values: np.ndarray) -> np.ndarray:
        cols = self._cols(values)
        est = self.table[np.arange(self.depth)[:, None], cols]
        return est.min(axis=0)

    def merge(self, other: "CountMin") -> None:
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge CountMin with different geometry")
        self.table += other.table
        self.total += other.total

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<IIq", self.width, self.depth, self.total) + self.table.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMin":
        if buf[:4] != _MAGIC:
            raise ValueError("bad CountMin state")
        width, depth, total = struct.unpack("<IIq", buf[4:20])
        out = cls(width, depth)
        out.table = np.frombuffer(buf[20:], dtype=np.int64).reshape(depth, width).copy()
        out.total = total
        return out


def countmin_build(df: DataFrame, col: str, width: int = 16384, depth: int = 5) -> CountMin:
    """Distributed count-min build over ``df[col]`` occurrences."""
    return sketch(df, col, lambda: CountMin(width, depth), CountMin)
