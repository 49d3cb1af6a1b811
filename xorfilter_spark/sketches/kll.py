"""KLL: mergeable quantile sketch with worst-case rank-error guarantees.

Published algorithm: Karnin, Lang, Liberty, "Optimal quantile approximation
in streams" (FOCS 2016); layout follows the Apache DataSketches description
(compactor levels, item at level h has weight 2^h, capacity of level h is
k * c^(H-h) with c = 2/3, floor 2).  Rank error ~ O(1/k) with k = 200
giving ~1% worst-case normalized rank error.

Determinism: compaction chooses odd/even positions from a splitmix64 chain
keyed by the number of compactions performed — no wall clock, no global
RNG — so rebuilds and resumes are reproducible.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame

from .core import sketch
from ..hashing import splitmix64

_MAGIC = b"KLL1"
_C = 2.0 / 3.0


class KLL:
    def __init__(self, k: int = 200):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.min = np.inf
        self.max = -np.inf
        self._compactions = 0

    def _capacity(self, h: int) -> int:
        height = len(self.levels)
        return max(2, int(np.ceil(self.k * _C ** (height - 1 - h))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.levels)))

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if not v.size:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.n += v.size
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact_if_needed()

    def merge(self, other: "KLL") -> None:
        if other.k != self.k:
            raise ValueError("cannot merge KLLs with different k")
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, items in enumerate(other.levels):
            if items.size:
                self.levels[h] = np.concatenate([self.levels[h], items])
        self._compact_if_needed()

    def _compact_if_needed(self) -> None:
        while sum(lvl.size for lvl in self.levels) > self._total_capacity():
            for h in range(len(self.levels)):
                if self.levels[h].size > self._capacity(h):
                    self._compact_level(h)
                    break
            else:
                break

    def _compact_level(self, h: int) -> None:
        items = np.sort(self.levels[h])
        if items.size < 2:
            return
        self._compactions += 1
        _, rnd = splitmix64(self._compactions)
        keep_odd = rnd & 1
        # promote one item from each of floor(size/2) pairs; an unpaired
        # last item stays at this level
        pairs = items.size // 2
        promoted = items[keep_odd : 2 * pairs : 2]
        remainder = items[2 * pairs :]
        self.levels[h] = remainder
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # -- query ---------------------------------------------------------------
    def _weighted_items(self):
        items, weights = [], []
        for h, lvl in enumerate(self.levels):
            if lvl.size:
                items.append(lvl)
                weights.append(np.full(lvl.size, 1 << h, dtype=np.float64))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q: float) -> float:
        it, w = self._weighted_items()
        if not it.size:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, it.size - 1)
        return float(it[i])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, value: float) -> float:
        """Approximate normalized rank of value."""
        it, w = self._weighted_items()
        if not it.size:
            return float("nan")
        mask = it <= value
        return float(w[mask].sum() / w.sum())

    # -- codec ---------------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack(
            "<IQddII", self.k, self.n, self.min, self.max, len(self.levels), self._compactions
        )
        parts = [head]
        for lvl in self.levels:
            parts.append(struct.pack("<Q", lvl.size))
            parts.append(lvl.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        if buf[:4] != _MAGIC:
            raise ValueError("bad KLL state")
        k, n, mn, mx, nlev, comps = struct.unpack("<IQddII", buf[4:40])
        out = cls(k)
        out.n, out.min, out.max, out._compactions = n, mn, mx, comps
        out.levels = []
        off = 40
        for _ in range(nlev):
            sz = struct.unpack("<Q", buf[off : off + 8])[0]
            off += 8
            out.levels.append(np.frombuffer(buf[off : off + 8 * sz], dtype=np.float64).copy())
            off += 8 * sz
        return out


def kll_build(df: DataFrame, col: str, k: int = 200) -> KLL:
    """Distributed KLL over a numeric column (no raw-row shuffle)."""
    return sketch(df, col, lambda: KLL(k), KLL, hash_input=False)
