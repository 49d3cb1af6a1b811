"""t-digest: mergeable quantile sketch with tail-accurate clustering.

Published algorithm: Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests" (2019), merging-digest variant with the k1
(arcsine) scale function: cluster sizes are bounded so that each cluster
spans at most 1 unit of k(q) = (delta / 2pi) * asin(2q - 1), giving
O(1/delta) rank error at the median and much tighter error at the tails.

State: centroid (mean, weight) arrays + global min/max.  Merge =
concatenate + recompress (associative up to the documented approximation,
as in every t-digest implementation).
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame

from .core import sketch

_MAGIC = b"TDG1"
_BUFFER_FACTOR = 10


class TDigest:
    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = np.inf
        self.max = -np.inf
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    # -- ingest ------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if not v.size:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._buf.append(v)
        self._buf_n += v.size
        if self._buf_n > _BUFFER_FACTOR * self.delta:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        v = np.concatenate(self._buf)
        self._buf, self._buf_n = [], 0
        means = np.concatenate([self.means, v])
        weights = np.concatenate([self.weights, np.ones(v.size)])
        self.means, self.weights = _compress(means, weights, self.delta)

    # -- merge -------------------------------------------------------------
    def merge(self, other: "TDigest") -> None:
        other._flush()
        self._flush()
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        self.means, self.weights = _compress(means, weights, self.delta)

    # -- query -------------------------------------------------------------
    def quantile(self, q: float) -> float:
        self._flush()
        n = self.weights.sum()
        if n == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        target = q * n
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            lo_w = cum[0]
            if lo_w <= 0:
                return float(self.means[0])
            t = max(0.0, target) / lo_w
            return float(self.min + t * (self.means[0] - self.min))
        if target >= cum[-1]:
            hi_w = n - cum[-1]
            if hi_w <= 0:
                return float(self.means[-1])
            t = (target - cum[-1]) / hi_w
            return float(self.means[-1] + min(t, 1.0) * (self.max - self.means[-1]))
        i = np.searchsorted(cum, target)
        t = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
        return float(self.means[i - 1] + t * (self.means[i] - self.means[i - 1]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def count(self) -> float:
        self._flush()
        return float(self.weights.sum())

    # -- codec ---------------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._flush()
        head = _MAGIC + struct.pack("<IQdd", self.delta, self.means.size, self.min, self.max)
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        if buf[:4] != _MAGIC:
            raise ValueError("bad TDigest state")
        delta, n, mn, mx = struct.unpack("<IQdd", buf[4:32])
        out = cls(delta)
        out.min, out.max = mn, mx
        out.means = np.frombuffer(buf[32 : 32 + 8 * n], dtype=np.float64).copy()
        out.weights = np.frombuffer(buf[32 + 8 * n : 32 + 16 * n], dtype=np.float64).copy()
        return out


def _k(q: np.ndarray, delta: int) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


def _q_limit(q0: float, delta: int) -> float:
    """Largest q such that k(q) - k(q0) <= 1 (inverse of the scale fn)."""
    k0 = (delta / (2 * np.pi)) * np.arcsin(2 * q0 - 1)
    return (np.sin((k0 + 1) * 2 * np.pi / delta) + 1) / 2


def _compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Greedy in-order cluster merge bounded by the k1 scale function."""
    if means.size <= 1:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()

    out_m = np.empty(means.size, dtype=np.float64)
    out_w = np.empty(means.size, dtype=np.float64)
    j = 0
    cur_m, cur_w = means[0], weights[0]
    q0 = 0.0
    limit = _q_limit(q0, delta) * total
    done = 0.0
    for i in range(1, means.size):
        w = weights[i]
        if done + cur_w + w <= limit:
            cur_m += (means[i] - cur_m) * w / (cur_w + w)
            cur_w += w
        else:
            out_m[j], out_w[j] = cur_m, cur_w
            j += 1
            done += cur_w
            q0 = done / total
            limit = _q_limit(q0, delta) * total
            cur_m, cur_w = means[i], w
    out_m[j], out_w[j] = cur_m, cur_w
    return out_m[: j + 1].copy(), out_w[: j + 1].copy()


def tdigest_build(df: DataFrame, col: str, delta: int = 100) -> TDigest:
    """Distributed t-digest over a numeric column (no raw-row shuffle)."""
    return sketch(df, col, lambda: TDigest(delta), TDigest, hash_input=False)


def approx_quantiles(df: DataFrame, col: str, qs, delta: int = 100) -> list[float]:
    return tdigest_build(df, col, delta).quantiles(qs)
