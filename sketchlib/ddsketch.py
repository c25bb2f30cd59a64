"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee,
"DDSketch: a fast and fully-mergeable quantile sketch with relative-error
guarantees", VLDB 2019) — from scratch.

Complements the library's t-digest (rank-error guarantee) and KLL
(normalized-rank error) with the third published quantile-error model:
**relative VALUE error** — every returned quantile x̂ satisfies
|x̂ − x_q| ≤ α·|x_q| regardless of the value's magnitude, which is the
guarantee you want for long-tailed web metrics (latency, doc length,
bytes) where p99 may be 10^4× the median.

Design (paper §2, collapsing-lowest variant §2.3):

* geometric buckets: γ = (1+α)/(1−α); a positive value v lands in bucket
  ``i = ceil(log_γ v)``, i.e. bucket i covers (γ^(i−1), γ^i].  The bucket
  midpoint-in-log-space ``2·γ^i/(γ+1)`` is within relative α of EVERY
  value in the bucket — that is the whole guarantee.
* three stores: positives (bucket→count), negatives (buckets of −v), and
  an exact zero/underflow counter.  Exact min/max ride along so q→0/1
  clamp to true extremes (same courtesy as the t-digest).
* collapsing-lowest: when a store exceeds ``max_bins`` buckets, all mass
  below the ``max_bins``-th largest bucket index collapses into that
  boundary bucket.  Upper quantiles keep the α guarantee; collapsed
  low-rank mass degrades gracefully (paper Theorem 3).  2048 bins at
  α=0.01 span > 10^17 dynamic range uncollapsed.

Exact merge laws — stronger than KLL's within-bound associativity:
merging is pointwise bucket addition, and the collapse boundary is a
function of the bucket-key SET alone, so collapse∘merge is **bitwise
associative and commutative** (any fold shape over any partition order
yields byte-identical serialized sketches; proved in
tests/test_ddsketch.py).  That makes DDSketch the cheapest family to
verify in a shuffle-reduce: no tolerance needed, just ==.

State is O(max_bins) ints (≤ ~25 KB wire at 2048 bins) independent of n —
small-state in sketch_ops terms, so merges take the repartition-
accumulator path like HLL/KLL/KMV/MG.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.aggregator import Aggregator

_MAGIC = b"DDS1"
_HEAD = "<dIqqddII"  # alpha, max_bins, zero_count, n, min, max, n_neg, n_pos


class DDSketch(Aggregator):
    __slots__ = ("alpha", "max_bins", "gamma", "_lg", "pos", "neg",
                 "zero_count", "n", "min", "max")

    def __init__(self, alpha: float = 0.01, max_bins: int = 2048) -> None:
        # lower alpha bound keeps every reachable bucket index (|ln v| ≤
        # ~745 for finite doubles, / ln γ ≈ 2α) inside the wire's int32
        if not (1e-6 <= alpha < 1.0):
            raise ValueError(
                f"DDSketch: alpha must be in [1e-6,1), got {alpha}")
        if max_bins < 2:
            raise ValueError(f"DDSketch: max_bins must be >= 2, got {max_bins}")
        self.alpha = float(alpha)
        self.max_bins = int(max_bins)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self._lg = math.log(self.gamma)
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.zero_count = 0
        self.n = 0
        self.min = math.inf
        self.max = -math.inf

    @classmethod
    def zero(cls, alpha: float = 0.01, max_bins: int = 2048) -> "DDSketch":
        return cls(alpha=alpha, max_bins=max_bins)

    # -- ingest ------------------------------------------------------------

    def _bucket_counts(self, mag: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # ±inf: bucket as the largest finite double (top bucket) — the log
        # index is undefined for inf and would wrap on the int cast; the
        # exact min/max fields still report the true infinity, so
        # quantile(0)/quantile(1) stay exact.
        mag = np.minimum(mag, np.finfo(np.float64).max)
        idx = np.ceil(np.log(mag) / self._lg).astype(np.int64)
        return np.unique(idx, return_counts=True)

    def _add_to(self, store: dict[int, int], keys: np.ndarray,
                counts: np.ndarray) -> None:
        for k, c in zip(keys.tolist(), counts.tolist()):
            store[k] = store.get(k, 0) + c
        self._collapse(store)

    def _collapse(self, store: dict[int, int]) -> None:
        if len(store) <= self.max_bins:
            return
        keys = sorted(store)
        boundary = keys[len(keys) - self.max_bins]
        spill = 0
        for k in keys:
            if k >= boundary:
                break
            spill += store.pop(k)
        store[boundary] += spill

    def update_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        p = v[v > 0.0]
        m = v[v < 0.0]
        self.zero_count += len(v) - len(p) - len(m)
        if len(p):
            self._add_to(self.pos, *self._bucket_counts(p))
        if len(m):
            self._add_to(self.neg, *self._bucket_counts(-m))

    # -- merge -------------------------------------------------------------

    def merge(self, other: "DDSketch") -> "DDSketch":
        if (other.alpha != self.alpha) or (other.max_bins != self.max_bins):
            raise ValueError(
                "DDSketch merge parameter mismatch: "
                f"(alpha={self.alpha}, max_bins={self.max_bins}) vs "
                f"(alpha={other.alpha}, max_bins={other.max_bins})"
            )
        for store, ostore in ((self.pos, other.pos), (self.neg, other.neg)):
            for k, c in ostore.items():
                store[k] = store.get(k, 0) + c
            self._collapse(store)
        self.zero_count += other.zero_count
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        return self

    # -- queries -----------------------------------------------------------

    def _bucket_value(self, idx: int, sign: float) -> float:
        # midpoint-in-log-space of (γ^(i−1), γ^i]: within α of every member.
        # Computed in log space: the top reachable bucket (mag clamped to
        # DBL_MAX on ingest) has γ^i ≥ DBL_MAX, where a direct pow raises
        # OverflowError — saturate to ±inf and let the min/max clip in
        # quantile() bring it back to the true extreme.
        ln = idx * self._lg + math.log(2.0 / (self.gamma + 1.0))
        if ln >= 709.782712893384:  # ln(DBL_MAX)
            return sign * math.inf
        return sign * math.exp(ln)

    def quantile(self, ps) -> np.ndarray:
        """Value estimates at quantiles ``ps`` (paper rank ⌊q·(n−1)⌋ over
        the sorted multiset).  NaN on an empty sketch; q=0/1 clamp to the
        exact tracked min/max."""
        ps_arr = np.atleast_1d(np.asarray(ps, dtype=np.float64))
        if self.n == 0:
            return np.full(ps_arr.shape, np.nan)
        # ascending value order: most-negative first = neg store by
        # DESCENDING bucket index, then zeros, then pos ascending
        vals: list[float] = []
        cums: list[int] = []
        run = 0
        for k in sorted(self.neg, reverse=True):
            run += self.neg[k]
            vals.append(self._bucket_value(k, -1.0))
            cums.append(run)
        if self.zero_count:
            run += self.zero_count
            vals.append(0.0)
            cums.append(run)
        for k in sorted(self.pos):
            run += self.pos[k]
            vals.append(self._bucket_value(k, 1.0))
            cums.append(run)
        cums_arr = np.asarray(cums, dtype=np.int64)
        vals_arr = np.asarray(vals, dtype=np.float64)
        ranks = np.floor(np.clip(ps_arr, 0.0, 1.0) * (self.n - 1)).astype(np.int64)
        pos = np.searchsorted(cums_arr, ranks + 1, side="left")
        out = vals_arr[np.clip(pos, 0, len(vals_arr) - 1)]
        out = np.clip(out, self.min, self.max)
        out[ps_arr <= 0.0] = self.min
        out[ps_arr >= 1.0] = self.max
        return out

    def rank(self, x: float) -> float:
        """Approximate CDF: fraction of ingested values ≤ x (bucket
        granularity: a bucket counts as ≤ x iff its midpoint estimate is)."""
        if self.n == 0:
            return float("nan")
        c = 0
        for k, v in self.neg.items():
            if self._bucket_value(k, -1.0) <= x:
                c += v
        if x >= 0.0:
            c += self.zero_count
        for k, v in self.pos.items():
            if self._bucket_value(k, 1.0) <= x:
                c += v
        return c / self.n

    # -- wire --------------------------------------------------------------

    def serialize(self) -> bytes:
        """Canonical (sorted-key) layout — byte equality ⇔ state equality,
        which is what the bitwise merge-law tests and the shuffle-reduce
        verification lean on."""
        head = _MAGIC + struct.pack(
            _HEAD, self.alpha, self.max_bins, self.zero_count, self.n,
            self.min, self.max, len(self.neg), len(self.pos),
        )
        parts = [head]
        for store in (self.neg, self.pos):
            for k in sorted(store):
                parts.append(struct.pack("<iq", k, store[k]))
        return b"".join(parts)

    @classmethod
    def deserialize(cls, data: bytes, **_: object) -> "DDSketch":
        if data[:4] != _MAGIC:
            raise ValueError("DDSketch: bad magic")
        hsize = struct.calcsize(_HEAD)
        if len(data) < 4 + hsize:
            raise ValueError(f"DDSketch blob too short: {len(data)} bytes")
        alpha, max_bins, zc, n, mn, mx, n_neg, n_pos = struct.unpack_from(
            _HEAD, data, 4)
        out = cls(alpha=alpha, max_bins=max_bins)
        out.zero_count, out.n, out.min, out.max = zc, n, mn, mx
        off = 4 + hsize
        rec = struct.calcsize("<iq")
        need = off + rec * (n_neg + n_pos)
        if len(data) != need:
            raise ValueError(
                f"DDSketch blob size mismatch: {len(data)} != {need}")
        for store, cnt in ((out.neg, n_neg), (out.pos, n_pos)):
            for _ in range(cnt):
                k, c = struct.unpack_from("<iq", data, off)
                off += rec
                if c <= 0:
                    raise ValueError("DDSketch: non-positive bucket count")
                store[k] = c
        return out

    def finish(self) -> "DDSketch":
        return self
