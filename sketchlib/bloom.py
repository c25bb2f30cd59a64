"""Bloom filter (Bloom 1970), from scratch, vectorized.

Sized from (expected n, target fpr): m = ceil(−n·ln f / ln²2) bits,
k = max(1, round(m/n·ln2)) probes via double hashing over one 64-bit hash.
Guarantees: zero false negatives; FPR ≤ ~(1−e^{−kn/m})^k.

Merge = bitwise OR (semilattice; requires equal (m, k, seed)).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.aggregator import Aggregator
from sketchlib.hashing import double_hash, hash64

_MAGIC = b"BLM1"


class Bloom(Aggregator):
    __slots__ = ("m", "k", "seed", "bits", "n_added")

    def __init__(
        self,
        expected_n: int = 1_000_000,
        fpr: float = 0.01,
        m: int | None = None,
        k: int | None = None,
        seed: int = 7,
    ) -> None:
        if m is None:
            m = int(math.ceil(-expected_n * math.log(fpr) / (math.log(2.0) ** 2)))
        if k is None:
            k = max(1, round(m / max(expected_n, 1) * math.log(2.0)))
        self.m = m
        self.k = k
        self.seed = seed
        self.bits = np.zeros((m + 63) // 64, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def zero(cls, **params) -> "Bloom":
        return cls(**params)

    def _set_base(self, base: np.ndarray) -> None:
        if len(base) == 0:
            return
        for i in range(self.k):
            pos = double_hash(base, i, self.m)
            word = pos >> 6
            bit = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
            np.bitwise_or.at(self.bits, word, bit)
        self.n_added += len(base)

    def _test_base(self, base: np.ndarray) -> np.ndarray:
        out = np.ones(len(base), dtype=bool)
        for i in range(self.k):
            pos = double_hash(base, i, self.m)
            word = pos >> 6
            bit = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
            out &= (self.bits[word] & bit) != 0
        return out

    def update_batch(self, values: np.ndarray) -> None:
        self._set_base(hash64(values, seed=self.seed))

    def update_hashed(self, h: np.ndarray) -> None:
        """Ingest pre-hashed uint64 (e.g. Spark xxhash64); remixed with the
        seed so ``contains_hashed`` agrees."""
        self._set_base(hash64(h, seed=self.seed))

    def contains(self, values) -> np.ndarray:
        """Vectorized membership test (no false negatives)."""
        return self._test_base(hash64(values, seed=self.seed))

    def contains_hashed(self, h: np.ndarray) -> np.ndarray:
        return self._test_base(hash64(h, seed=self.seed))

    def merge(self, other: "Bloom") -> "Bloom":
        if (self.m, self.k, self.seed) != (other.m, other.k, other.seed):
            raise ValueError("Bloom merge parameter mismatch")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).sum()) / self.m

    def serialize(self) -> bytes:
        head = _MAGIC + struct.pack("<QIIq", self.m, self.k, self.seed, self.n_added)
        return head + self.bits.astype("<u8").tobytes()

    @classmethod
    def deserialize(cls, data: bytes, **_: object) -> "Bloom":
        if data[:4] != _MAGIC:
            raise ValueError("Bloom: bad magic")
        m, k, seed, n_added = struct.unpack_from("<QIIq", data, 4)
        out = cls(m=m, k=k, seed=seed)
        out.bits = np.frombuffer(data[4 + 24 :], dtype="<u8").copy()
        out.n_added = n_added
        return out

    def finish(self) -> "Bloom":
        return self
