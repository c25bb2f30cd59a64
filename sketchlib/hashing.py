"""Deterministic vectorized 64-bit hashing shared by HLL/CMS/Bloom.

Two layers:

* On Spark, hashing stays JVM-side: pipelines hash with ``F.xxhash64`` (fast,
  whole-stage-codegen, stable across Spark versions) and the Python sketches
  ingest the resulting int64 column (``update_hashed``).  The Python worker
  never hashes strings in the hot path.
* Off Spark (tests, local drivers), ``hash64`` provides a vectorized
  splitmix64 finalizer over ``pandas.util.hash_pandas_object`` for arbitrary
  values, or directly over integer arrays.

Derived hash families (for CMS rows / Bloom probes) use double hashing
``h1 + i·h2`` over splitmix64 remixes — the standard Kirsch–Mitzenmacher
construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain construction)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * _C1
        z = (z ^ (z >> np.uint64(27))) * _C2
        z = z ^ (z >> np.uint64(31))
    return z


def hash64(values, seed: int = 0) -> np.ndarray:
    """uint64 hashes of an arbitrary array-like (vectorized, deterministic)."""
    if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
        base = values.astype(np.uint64)
    else:
        s = values if isinstance(values, pd.Series) else pd.Series(values)
        base = pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=np.uint64)
    if seed:
        with np.errstate(over="ignore"):
            base = base ^ (np.uint64(seed) * _GOLDEN)
    return splitmix64(base)


def double_hash(h: np.ndarray, i: int, mod: int) -> np.ndarray:
    """i-th derived hash in [0, mod): (h1 + i·h2) mod m, h2 forced odd."""
    h1 = h
    h2 = splitmix64(h) | np.uint64(1)
    with np.errstate(over="ignore"):
        combined = h1 + np.uint64(i) * h2
    return (combined % np.uint64(mod)).astype(np.int64)
