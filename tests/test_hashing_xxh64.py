"""Bitwise property tests: the numpy XXH64-over-longs kernel must match
Spark's ``F.xxhash64`` exactly — it is the bridge that lets Arrow-side
numpy continue hash chains the JVM started (decontam window hashing)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.hashing import XXH64_SPARK_SEED, xxh64_long, xxh64_window_fold


def test_xxh64_long_matches_spark_single_and_chained(spark):
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.integers(-2**63, 2**63 - 1, size=2000, dtype=np.int64),
        np.array([0, 1, -1, 2**63 - 1, -2**63, 42], dtype=np.int64),
    ])
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    rows = df.select(
        F.xxhash64("v").alias("h1"),
        F.xxhash64("v", "v").alias("h2"),
        F.xxhash64("v", "v", "v").alias("h3"),
    ).collect()
    u = vals.view(np.uint64)
    h1 = xxh64_long(u)
    h2 = xxh64_long(u, h1)
    h3 = xxh64_long(u, h2)
    for got, col in ((h1, "h1"), (h2, "h2"), (h3, "h3")):
        exp = np.array([r[col] for r in rows], dtype=np.int64).view(np.uint64)
        assert (got == exp).all()


def test_xxh64_long_scalar_and_int64_inputs():
    a = xxh64_long(np.int64(-5), np.uint64(42))
    b = xxh64_long(np.uint64(np.int64(-5).view(np.uint64)), XXH64_SPARK_SEED)
    assert a == b


@pytest.mark.parametrize("n", [2, 4, 8])
def test_window_fold_matches_spark_multiarg(spark, n):
    """The flat window fold must equal Spark's n-arg xxhash64 over each
    window of token hashes, including the short-doc fallback fold and
    empty/null documents."""
    rng = np.random.default_rng(n)
    docs = []
    for t in [0, 1, n - 1, n, n + 1, 3 * n, 57]:
        docs.append(rng.integers(-2**62, 2**62, size=t, dtype=np.int64).tolist())
    docs.append(None)  # null document -> zero windows

    # expected via Spark: per-doc, explode every window and hash multi-arg
    expected = []
    for d in docs:
        if not d:  # None or zero tokens -> the pure fold contributes nothing
            expected.append([])
            continue
        df = spark.createDataFrame([(d,)], "a array<long>")
        if len(d) >= n:
            exprs = [
                F.xxhash64(*[F.col("a")[i + k] for k in range(n)]).alias(f"w{i}")
                for i in range(len(d) - n + 1)
            ]
        else:
            exprs = [F.xxhash64(*[F.col("a")[k] for k in range(len(d))]).alias("w0")]
        row = df.select(*exprs).collect()[0]
        expected.append([np.int64(v).view(np.uint64) for v in row])

    flat = np.concatenate(
        [np.asarray(d or [], dtype=np.int64) for d in docs]
    ).view(np.uint64) if any(docs) else np.empty(0, np.uint64)
    offsets = np.concatenate([[0], np.cumsum([len(d or []) for d in docs])])
    got_vals, got_offs = xxh64_window_fold(flat, offsets, n)
    for i, exp in enumerate(expected):
        g = got_vals[got_offs[i]:got_offs[i + 1]]
        assert list(g) == list(exp), f"doc {i}"


def test_window_fold_empty_input():
    vals, offs = xxh64_window_fold(np.empty(0, np.uint64), np.array([0]), 4)
    assert len(vals) == 0 and list(offs) == [0]
