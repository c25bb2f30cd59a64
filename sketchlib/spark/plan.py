"""Skew- and scale-aware aggregation plans (north rule: "partitioning /
shuffle / skew handled explicitly", "tree-style partial-sketch merges in the
shuffle reduce", "explicit salted-repartition skew handling on hot
languages/hosts").

Why this matters at 10^12 rows / 100 TB:

The partial stage emits one ≤40 KB digest per (input partition × key).  At
P = 800k input partitions (100 TB / 128 MB) a hot key ("en" ≈ 55% of the
web) receives up to P partial rows ≈ 30 GB into ONE reducer in the naive
``groupBy(key)`` plan.  ``tree_merge`` bounds every reducer's fan-in to
``fanin`` partials by inserting salted intermediate merge levels:

  level 0:  groupBy(key, salt = part_hash % S)  — S ≈ P/fanin reducers/key
  level k:  salt = salt % (S / fanin^k)          — fan-in ``fanin`` per node
  final:    groupBy(key)                          — ≤ fanin rows per key

Each level is a shuffle of sketch rows only (KBs per row).  Because the
distributed merge is a lossless commutative union (compression only where a
node's union exceeds the size cap), tree shape does not change results in
exact mode, and changes them only within the error bound in compressed mode.

Salting here is *lossless* — unlike salted numeric aggs that need a second
exact pass, mergeable sketches recombine salted sub-sketches into exactly
the sketch the unsalted plan would build (same multiset union).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from sketchlib.spark.tdigest_ops import tdigest_merge, tdigest_partials


def add_salt(partials: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt from the partial row content (hash of the digest
    bytes) — uniform, reproducible, no RNG."""
    return partials.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col("digest")), F.lit(n_salts)).cast("int")
    )


def tree_merge_tdigest(
    partials: DataFrame,
    keys: list[str],
    delta: float = 0.01,
    discrete: bool = False,
    fanin: int = 64,
    est_partials_per_key: int | None = None,
) -> DataFrame:
    """Merge partial digests with bounded reducer fan-in.

    est_partials_per_key defaults to the partial row count over distinct
    keys (cheap: the partials frame is tiny relative to the input).
    """
    if est_partials_per_key is None:
        # one aggregation over the (small) partials frame
        cnt = partials.groupBy(*keys).count().agg(F.max("count")).collect()[0][0]
        est_partials_per_key = int(cnt or 1)

    levels = max(0, math.ceil(math.log(max(est_partials_per_key, 1), fanin)) - 1)
    df = partials
    n_salts = fanin ** levels
    while n_salts > 1:
        salted = add_salt(df, n_salts)
        df = tdigest_merge(
            salted, keys + ["_salt"], delta, discrete, compress=True
        ).drop("_salt")
        n_salts //= fanin
    return tdigest_merge(df, keys, delta, discrete, compress=True)


def tdigest_aggregate_skewed(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    delta: float = 0.01,
    discrete: bool = False,
    fanin: int = 64,
) -> DataFrame:
    """Full skew-safe plan: partials → salted tree merge → final digest."""
    partials = tdigest_partials(df, keys, value_col, delta, discrete)
    return tree_merge_tdigest(partials, keys, delta, discrete, fanin)


def choose_salts_from_counts(df: DataFrame, key: str, rows_per_salt: int = 5_000_000,
                             max_salts: int = 1024,
                             max_keys: int = 4096) -> dict[str, int]:
    """Presample per-key row counts (or read them from table stats) and pick
    a salt count per key — the explicit-salting knob for *row-level* salted
    repartition when a downstream op (not a sketch) needs balanced groups.

    Only the ``max_keys`` HOTTEST keys are collected (keys below
    ``rows_per_salt`` never need salting, and callers default absent keys
    to salt 1), so the driver-side dict stays bounded on open key domains.
    """
    counts = (
        df.groupBy(key).count()
        .filter(F.col("count") > rows_per_salt)
        .orderBy(F.desc("count"))
        .limit(max_keys)
        .collect()
    )
    return {
        r[key]: int(min(max_salts, max(1, r["count"] // rows_per_salt + 1)))
        for r in counts
    }
