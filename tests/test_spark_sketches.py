"""Spark-level sibling-sketch tests: distributed build correctness,
tolerance vs exact oracles, and partition invariance (HLL register-max,
Bloom bit-OR, CMS counter-sum are commutative/associative — the final
serialized sketch must be byte-identical under any repartitioning)."""

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_MED

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_MED}/events.parquet")


def test_hll_estimate_vs_exact(spark, events):
    from sketchlib.hll import HLL
    from sketchlib.spark.sketch_ops import sketch_aggregate

    sk = sketch_aggregate(events, ["event_type"], "user_id", "hll", {"p": 14})
    got = {r["event_type"]: HLL.deserialize(bytes(r["sketch"])).estimate() for r in sk.collect()}
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) FROM "
            f"read_parquet('{SF_MED}/events.parquet') GROUP BY event_type"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.03, (k, est, exact[k])


@pytest.mark.parametrize("sketch,params", [
    ("hll", {"p": 12}),
    ("bloom", {"expected_n": 20000, "fpr": 0.01}),
    ("cms", {"width": 4096, "depth": 5}),
    ("dd", {"alpha": 0.01, "max_bins": 2048}),
])
def test_partition_invariance_bytes(spark, events, sketch, params):
    from sketchlib.spark.sketch_ops import sketch_aggregate

    def build(df):
        rows = sketch_aggregate(df, ["event_type"], "user_id", sketch, params).collect()
        return {r["event_type"]: bytes(r["sketch"]) for r in rows}

    a = build(events.repartition(1))
    b = build(events.repartition(37))
    assert a == b


def test_bloom_per_key_sizing(spark):
    """params_by_key sizes each group's filter to ITS cardinality: every
    per-source filter must be far smaller than a global-count-sized one,
    total broadcast bytes must stay near n_total*9.6 bits, and the
    zero-false-negative guarantee must hold per source."""
    from sketchlib.bloom import Bloom
    from sketchlib.spark.queries import (
        LAST_BLOOM_FILTER_BYTES,
        q_bloom_membership_by_source,
    )

    out = {
        r["source"]: (r["n_members"], r["n_docs"])
        for r in q_bloom_membership_by_source(spark, SF_MED).collect()
    }
    assert out and all(m == n for m, n in out.values())  # no false negatives

    sizes = LAST_BLOOM_FILTER_BYTES
    assert set(sizes) == set(out)

    # bit capacity m must follow the PER-SOURCE count, not the global count
    from sketchlib.spark.sketch_ops import sketch_aggregate

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    per_key = {(s,): {"expected_n": max(n, 1000)} for s, (_, n) in out.items()}
    built = sketch_aggregate(
        docs, ["source"], "doc_id", "bloom", {"fpr": 0.01},
        params_by_key=per_key,
    ).collect()
    n_total = sum(n for _, n in out.values())
    global_m = Bloom(expected_n=max(n_total, 1000), fpr=0.01).m
    for r in built:
        b = Bloom.deserialize(bytes(r["sketch"]))
        want_m = Bloom(expected_n=max(out[r["source"]][1], 1000), fpr=0.01).m
        assert b.m == want_m, (r["source"], b.m, want_m)
        assert b.m <= global_m  # equality only when the 1000-doc floor binds
    # total serialized broadcast bytes bounded by ~2 global-sized filters
    # (vs S of them under global sizing), plus per-source floor overhead
    global_bytes = (global_m + 7) // 8 + 64
    assert sum(sizes.values()) < 2 * global_bytes + 1500 * len(sizes)

    # skewed synthetic groups: capacity must actually FOLLOW the group size
    from pyspark.sql import functions as F

    skewed = spark.range(11_000).select(
        F.when(F.col("id") < 10_000, F.lit("big")).otherwise(F.lit("small"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    pk = {("big",): {"expected_n": 10_000}, ("small",): {"expected_n": 1_000}}
    got = {
        r["k"]: Bloom.deserialize(bytes(r["sketch"])).m
        for r in sketch_aggregate(skewed, ["k"], "v", "bloom", {"fpr": 0.01},
                                  params_by_key=pk).collect()
    }
    assert got["big"] == Bloom(expected_n=10_000, fpr=0.01).m
    assert got["small"] == Bloom(expected_n=1_000, fpr=0.01).m
    assert got["small"] < got["big"]


def test_kll_spark_rank_error(spark, events):
    from sketchlib.kll import KLL
    from sketchlib.spark.sketch_ops import sketch_aggregate

    sk = sketch_aggregate(events.repartition(16), [], "value", "kll", {"k": 200})
    k = KLL.deserialize(bytes(sk.collect()[0]["sketch"]))
    vals = np.sort(
        duckdb.sql(
            f"SELECT value FROM read_parquet('{SF_MED}/events.parquet') "
            f"WHERE value IS NOT NULL"
        ).fetchnumpy()["value"]
    )
    assert k.n == len(vals)
    for p in [0.1, 0.5, 0.9]:
        est = float(k.quantile([p])[0])
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - p) < 0.02, (p, rank)


def test_dd_spark_relative_error(spark, events):
    """Distributed DDSketch build == single-shot build (bytes), and the
    relative-error guarantee holds against the exact DuckDB multiset."""
    from sketchlib.ddsketch import DDSketch
    from sketchlib.spark.sketch_ops import sketch_aggregate

    alpha = 0.01
    sk = sketch_aggregate(
        events.repartition(16), [], "value", "dd",
        {"alpha": alpha, "max_bins": 4096})
    dd = DDSketch.deserialize(bytes(sk.collect()[0]["sketch"]))
    vals = np.sort(
        duckdb.sql(
            f"SELECT value FROM read_parquet('{SF_MED}/events.parquet') "
            f"WHERE value IS NOT NULL"
        ).fetchnumpy()["value"]
    )
    assert dd.n == len(vals)
    ps = [0.01, 0.5, 0.95, 0.99]
    exact = vals[np.floor(np.asarray(ps) * (len(vals) - 1)).astype(int)]
    est = dd.quantile(ps)
    nz = exact != 0.0
    assert (np.abs(est[nz] - exact[nz]) / np.abs(exact[nz])).max() <= alpha


def test_cms_inner_product_laws():
    """inner_product >= true join size always; within eps*Na*Nb w.h.p.;
    symmetric; raises on incompatible shapes."""
    import numpy as np

    from sketchlib.cms import CMS

    rng = np.random.default_rng(11)
    keys_a = rng.integers(0, 500, 20_000)
    keys_b = rng.integers(0, 500, 5_000)
    true_ip = 0
    ca = np.bincount(keys_a, minlength=500)
    cb = np.bincount(keys_b, minlength=500)
    true_ip = int((ca * cb).sum())

    a, b = CMS(width=4096, depth=5), CMS(width=4096, depth=5)
    a.update_batch(keys_a.astype("int64"))
    b.update_batch(keys_b.astype("int64"))
    est = a.inner_product(b)
    assert est >= true_ip
    import math
    assert est <= true_ip + 3 * (math.e / 4096) * len(keys_a) * len(keys_b)
    assert b.inner_product(a) == est

    import pytest as _pytest
    with _pytest.raises(ValueError):
        a.inner_product(CMS(width=2048, depth=5))


def test_cms_inner_product_no_int64_overflow():
    """ADVICE r03: at 10^12-element scale the per-row dot (~Na*Nb/width)
    exceeds 2^63 and int64 numpy arithmetic WRAPS silently — the estimate
    must be computed in unbounded Python ints instead."""
    import numpy as np

    from sketchlib.cms import CMS

    a, b = CMS(width=64, depth=3), CMS(width=64, depth=3)
    # counters as if ~2^40 elements hit every cell: row dot = 64 * 2^80
    a.table = np.full((3, 64), 2**40, dtype=np.int64)
    b.table = np.full((3, 64), 2**40, dtype=np.int64)
    est = a.inner_product(b)
    assert est == 64 * (2**80)  # wraps to garbage under int64 arithmetic
    assert est > 0
