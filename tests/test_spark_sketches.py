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
])
def test_partition_invariance_bytes(spark, events, sketch, params):
    from sketchlib.spark.sketch_ops import sketch_aggregate

    def build(df):
        rows = sketch_aggregate(df, ["event_type"], "user_id", sketch, params).collect()
        return {r["event_type"]: bytes(r["sketch"]) for r in rows}

    a = build(events.repartition(1))
    b = build(events.repartition(37))
    assert a == b


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
