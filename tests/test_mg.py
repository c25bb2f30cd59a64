"""Misra–Gries frequent-items laws (Agarwal et al. 2012 mergeable merge):
underestimate-only, n/(m+1) bound, heavy-hitter retention — under many
merge trees — plus exactness while unsaturated and the wire round trip,
and the distributed two-phase plan vs exact counts.
"""

import collections
import random

import numpy as np
import pytest

from sketchlib.mg import MisraGries
from tests.conftest import SF_MED


def _stream(seed: int, n: int, domain: int, heavy: int):
    rng = random.Random(seed)
    s = [f"i{rng.randrange(domain)}" for _ in range(n)]
    s += ["HEAVY"] * heavy
    rng.shuffle(s)
    return s


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_bounds_under_any_merge_tree(n_parts):
    stream = _stream(11, 30000, 80, 5000)
    true = collections.Counter(stream)
    parts = [stream[i::n_parts] for i in range(n_parts)]
    sketches = []
    for p in parts:
        s = MisraGries(m=16)
        # multiple batches per partition exercises the batch-as-merge path
        for j in range(0, len(p), 1000):
            s.update_batch(np.array(p[j:j + 1000], dtype=object))
        sketches.append(s)
    # left-fold AND pairwise-tree merge must both satisfy the laws
    import functools

    fold = functools.reduce(
        lambda a, b: a.merge(b),
        [MisraGries.deserialize(s.serialize()) for s in sketches],
    )
    tree = [MisraGries.deserialize(s.serialize()) for s in sketches]
    while len(tree) > 1:
        tree = [tree[i].merge(tree[i + 1]) if i + 1 < len(tree) else tree[i]
                for i in range(0, len(tree), 2)]
    for acc in (fold, tree[0]):
        assert acc.n == len(stream)
        bound = acc.error_bound()
        for item, cnt in true.items():
            est = acc.estimate(item)
            assert 0 <= cnt - est <= bound, (item, cnt, est, bound)
        assert acc.estimate("HEAVY") > 0  # freq > n/(m+1) ⟹ retained
        assert len(acc.items()) <= 16


def test_exact_while_unsaturated():
    stream = _stream(5, 5000, 10, 500)  # 11 distinct < m
    true = collections.Counter(stream)
    parts = [stream[i::4] for i in range(4)]
    acc = None
    for p in parts:
        s = MisraGries(m=64)
        s.update_batch(np.array(p, dtype=object))
        acc = s if acc is None else acc.merge(s)
    assert dict(acc.items()) == dict(true)


def test_wire_round_trip_and_param_checks():
    s = MisraGries(m=4)
    s.update_batch(np.array(["a", "b", "a", "c", None], dtype=object))
    r = MisraGries.deserialize(s.serialize())
    assert r.items() == s.items() and r.n == s.n == 4  # None dropped
    with pytest.raises(ValueError):
        MisraGries.deserialize(s.serialize(), m=8)
    with pytest.raises(ValueError):
        MisraGries(m=4).merge(MisraGries(m=8))
    with pytest.raises(ValueError):
        MisraGries.deserialize(b"XXXX" + s.serialize()[4:])
    with pytest.raises(ValueError):
        MisraGries(m=0)


def test_distributed_plan_matches_exact(spark):
    """Two-phase sketch_aggregate at full capacity == exact groupBy counts,
    independent of input partitioning."""
    from pyspark.sql import functions as F
    from sketchlib.mg import MisraGries
    from sketchlib.spark.sketch_ops import sketch_aggregate

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    exact = {
        (r["lang"], r["source"]): r["c"]
        for r in docs.groupBy("lang", "source").agg(F.count("*").alias("c")).collect()
    }
    for layout in (docs, docs.repartition(13)):
        sk = sketch_aggregate(layout, ["lang"], "source", "mg", {"m": 64})
        got = {}
        for row in sk.collect():
            for item, est in MisraGries.deserialize(bytes(row["sketch"])).items():
                got[(row["lang"], item)] = est
        assert got == exact
