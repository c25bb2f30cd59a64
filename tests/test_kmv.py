"""KMV (bottom-k) sketch: exact set-function semantics, byte-exact merge
laws, estimator accuracy, serde, and the distributed two-phase path."""

import itertools

import numpy as np
import pytest

from sketchlib.kmv import KMV


def _build(vals, k=256, parts=1):
    sks = []
    for p in np.array_split(np.asarray(vals), parts):
        s = KMV(k=k)
        s.update_batch(p)
        sks.append(KMV.deserialize(s.serialize()))
    out = sks[0]
    for s in sks[1:]:
        out.merge(s)
    return out


def test_kmv_unsaturated_is_exact():
    vals = np.arange(100, dtype=np.int64)
    s = _build(vals, k=256)
    assert s.estimate() == 100.0
    # duplicates don't count
    s.update_batch(np.arange(100, dtype=np.int64))
    assert s.estimate() == 100.0


@pytest.mark.parametrize("true_n", [5_000, 100_000])
def test_kmv_estimate_tolerance(true_n):
    rng = np.random.default_rng(5)
    vals = rng.choice(20 * true_n, size=true_n, replace=False)
    s = _build(vals, k=1024, parts=8)
    # sigma ~ 1/sqrt(k-2) ~ 3.1%; allow 4 sigma
    assert abs(s.estimate() - true_n) / true_n < 0.125, s.estimate()


def test_kmv_merge_laws_byte_exact():
    """State is a pure function of the distinct-hash set, so any merge
    order/grouping yields identical bytes (stronger than KLL, same as HLL)."""
    rng = np.random.default_rng(6)
    parts = [rng.integers(0, 5_000, 3_000) for _ in range(4)]

    def agg(order, grouping):
        sks = []
        for i in order:
            s = KMV(k=128)
            s.update_batch(parts[i])
            sks.append(s)
        if grouping == "left":
            out = sks[0]
            for s in sks[1:]:
                out.merge(s)
        else:  # pairwise tree
            a = sks[0].merge(sks[1])
            b = sks[2].merge(sks[3])
            out = a.merge(b)
        return out.serialize()

    base = agg((0, 1, 2, 3), "left")
    for order in itertools.permutations(range(4)):
        assert agg(order, "left") == base
    assert agg((0, 1, 2, 3), "tree") == base


def test_kmv_serde_and_validation():
    s = KMV(k=64)
    s.update_batch(np.arange(1000, dtype=np.int64))
    blob = s.serialize()
    back = KMV.deserialize(blob)
    assert back.k == 64 and np.array_equal(back.hashes, s.hashes)
    assert len(back.hashes) == 64
    with pytest.raises(ValueError, match="magic"):
        KMV.deserialize(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="mismatch"):
        KMV.deserialize(blob[:-8])
    with pytest.raises(ValueError, match="k must be"):
        KMV(k=1)


def test_kmv_duplicate_heavy_batch_keeps_distinct_bottom_k():
    """Regression: pruning a batch to its k smallest ELEMENTS (with dups)
    must not evict a distinct value that belongs in the bottom-k — the
    state must equal the bottom-k of the distinct hash set."""
    from sketchlib.hashing import hash64

    s = KMV(k=2)
    s.update_batch(np.array([7] * 100 + [13, 42], dtype=np.int64))
    want = np.unique(hash64(np.array([7, 13, 42], dtype=np.int64)))[:2]
    assert np.array_equal(s.hashes, want)


def test_kmv_spark_two_phase(spark):
    """Distributed build via sketch_aggregate equals a single-process build
    byte-exactly, and the estimate tracks exact countDistinct."""
    from pyspark.sql import functions as F

    from sketchlib.spark.sketch_ops import sketch_aggregate

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sk = {r["lang"]: bytes(r["sketch"]) for r in
          sketch_aggregate(docs, ["lang"], "doc_id", "kmv", {"k": 64}).collect()}
    rows = docs.select("lang", F.xxhash64("doc_id").alias("h")).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["h"])
    exact = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n")).collect()}
    for lang, blob in sk.items():
        local = KMV(k=64)
        local.update_hashed(np.array(by_lang[lang], dtype=np.int64).view(np.uint64))
        assert blob == local.serialize(), lang
        est = KMV.deserialize(blob).estimate()
        # k=64 is deliberately coarse (sigma ~ 13%) and this is ONE fixed
        # hash draw per lang — allow a wide band; real accuracy is pinned
        # by test_kmv_estimate_tolerance at k=1024 over random draws
        assert abs(est - exact[lang]) / exact[lang] < 0.6, lang


def test_kmv_set_operations():
    """Coordinated-sample set ops: Jaccard / union / intersection estimates
    within estimator bounds at partial overlap, exact when unsaturated."""
    rng = np.random.default_rng(17)
    A = rng.choice(10_000_000, 60_000, replace=False)
    B = np.concatenate([A[:20_000],
                        rng.choice(np.arange(10_000_000, 20_000_000), 40_000,
                                   replace=False)])
    ka, kb = KMV(k=2048), KMV(k=2048)
    ka.update_batch(A.astype(np.int64))
    kb.update_batch(B.astype(np.int64))
    j_true = 20_000 / 100_000
    assert abs(ka.jaccard(kb) - j_true) < 0.03          # sigma ~ 0.009
    assert abs(ka.union_estimate(kb) / 100_000 - 1) < 0.1
    assert abs(ka.intersection_estimate(kb) / 20_000 - 1) < 0.2
    assert abs(ka.difference_estimate(kb) / 40_000 - 1) < 0.15  # |A\B|=40k
    assert abs(kb.difference_estimate(ka) / 40_000 - 1) < 0.15  # |B\A|=40k
    # A = (A\B) + (A∩B) must hold on the shared union sample (same bottom-k)
    assert abs(ka.difference_estimate(kb) + ka.intersection_estimate(kb)
               - ka.estimate()) / ka.estimate() < 0.1
    # symmetric
    assert ka.jaccard(kb) == kb.jaccard(ka)

    # unsaturated: exact
    sa, sb = KMV(k=512), KMV(k=512)
    sa.update_batch(np.arange(100, dtype=np.int64))
    sb.update_batch(np.arange(50, 150, dtype=np.int64))
    assert sa.jaccard(sb) == 50 / 150
    assert sa.union_estimate(sb) == 150.0
    assert abs(sa.intersection_estimate(sb) - 50.0) < 1e-9
    assert abs(sa.difference_estimate(sb) - 50.0) < 1e-9
    assert abs(sb.difference_estimate(sa) - 50.0) < 1e-9

    with pytest.raises(ValueError, match="k mismatch"):
        sa.jaccard(KMV(k=64))
