"""Property-based laws for the sibling sketches (hypothesis).

The distributed plans assume every Aggregator is a commutative monoid whose
serialized state survives arbitrary partition splits.  Checked on random
inputs:

- HLL: merge is register-wise max — commutative, idempotent; estimate of a
  split-merge equals the single-pass estimate exactly.
- Bloom: zero false negatives under any split; merge is bitwise-or.
- CMS: never undercounts; split-merge counts == single-pass counts exactly.
- KLL: split-merge quantile ranks stay within the sketch's error bound.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from sketchlib.bloom import Bloom
from sketchlib.cms import CMS
from sketchlib.hll import HLL
from sketchlib.kll import KLL

ints = st.lists(st.integers(min_value=-(2**40), max_value=2**40),
                min_size=1, max_size=500)


def _split(xs, k):
    return [c for c in np.array_split(np.asarray(xs, dtype=np.int64), k) if len(c)]


@settings(max_examples=40, deadline=None)
@given(ints, st.integers(2, 5))
def test_hll_split_merge_equals_single_pass(xs, k):
    whole = HLL(p=12)
    whole.update_batch(np.asarray(xs, dtype=np.int64))
    parts = []
    for chunk in _split(xs, k):
        h = HLL(p=12)
        h.update_batch(chunk)
        parts.append(h.serialize())
    merged = HLL.deserialize(parts[0])
    for blob in parts[1:]:
        merged.merge(HLL.deserialize(blob))
    assert merged.serialize() == whole.serialize()  # registers identical
    # idempotence: merging the whole into itself changes nothing
    again = HLL.deserialize(whole.serialize())
    again.merge(HLL.deserialize(whole.serialize()))
    assert again.serialize() == whole.serialize()


@settings(max_examples=40, deadline=None)
@given(ints, st.integers(2, 5))
def test_bloom_no_false_negatives_under_split(xs, k):
    parts = []
    for chunk in _split(xs, k):
        b = Bloom(expected_n=1000, fpr=0.01)
        b.update_batch(chunk)
        parts.append(b)
    merged = parts[0]
    for b in parts[1:]:
        merged.merge(b)
    assert bool(np.all(merged.contains(np.asarray(xs, dtype=np.int64))))


@settings(max_examples=40, deadline=None)
@given(ints, st.integers(2, 5))
def test_cms_split_merge_exact_and_no_undercount(xs, k):
    xs_arr = np.asarray(xs, dtype=np.int64)
    whole = CMS(width=2048, depth=5)
    whole.update_batch(xs_arr)
    merged = CMS(width=2048, depth=5)
    for chunk in _split(xs, k):
        c = CMS(width=2048, depth=5)
        c.update_batch(chunk)
        merged.merge(c)
    assert merged.serialize() == whole.serialize()  # counters additive
    uniq, counts = np.unique(xs_arr, return_counts=True)
    est = merged.query(uniq)
    assert bool(np.all(est >= counts))  # CMS never undercounts


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                min_size=20, max_size=2000),
       st.integers(2, 5))
def test_kll_split_merge_rank_bound(xs, k):
    merged = KLL(k=200)
    for chunk in np.array_split(np.asarray(xs, dtype=np.float64), k):
        if len(chunk):
            s = KLL(k=200)
            s.update_batch(chunk)
            merged.merge(s)
    sx = np.sort(np.asarray(xs, dtype=np.float64))
    n = len(sx)
    tol = 0.1  # KLL(k=200) rank error ~1.7/k; generous margin at tiny sizes
    for p in (0.1, 0.5, 0.9):
        est = float(np.atleast_1d(merged.quantile([p]))[0])
        # est must lie within the exact value band of ranks [p-tol, p+tol]
        # (an achieved-rank metric breaks down under heavy duplicates: any
        # rank maps to the same value, which is a correct answer)
        lo = sx[max(0, int(np.floor((p - tol) * n)))]
        hi = sx[min(n - 1, int(np.ceil((p + tol) * n)))]
        assert lo <= est <= hi, (p, est, lo, hi)


@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_subnormal=False),
                min_size=1, max_size=2000),
       st.integers(2, 6), st.integers(0, 1))
@settings(deadline=None)
def test_dd_split_merge_bitwise_and_rel_bound(xs, k, collapse):
    """DDSketch under hypothesis: ANY split of ANY input merges to the
    byte-identical sketch (with and without collapsing active), and every
    probed quantile is within alpha relative of the exact floor-rank value."""
    from sketchlib.ddsketch import DDSketch

    alpha, max_bins = 0.01, (8 if collapse else 2048)
    xs_arr = np.asarray(xs, dtype=np.float64)
    single = DDSketch(alpha=alpha, max_bins=max_bins)
    single.update_batch(xs_arr)
    merged = DDSketch(alpha=alpha, max_bins=max_bins)
    chunks = [c for c in np.array_split(xs_arr, k) if len(c)]
    for chunk in reversed(chunks):
        s = DDSketch(alpha=alpha, max_bins=max_bins)
        s.update_batch(chunk)
        merged.merge(s)
    assert merged.serialize() == single.serialize()
    if not collapse:
        sx = np.sort(xs_arr)
        n = len(sx)
        for p in (0.1, 0.5, 0.9):
            est = float(np.atleast_1d(single.quantile([p]))[0])
            true = sx[int(np.floor(p * (n - 1)))]
            assert abs(est - true) <= alpha * abs(true) + 1e-300, (p, est, true)


def test_hll_truncated_blob_raises():
    """A truncated sparse or dense blob must raise, never silently decode
    fewer registers (parity with the t-digest %16 length check)."""
    import numpy as np
    import pytest

    from sketchlib.hll import HLL

    h = HLL(p=12)
    h.update_hashed((np.arange(1, 500, dtype=np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)))
    for blob in (h.serialize(),):
        for cut in (1, 2, 3, 7):
            with pytest.raises(ValueError):
                HLL.deserialize(blob[:-cut])
