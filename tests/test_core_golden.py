"""Golden tests ported 1:1 from the reference suite.

Sources: /root/reference/test/test_tdigest.ml and test_discrete.ml.
Every exact golden in the reference avoids the randomized-rebuild path
(SURVEY.md §5 observation), so a deterministic implementation reproduces
them bit-for-bit in IEEE-754 float64.
"""

import numpy as np
import pytest

from sketchlib.tdigest.core import TDigest


def centroids(td):
    return td.centroids()


# --- centroid formation (test_tdigest.ml:4-36) -------------------------------


def test_single_point_is_centroid():
    td = TDigest().add(0.0)
    assert centroids(td) == [(0.0, 1.0)]


def test_two_points():
    td = TDigest().add_list([0.0, 1.0])
    assert centroids(td) == [(0.0, 1.0), (1.0, 1.0)]


def test_three_points():
    td = TDigest().add_list([0.0, 1.0, -1.0])
    assert centroids(td) == [(-1.0, 1.0), (0.0, 1.0), (1.0, 1.0)]


def test_increasing_points_stay_exact():
    xs = [i * 10.0 for i in range(100)]
    td = TDigest(delta=0.001, k=None).add_list(xs)
    assert centroids(td) == [(x, 1.0) for x in xs]


def test_decreasing_points_stay_exact():
    xs = [(99 - i) * 10.0 for i in range(100)]
    td = TDigest(delta=0.001, k=None).add_list(xs)
    assert centroids(td) == [(i * 10.0, 1.0) for i in range(100)]


# --- merged centroids (test_tdigest.ml:38-48) --------------------------------


def test_duplicates_absorb_into_one_centroid():
    td = TDigest()
    for _ in range(100):
        td.add(1000.0)
    assert centroids(td) == [(1000.0, 100.0)]


def test_interleaved_duplicates():
    td = TDigest(delta=1.0, k=None, cx=None)
    for _ in range(10):
        td.add(0.0).add(1.0).add(0.5)
    assert centroids(td) == [(0.0, 10.0), (0.5, 10.0), (1.0, 10.0)]


# --- compress (test_tdigest.ml:50-81) -----------------------------------------


def test_compress_shrinks_and_preserves_bounds():
    xs = [i * 10.0 for i in range(100)]
    td = TDigest(delta=0.001, k=None).add_list(xs)
    assert td.size == 100
    td.compress(delta=0.1)
    assert td.size < 100
    assert td.min() == (0.0, 1.0)
    assert td.max() == (990.0, 1.0)
    assert td.count == 100.0


def test_auto_compress_during_ingest():
    td = TDigest()
    for i in range(10_000):
        td.add(i * 10.0)
    # reference asserts < 10_000; the k/delta cap is 2500
    assert td.size <= 2500
    assert td.min() == (0.0, 1.0)
    assert td.max() == (99990.0, 1.0)
    assert td.count == 10_000.0


# --- percentile ranks (test_tdigest.ml:83-164) --------------------------------


def test_p_rank_empty():
    assert TDigest().p_rank(1.0) is None


def test_p_rank_single_point():
    td = TDigest().add(0.0)
    assert td.p_ranks([-0.5, 0.0, 0.5, 1.0, 1.5]) == [0.0, 0.5, 1.0, 1.0, 1.0]


def test_p_rank_three_points():
    td = TDigest().add_list([-1.0, 0.0, 1.0])
    got = td.p_ranks([-1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5])
    assert got == [0.0, 1 / 6, 1 / 3, 0.5, 2 / 3, 5 / 6, 1.0]


def test_percentile_idempotent_under_duplication_three_points():
    ps = [-1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5]
    td = TDigest().add_list([0.0, 1.0, -1.0])
    expect = [-1.0, -1.0, -1.0, -1.0, 0.0, 1.0, 1.0]
    assert td.percentiles(ps) == expect
    td.add_list([0.0, 1.0, -1.0]).add_list([0.0, 1.0, -1.0])
    assert td.percentiles(ps) == expect


def test_p_rank_four_points():
    td = TDigest().add_list([10.0, 11.0, 12.0, 13.0])
    got = td.p_ranks([9.0, 10.0, 11.0, 12.0, 13.0, 14.0])
    assert got == [0.0, 0.125, 0.375, 0.625, 0.875, 1.0]


def test_p_rank_idempotent_under_duplication_four_points():
    ps = [9.0, 10.0, 11.0, 12.0, 13.0, 14.0]
    td = TDigest(delta=0.0, k=None).add_list([10.0, 11.0, 12.0, 13.0])
    expect = [0.0, 0.125, 0.375, 0.625, 0.875, 1.0]
    assert td.p_ranks(ps) == expect
    td.add_list([10.0, 11.0, 12.0, 13.0]).add_list([10.0, 11.0, 12.0, 13.0])
    assert td.p_ranks(ps) == expect


def test_p_rank_exact_match_is_midpoint():
    td = TDigest(delta=0.001, k=None)
    for _ in range(10):
        td.add_list([10.0, 20.0, 30.0])
    assert td.p_rank(20.0) == 0.5


# --- percentiles (test_tdigest.ml:166-212) -------------------------------------


def test_percentile_empty():
    assert TDigest().percentile(0.5) is None


def test_percentile_single_point():
    td = TDigest().add(0.0)
    assert td.percentiles([0.0, 0.5, 1.0]) == [0.0, 0.0, 0.0]


def test_percentile_two_points():
    td = TDigest().add_list([0.0, 1.0])
    got = td.percentiles([-0.25, 0.0, 0.25, 0.5, 5 / 8, 0.75, 1.0, 1.25])
    assert got == [0.0, 0.0, 0.0, 0.5, 0.75, 1.0, 1.0, 1.0]


def test_percentile_three_points():
    td = TDigest().add_list([0.0, 0.5, 1.0])
    assert td.percentiles([0.0, 0.25, 0.5, 0.75, 1.0]) == [0.0, 0.125, 0.5, 0.875, 1.0]


def test_percentile_four_points():
    td = TDigest().add_list([10.0, 11.0, 12.0, 13.0])
    assert td.percentiles([0.0, 0.25, 0.5, 0.75, 1.0]) == [10.0, 10.5, 11.5, 12.5, 13.0]


# --- serialization (test_tdigest.ml:214-235) -----------------------------------


def test_serialization_roundtrip():
    rng = np.random.default_rng(42)
    xs = rng.random(10).tolist()
    td = TDigest().add_list(xs)
    data = td.to_bytes()
    assert len(data) == 160
    td2 = TDigest.from_bytes(data)
    assert centroids(td2) == centroids(td)


def test_of_bytes_rejects_bad_length():
    with pytest.raises(ValueError):
        TDigest.from_bytes(b"x" * 15)


def test_concat_of_serialized_is_valid_and_sums_duplicates():
    a = TDigest().add_list([1.0, 2.0, 3.0])
    b = TDigest().add_list([2.0, 3.0, 4.0])
    combined = TDigest.from_bytes(a.to_bytes() + b.to_bytes())
    assert centroids(combined) == [(1.0, 1.0), (2.0, 2.0), (3.0, 2.0), (4.0, 1.0)]


# --- merge (test_tdigest.ml:306-321) --------------------------------------------


def test_merge_matches_combined_stream():
    xs1 = [3.0, 4.0, 3.5, 7.0]
    xs2 = [3.0, 1.0, 6.5, 9.0]
    td1 = TDigest().add_list(xs1 + xs2)
    a = TDigest().add_list(xs1)
    b = TDigest().add_list(xs2)
    td2 = TDigest.merge([a, b])
    ps = [0.0, 0.25, 0.5, 0.75, 1.0]
    expect = [1.0, 3.0, 3.75, 6.75, 9.0]
    assert td1.percentiles(ps) == expect
    assert td2.percentiles(ps) == expect


# --- is_empty (test_tdigest.ml:323-331) ------------------------------------------


def test_is_empty():
    td = TDigest()
    assert td.is_empty()
    td.add_list([3.0, 4.0, 3.5, 7.0])
    assert not td.is_empty()


# --- validation (src/tdigest.ml:128-148,313-318) ---------------------------------


def test_invalid_args():
    with pytest.raises(ValueError):
        TDigest(k=0.0)
    with pytest.raises(ValueError):
        TDigest(k=-1.0)
    with pytest.raises(ValueError):
        TDigest(cx=0.0)
    with pytest.raises(ValueError):
        TDigest(cx=-2.0)
    with pytest.raises(ValueError):
        TDigest().add(1.0, n=0)
    with pytest.raises(ValueError):
        TDigest().add_list([1.0], n=-1)
    # Merging 0.0 is legal: "never merge"
    TDigest(delta=0.0, k=None)


# ==== Discrete mode (test_discrete.ml) ===========================================


def test_discrete_increasing_and_decreasing_exact():
    xs = [i * 10.0 for i in range(100)]
    td = TDigest(discrete=True).add_list(xs)
    assert centroids(td) == [(x, 1.0) for x in xs]
    td = TDigest(discrete=True).add_list(list(reversed(xs)))
    assert centroids(td) == [(x, 1.0) for x in xs]


def test_discrete_duplicates_single_centroid():
    td = TDigest(discrete=True)
    for _ in range(100):
        td.add(1000.0)
    assert centroids(td) == [(1000.0, 100.0)]


def test_discrete_median_of_duplicate_run():
    xs = [5.0, 0.0, 0.0, 8.0] + [0.0] * 14 + [3.0] + [0.0] * 4 + [
        6.0, 1.0, 0.0, 6.0, 5.0, 3.0, 6.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0,
        0.0, 0.0, 1.0, 0.0,
    ]
    assert len(xs) == 40
    td = TDigest(discrete=True).add_list(xs)
    assert td.percentile(0.5) == 0.0


def test_discrete_interleaved_duplicates():
    td = TDigest(discrete=True)
    for _ in range(10):
        td.add(0.0).add(1.0).add(0.5)
    assert centroids(td) == [(0.0, 10.0), (0.5, 10.0), (1.0, 10.0)]


def test_discrete_p_rank_single_point():
    td = TDigest(discrete=True).add(0.0)
    assert td.p_ranks([-1.5, 0.0, 0.5, 1.0, 1.5]) == [0.0, 1.0, 1.0, 1.0, 1.0]


def test_discrete_p_rank_two_points():
    td = TDigest(discrete=True).add_list([0.0, 1.0])
    assert td.p_ranks([-1.5, 0.0, 0.5, 1.0, 1.5]) == [0.0, 0.5, 0.5, 1.0, 1.0]


def test_discrete_p_rank_three_points():
    td = TDigest(discrete=True).add_list([-1.0, 0.0, 1.0])
    got = td.p_ranks([-1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5])
    assert got == [0.0, 1 / 3, 1 / 3, 2 / 3, 2 / 3, 1.0, 1.0]


def test_discrete_p_rank_idempotent_three_points():
    ps = [-1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5]
    td = TDigest(discrete=True).add_list([0.0, 1.0, -1.0])
    expect = [0.0, 1 / 3, 1 / 3, 2 / 3, 2 / 3, 1.0, 1.0]
    assert td.p_ranks(ps) == expect
    td.add_list([0.0, 1.0, -1.0]).add_list([0.0, 1.0, -1.0])
    assert td.p_ranks(ps) == expect


def test_discrete_p_rank_four_points():
    td = TDigest(discrete=True).add_list([10.0, 11.0, 12.0, 13.0])
    got = td.p_ranks([9.0, 10.0, 11.0, 12.0, 13.0, 14.0])
    assert got == [0.0, 0.25, 0.5, 0.75, 1.0, 1.0]


def test_discrete_p_rank_idempotent_four_points():
    ps = [9.0, 10.0, 11.0, 12.0, 13.0, 14.0]
    td = TDigest(discrete=True).add_list([10.0, 11.0, 12.0, 13.0])
    expect = [0.0, 0.25, 0.5, 0.75, 1.0, 1.0]
    assert td.p_ranks(ps) == expect
    td.add_list([10.0, 11.0, 12.0, 13.0]).add_list([10.0, 11.0, 12.0, 13.0])
    assert td.p_ranks(ps) == expect


def test_discrete_percentile_single_point():
    td = TDigest(discrete=True).add(0.0)
    assert td.percentiles([0.0, 0.5, 1.0]) == [0.0, 0.0, 0.0]


def test_discrete_percentile_two_points():
    td = TDigest(discrete=True).add_list([0.0, 10.0])
    assert td.percentiles([0.0, 0.25, 0.5, 0.75, 1.0]) == [0.0, 0.0, 0.0, 10.0, 10.0]


def test_discrete_percentile_three_points():
    td = TDigest(discrete=True).add_list([0.0, 5.0, 10.0])
    got = td.percentiles([0.0, 0.25, 1.0 / 2.9, 0.5, 2 / 3, 0.75, 1.0])
    assert got == [0.0, 0.0, 5.0, 5.0, 5.0, 10.0, 10.0]


def test_discrete_percentile_four_points():
    td = TDigest(discrete=True).add_list([10.0, 11.0, 12.0, 13.0])
    assert td.percentiles([0.0, 0.25, 0.5, 0.75, 1.0]) == [10.0, 10.0, 11.0, 12.0, 13.0]
