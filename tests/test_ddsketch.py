"""DDSketch laws (Masson/Rim/Lee VLDB'19): the relative-error guarantee,
and — unique among the library's quantile sketches — BITWISE merge
associativity/commutativity including under collapsing.

The bitwise law is not luck: merging is pointwise bucket addition and the
collapsing-lowest boundary is a function of the bucket-key set alone, so
any fold shape over any partition order collapses to the identical store
(see sketchlib/ddsketch.py module docstring).  These tests fold real data
in adversarial orders and compare serialized BYTES.
"""

import numpy as np
import pytest

from sketchlib.ddsketch import DDSketch

RNG = np.random.default_rng(20260819)


def _exact_q(vals: np.ndarray, ps) -> np.ndarray:
    """The paper's rank definition: value at rank floor(q*(n-1)) of the
    sorted multiset — what the sketch's guarantee is stated against."""
    s = np.sort(vals)
    ranks = np.floor(np.asarray(ps) * (len(s) - 1)).astype(int)
    return s[ranks]


PS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999]


@pytest.mark.parametrize("dist", ["lognormal", "uniform", "pareto_like"])
def test_relative_error_bound(dist):
    n = 200_000
    if dist == "lognormal":
        vals = RNG.lognormal(5.0, 2.0, n)  # ~8 orders of magnitude
    elif dist == "uniform":
        vals = RNG.uniform(1.0, 1e6, n)
    else:
        vals = (1.0 / RNG.uniform(1e-9, 1.0, n)) ** 0.5
    alpha = 0.01
    sk = DDSketch(alpha=alpha, max_bins=4096)  # wide: no collapsing
    sk.update_batch(vals)
    est = sk.quantile(PS)
    exact = _exact_q(vals, PS)
    rel = np.abs(est - exact) / np.abs(exact)
    assert rel.max() <= alpha, f"{dist}: rel err {rel.max()} > alpha"


def test_relative_error_with_negatives_and_zeros():
    alpha = 0.02
    vals = np.concatenate([
        -RNG.lognormal(3.0, 1.5, 50_000),
        np.zeros(1_000),
        RNG.lognormal(3.0, 1.5, 50_000),
    ])
    RNG.shuffle(vals)
    sk = DDSketch(alpha=alpha, max_bins=4096)
    sk.update_batch(vals)
    est = sk.quantile(PS)
    exact = _exact_q(vals, PS)
    nz = exact != 0.0
    rel = np.abs(est[nz] - exact[nz]) / np.abs(exact[nz])
    assert rel.max() <= alpha
    # a quantile landing in the zero store is exact
    assert est[~nz].size == 0 or np.all(est[~nz] == 0.0)


def test_collapsing_keeps_quantiles_above_boundary():
    """Paper Thm 3 (collapsing-lowest): quantiles whose rank lies strictly
    ABOVE the collapsed mass keep the alpha bound; at/below the boundary
    the estimate degrades (by design — low-rank mass was folded into the
    boundary bucket).  Derive the safe region from the sketch itself."""
    alpha = 0.01
    vals = RNG.lognormal(5.0, 2.5, 300_000)
    tight = DDSketch(alpha=alpha, max_bins=512)  # forces collapsing
    tight.update_batch(vals)
    assert len(tight.pos) <= 512
    boundary = min(tight.pos)
    collapsed_frac = tight.pos[boundary] / tight.n
    assert 0.2 < collapsed_frac < 0.95  # really collapsed, but room above
    hi_ps = [p for p in np.linspace(collapsed_frac + 0.02, 0.999, 8)]
    est = tight.quantile(hi_ps)
    exact = _exact_q(vals, hi_ps)
    rel = np.abs(est - exact) / np.abs(exact)
    assert rel.max() <= alpha
    # and a quantile inside the collapsed region returns the boundary
    # bucket's estimate (degraded but deterministic), never garbage
    low = float(tight.quantile(collapsed_frac / 2)[0])
    assert low == pytest.approx(
        2.0 * tight.gamma ** boundary / (tight.gamma + 1.0))


def test_min_max_and_edge_quantiles():
    vals = RNG.lognormal(2.0, 1.0, 10_000)
    sk = DDSketch()
    sk.update_batch(vals)
    q = sk.quantile([0.0, 1.0])
    assert q[0] == vals.min() and q[1] == vals.max()
    assert np.isnan(DDSketch().quantile(0.5)).all()


def test_rank_roundtrip():
    vals = RNG.lognormal(2.0, 1.0, 50_000)
    sk = DDSketch(alpha=0.01)
    sk.update_batch(vals)
    for p in [0.1, 0.5, 0.9, 0.99]:
        x = float(sk.quantile(p)[0])
        assert abs(sk.rank(x) - p) < 0.02


def _parts(vals, k):
    cuts = np.sort(RNG.integers(1, len(vals), k - 1))
    return [p for p in np.split(vals, cuts)]


def _sketch_of(vals, **kw):
    s = DDSketch(**kw)
    s.update_batch(vals)
    return s


@pytest.mark.parametrize("max_bins", [4096, 64])  # 64 → collapsing active
def test_merge_bitwise_associative_commutative(max_bins):
    vals = RNG.lognormal(4.0, 2.0, 120_000)
    parts = _parts(vals, 8)
    kw = dict(alpha=0.01, max_bins=max_bins)
    sks = [_sketch_of(p, **kw).serialize() for p in parts]

    def fold(order, shape):
        blobs = [sks[i] for i in order]
        if shape == "left":
            acc = DDSketch.deserialize(blobs[0])
            for b in blobs[1:]:
                acc.merge(DDSketch.deserialize(b))
            return acc.serialize()
        # balanced tree
        layer = [DDSketch.deserialize(b) for b in blobs]
        while len(layer) > 1:
            nxt = []
            for i in range(0, len(layer) - 1, 2):
                nxt.append(layer[i].merge(layer[i + 1]))
            if len(layer) % 2:
                nxt.append(layer[-1])
            layer = nxt
        return layer[0].serialize()

    ref = fold(range(8), "left")
    for order, shape in [
        (range(7, -1, -1), "left"),
        (RNG.permutation(8), "left"),
        (range(8), "tree"),
        (RNG.permutation(8), "tree"),
    ]:
        assert fold(list(order), shape) == ref, (
            f"fold {shape} over {list(order)} not byte-identical "
            f"(max_bins={max_bins})"
        )
    # and the fold equals the single-shot build when nothing collapsed
    if max_bins == 4096:
        assert ref == _sketch_of(vals, **kw).serialize()


def test_merge_param_mismatch_raises():
    a, b = DDSketch(alpha=0.01), DDSketch(alpha=0.02)
    with pytest.raises(ValueError):
        a.merge(b)
    c, d = DDSketch(max_bins=128), DDSketch(max_bins=256)
    with pytest.raises(ValueError):
        c.merge(d)


def test_constructor_validation():
    with pytest.raises(ValueError):
        DDSketch(alpha=0.0)
    with pytest.raises(ValueError):
        DDSketch(alpha=1.0)
    with pytest.raises(ValueError):
        DDSketch(max_bins=1)


def test_nan_dropped_and_counts():
    sk = DDSketch()
    sk.update_batch(np.array([1.0, np.nan, -2.0, 0.0, np.nan]))
    assert sk.n == 3
    assert sk.zero_count == 1
    assert sum(sk.pos.values()) == 1 and sum(sk.neg.values()) == 1


def test_state_size_independent_of_n():
    sk = DDSketch(alpha=0.01, max_bins=512)
    for _ in range(20):
        sk.update_batch(RNG.lognormal(5.0, 3.0, 100_000))
    assert len(sk.pos) <= 512
    assert len(sk.serialize()) <= 4 + 8 * 6 + 12 * 512 + 64
