"""Property-based tests (hypothesis) for the core sketch laws.

These are the algebraic guarantees the distributed plans rely on, checked
over randomized inputs rather than fixed examples:

- lossless merge is associative + commutative ON BYTES (any partition order);
- serde round-trips exactly; concat-of-blobs == merge;
- quantiles are monotone in p, clamped to [min, max]; CDF is monotone in q;
- compression preserves total weight, min/max means, and the size bound;
- discrete mode returns only observed values.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from sketchlib.tdigest.core import (
    MergingDigest,
    bytes_to_centroids,
    compress_centroids_vec,
)

floats = st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, width=64)
value_lists = st.lists(floats, min_size=1, max_size=400)


def _digest_of(xs, delta=0.01):
    d = MergingDigest(delta=delta)
    d.update_batch(np.asarray(xs, dtype=np.float64))
    return d


@settings(max_examples=60, deadline=None)
@given(value_lists, value_lists, value_lists)
def test_merge_associative_commutative_on_bytes(a, b, c):
    blobs = [_digest_of(x, delta=0.0).serialize() for x in (a, b, c)]

    def merged(order):
        d = MergingDigest.deserialize(b"".join(blobs[i] for i in order), delta=0.0)
        d.compress()
        return d.serialize()

    base = merged([0, 1, 2])
    for order in ([2, 1, 0], [1, 0, 2], [0, 2, 1]):
        assert merged(order) == base


@settings(max_examples=60, deadline=None)
@given(value_lists)
def test_serde_roundtrip_exact(xs):
    d = _digest_of(xs)
    blob = d.serialize()
    d2 = MergingDigest.deserialize(blob, delta=0.01)
    assert d2.serialize() == blob
    m, n = bytes_to_centroids(blob)
    assert abs(float(n.sum()) - len(xs)) < 1e-9 * max(1, len(xs))


@settings(max_examples=60, deadline=None)
@given(value_lists, st.lists(st.floats(min_value=0.0, max_value=1.0), min_size=2, max_size=8))
def test_quantiles_monotone_and_clamped(xs, ps):
    d = _digest_of(xs)
    d.compress()
    ps = sorted(ps)
    qs = d.quantile(np.asarray(ps))
    assert np.all(np.diff(qs) >= -1e-12)  # monotone in p
    assert qs.min() >= min(xs) - 1e-9 and qs.max() <= max(xs) + 1e-9


@settings(max_examples=60, deadline=None)
@given(value_lists, st.lists(floats, min_size=2, max_size=8))
def test_cdf_monotone_bounded(xs, probes):
    d = _digest_of(xs)
    d.compress()
    probes = sorted(probes)
    cs = d.cdf(np.asarray(probes))
    assert np.all(np.diff(cs) >= -1e-12)
    assert cs.min() >= 0.0 and cs.max() <= 1.0


@settings(max_examples=60, deadline=None)
@given(st.lists(floats, min_size=4, max_size=2000))
def test_compress_preserves_mass_and_extremes(xs):
    xs = np.asarray(xs, dtype=np.float64)
    uniq, counts = np.unique(xs, return_counts=True)
    m2, n2 = compress_centroids_vec(uniq, counts.astype(np.float64), 0.01)
    assert abs(float(n2.sum()) - len(xs)) < 1e-9 * len(xs)
    assert m2[0] == uniq[0] and m2[-1] == uniq[-1]  # exact min/max means
    assert np.all(np.diff(m2) > 0)  # sorted unique output
    assert len(m2) <= len(uniq)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=300),
       st.floats(min_value=0.0, max_value=1.0))
def test_discrete_quantile_is_observed_value(xs, p):
    d = MergingDigest(delta=0.0, discrete=True)
    d.update_batch(np.asarray(xs, dtype=np.float64))
    q = float(d.quantile([p])[0])
    assert q in set(float(x) for x in xs)


@settings(max_examples=30, deadline=None)
@given(st.lists(floats, min_size=50, max_size=2000), st.integers(2, 7))
def test_partitioned_build_matches_single_build_exact_mode(xs, k):
    """Split the stream into k 'partitions', build partials, byte-concat —
    identical to the single-pass exact digest (the Spark plan in miniature)."""
    xs = np.asarray(xs, dtype=np.float64)
    whole = MergingDigest(delta=0.0)
    whole.update_batch(xs)
    single = whole.serialize()

    parts = np.array_split(xs, k)
    blob = b"".join(
        _digest_of(p, delta=0.0).serialize() for p in parts if len(p)
    )
    merged = MergingDigest.deserialize(blob, delta=0.0)
    assert merged.serialize() == single


# --- wire container properties ----------------------------------------------


@given(
    delta=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    discrete=st.booleans(),
    vals=st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, width=64),
        min_size=0, max_size=200,
    ),
)
@settings(max_examples=60, deadline=None)
def test_wire_roundtrip_property(delta, discrete, vals):
    """to_wire ∘ from_wire is the identity on (payload, delta, discrete)."""
    from sketchlib.tdigest.core import MergingDigest, parse_tdigest_wire

    d = MergingDigest(delta=delta, discrete=discrete)
    d.update_batch(np.asarray(vals, dtype=np.float64))
    blob = d.to_wire()
    payload, h_delta, h_disc = parse_tdigest_wire(blob)
    assert (h_delta, h_disc) == (delta, discrete)
    back = MergingDigest.from_wire(blob)
    assert back.serialize() == d.serialize()


@given(junk=st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_wire_parser_never_misparses_junk(junk):
    """Arbitrary bytes either parse as a legacy payload (pass-through) or
    raise ValueError — never a silent wrong parse of the header."""
    from sketchlib.tdigest.core import WIRE_MAGIC, parse_tdigest_wire

    try:
        payload, delta, discrete = parse_tdigest_wire(junk)
    except ValueError:
        return  # fail-fast path: only legal for magic-prefixed junk
    if junk.startswith(WIRE_MAGIC):
        assert delta is not None and isinstance(discrete, bool)
        assert payload == junk[20:]
    else:
        assert (payload, delta, discrete) == (junk, None, None)


@given(
    ts=st.lists(st.integers(min_value=0, max_value=50_000), min_size=1,
                max_size=120),
    splits=st.lists(st.integers(min_value=0, max_value=119), max_size=6),
    gap=st.sampled_from([1, 60, 1800]),
)
@settings(max_examples=150, deadline=None)
def test_session_interval_merge_incremental_equals_batch(ts, splits, gap):
    """streaming_sessions' core law: folding events into the open-session
    state in ANY arrival batching (late events included) yields exactly the
    sessions of a single batch pass — the associativity that makes the
    streaming operator equal the batch lag+cumsum query."""
    from sketchlib.spark.streaming import _merge_sessions

    arr = np.array(ts, dtype=np.int64)

    def batch_sessions(events):
        s = np.sort(events)
        bounds = np.nonzero(np.diff(s) > gap)[0]
        starts = np.concatenate([[0], bounds + 1])
        ends = np.concatenate([bounds, [len(s) - 1]])
        return [(int(s[a]), int(s[b]), int(b - a + 1))
                for a, b in zip(starts, ends)]

    # arbitrary arrival order and batching
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(arr))
    cuts = sorted({min(c, len(arr)) for c in splits})
    pieces = np.split(arr[perm], cuts)

    z = np.empty(0, dtype=np.int64)
    s, l, n = z, z, z
    for piece in pieces:
        if len(piece) == 0:
            continue
        s = np.concatenate([s, piece])
        l = np.concatenate([l, piece])
        n = np.concatenate([n, np.ones(len(piece), dtype=np.int64)])
        s, l, n = _merge_sessions(s, l, n, gap)

    got = sorted(zip(s.tolist(), l.tolist(), n.tolist()))
    assert got == sorted(batch_sessions(arr))


@settings(max_examples=60, deadline=None)
@given(value_lists, value_lists, st.integers(min_value=2, max_value=20))
def test_psi_jsd_laws(a, b, bins):
    """PSI >= 0 and JSD in [0, ln 2] on arbitrary data/bin counts; both are
    exactly 0 for identical discrete digests; partition layout of the
    build never changes either statistic (digests are layout-invariant)."""
    import math

    from sketchlib.tdigest.core import psi_jsd_of_centroids

    def discrete_of(xs):
        d = MergingDigest(discrete=True)
        d.update_batch(np.asarray(xs, dtype=np.float64))
        d.compress()
        return d

    da, db = discrete_of(a), discrete_of(b)
    psi, jsd = psi_jsd_of_centroids(da._means, da._ns, db._means, db._ns, bins)
    assert psi >= 0.0 and not math.isnan(psi)
    assert -1e-15 <= jsd <= math.log(2.0) + 1e-12
    assert psi_jsd_of_centroids(
        da._means, da._ns, da._means, da._ns, bins) == (0.0, 0.0)
    # layout invariance: build one side from a 3-way byte-concat split
    k = max(1, len(a) // 3)
    parts = [a[:k], a[k:2 * k], a[2 * k:]]
    blob = b"".join(discrete_of(p).serialize() for p in parts if p)
    dm = MergingDigest.deserialize(blob, discrete=True)
    dm.compress()
    assert psi_jsd_of_centroids(
        dm._means, dm._ns, db._means, db._ns, bins) == (psi, jsd)
