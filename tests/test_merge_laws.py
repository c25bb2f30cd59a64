"""North-star merge laws: exact associativity/commutativity on serialized bytes.

``merge(a, merge(b, c)) == merge(merge(a, b), c)`` and invariance under any
permutation/grouping of partials — guaranteed by design because the
distributed merge is a lossless (mean → Σn) union with compression applied
once at the end (SURVEY.md §7.3.2; reference analog src/tdigest.ml:402-408).
"""

import itertools

import pytest

import numpy as np

from sketchlib.tdigest.core import (
    MergingDigest,
    bytes_to_centroids,
    centroids_to_bytes,
    merge_centroid_arrays,
)


def _partial(xs, delta=0.01):
    d = MergingDigest(delta=delta)
    d.update_batch(np.asarray(xs, dtype=float))
    return d


def _final(partials_bytes, delta=0.01):
    """The production final-merge: union all partials, one compress, serialize."""
    means, ns = merge_centroid_arrays([bytes_to_centroids(b) for b in partials_bytes])
    d = MergingDigest(delta=delta)
    d._means, d._ns = means, ns
    d.compress()
    return d.serialize()


def test_merge_associative_on_bytes():
    rng = np.random.default_rng(42)
    a = _partial(rng.normal(size=5000)).serialize()
    b = _partial(rng.normal(size=5000)).serialize()
    c = _partial(rng.normal(size=5000)).serialize()
    left = _final([_final([a, b]), c])
    right = _final([a, _final([b, c])])
    flat = _final([a, b, c])
    # lossless-union + single-final-compress: nested groupings equal the flat
    # merge only when intermediate results are not re-compressed; the law we
    # guarantee exactly is grouping-invariance of the lossless union:
    u1 = merge_centroid_arrays(
        [merge_centroid_arrays([bytes_to_centroids(a), bytes_to_centroids(b)]),
         bytes_to_centroids(c)]
    )
    u2 = merge_centroid_arrays(
        [bytes_to_centroids(a),
         merge_centroid_arrays([bytes_to_centroids(b), bytes_to_centroids(c)])]
    )
    assert centroids_to_bytes(*u1) == centroids_to_bytes(*u2)
    # and the full pipeline (union → one deterministic compress) is
    # grouping-independent as long as compression happens once at the end:
    assert _final([a, b, c]) == _final([b, c, a]) == _final([c, a, b]) == flat
    # nested final-compress (tree merge) stays within the error bound — the
    # bytes can differ; assert quantile agreement instead
    dl = MergingDigest.deserialize(left)
    dr = MergingDigest.deserialize(right)
    for p in [0.1, 0.5, 0.9, 0.99]:
        assert abs(float(dl.quantile([p])[0]) - float(dr.quantile([p])[0])) < 0.05


def test_merge_commutative_all_permutations():
    rng = np.random.default_rng(1)
    parts = [_partial(rng.normal(size=1000)).serialize() for _ in range(4)]
    results = {_final(list(perm)) for perm in itertools.permutations(parts)}
    assert len(results) == 1


def test_concat_bytes_equals_union():
    """Concatenation of serialized digests is itself a valid serialized digest
    whose parse equals the explicit union (reference README.md:25-41)."""
    rng = np.random.default_rng(5)
    a = _partial(rng.random(100))
    b = _partial(rng.random(100))
    concat = a.serialize() + b.serialize()
    via_concat = bytes_to_centroids(concat)
    via_union = merge_centroid_arrays(
        [bytes_to_centroids(a.serialize()), bytes_to_centroids(b.serialize())]
    )
    assert centroids_to_bytes(*via_concat) == centroids_to_bytes(*via_union)


def test_duplicate_means_summed_on_parse():
    d1 = centroids_to_bytes(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
    d2 = centroids_to_bytes(np.array([2.0, 5.0]), np.array([1.0, 1.0]))
    means, ns = bytes_to_centroids(d1 + d2)
    assert means.tolist() == [1.0, 2.0, 5.0]
    assert ns.tolist() == [3.0, 5.0, 1.0]


def test_partition_invariance_exact_mode():
    """Exact mode (delta=0: never merge): the final digest is byte-identical
    no matter how the input is partitioned — basis of the Spark
    repartition-invariance guarantee."""
    rng = np.random.default_rng(9)
    xs = rng.integers(0, 500, size=10_000).astype(float)  # many duplicates
    whole = _partial(xs, delta=0.0).serialize()
    for n_parts in (2, 7, 64):
        parts = [
            _partial(chunk, delta=0.0).serialize()
            for chunk in np.array_split(xs, n_parts)
        ]
        merged = _final(parts, delta=0.0)
        assert merged == whole


def test_empty_digest_is_monoid_identity():
    rng = np.random.default_rng(2)
    a = _partial(rng.random(500))
    empty = MergingDigest()
    assert empty.serialize() == b""
    assert _final([a.serialize(), empty.serialize()]) == _final([a.serialize()])


def test_weighted_nan_alignment():
    """NaN values must drop their paired weights, not shift them (regression:
    values were NaN-filtered before weights were sliced)."""
    import numpy as np

    from sketchlib.tdigest.core import MergingDigest

    a = MergingDigest(delta=0.0)
    a.update_batch(np.array([1.0, np.nan, 3.0]), np.array([10.0, 20.0, 30.0]))
    b = MergingDigest(delta=0.0)
    b.update_batch(np.array([1.0, 3.0]), np.array([10.0, 30.0]))
    assert a.serialize() == b.serialize()


def test_nonpositive_weights_raise():
    import numpy as np
    import pytest

    from sketchlib.tdigest.core import MergingDigest

    d = MergingDigest()
    with pytest.raises(ValueError):
        d.update_batch(np.array([1.0]), np.array([0.0]))
    with pytest.raises(ValueError):
        d.update_batch(np.array([1.0, 2.0]), np.array([1.0, -3.0]))
    with pytest.raises(ValueError):
        d.update_batch(np.array([1.0, 2.0]), np.array([1.0]))


# --- versioned wire container (SURVEY §1.3 header) ---------------------------


def test_wire_round_trip_restores_settings():
    from sketchlib.tdigest.core import MergingDigest, TDigest, parse_tdigest_wire

    rng = np.random.default_rng(8)
    vals = rng.normal(0, 5, 10_000)
    d = MergingDigest(delta=0.015, discrete=False)
    d.update_batch(vals)
    d.compress()
    blob = d.to_wire()
    payload, delta, discrete = parse_tdigest_wire(blob)
    assert (delta, discrete) == (0.015, False)
    back = MergingDigest.from_wire(blob)
    assert back.delta == 0.015 and back.discrete is False
    assert back.serialize() == d.serialize()

    t = TDigest(delta=0.2, discrete=True)
    t.add_list([1.0, 2.0, 2.0, 3.0])
    t2 = TDigest.from_wire(t.to_wire())
    assert t2.discrete is True and t2.delta == 0.2
    assert t2.centroids() == t.centroids()


def test_wire_header_is_backward_compatible_with_raw():
    from sketchlib.tdigest.core import MergingDigest

    d = MergingDigest(delta=0.0)
    d.update_batch(np.arange(100, dtype="float64"))
    raw = d.serialize()
    # legacy raw blobs parse via from_wire with explicit settings
    back = MergingDigest.from_wire(raw, delta=0.0)
    assert back.serialize() == raw
    # and a headered blob is NOT a multiple of 16, so the legacy parser
    # fail-fasts instead of silently misreading it
    with pytest.raises(ValueError):
        MergingDigest.deserialize(d.to_wire())


def test_wire_payload_concat_is_valid_merge():
    """Raw-concat mergeability is preserved INSIDE the payload: the concat
    of two wire payloads is a valid digest equal to the lossless union."""
    from sketchlib.tdigest.core import MergingDigest, parse_tdigest_wire

    rng = np.random.default_rng(9)
    a = MergingDigest(delta=0.0)
    a.update_batch(rng.integers(0, 50, 500).astype("float64"))
    b = MergingDigest(delta=0.0)
    b.update_batch(rng.integers(25, 75, 500).astype("float64"))
    pa, _, _ = parse_tdigest_wire(a.to_wire())
    pb, _, _ = parse_tdigest_wire(b.to_wire())
    merged = MergingDigest.deserialize(pa + pb, delta=0.0)
    ref = MergingDigest.deserialize(a.serialize()).merge_bytes(b.serialize())
    assert merged.serialize() == ref.serialize()


def test_wire_rejects_foreign_type_and_version():
    import struct

    from sketchlib.tdigest.core import (
        WIRE_MAGIC,
        MergingDigest,
        parse_tdigest_wire,
        wrap_tdigest_wire,
    )

    d = MergingDigest(delta=0.01)
    d.update_batch(np.arange(10, dtype="float64"))
    blob = bytearray(d.to_wire())
    blob[4:8] = b"HLD1"  # claim to be an HLL
    with pytest.raises(ValueError, match="not a t-digest"):
        parse_tdigest_wire(bytes(blob))
    blob = bytearray(d.to_wire())
    blob[8:10] = struct.pack("<H", 99)  # future version
    with pytest.raises(ValueError, match="version"):
        parse_tdigest_wire(bytes(blob))
    with pytest.raises(ValueError, match="truncated"):
        parse_tdigest_wire(WIRE_MAGIC + b"TD")
    assert wrap_tdigest_wire(b"", 0.01, True)[:4] == WIRE_MAGIC


def test_wire_truncated_headered_blob_raises_not_garbage():
    """A headered blob truncated onto a 16-byte boundary (header + 12 bytes
    = 32) must raise, not silently decode header bytes as centroids; and
    magic-prefixed lengths ∉ {0, 4} mod 16 are hard errors."""
    from sketchlib.tdigest.core import (
        WIRE_MAGIC,
        parse_tdigest_wire,
        wrap_tdigest_wire,
    )

    truncated = wrap_tdigest_wire(b"", 0.01, False) + b"\x00" * 12
    assert truncated.startswith(WIRE_MAGIC) and len(truncated) % 16 == 0
    with pytest.raises(ValueError, match="truncated|plausible"):
        parse_tdigest_wire(truncated)
    with pytest.raises(ValueError, match="invalid length"):
        parse_tdigest_wire(WIRE_MAGIC + b"\x00" * 4)  # len 8 ≡ 8 (mod 16)


def test_wire_magic_collision_in_raw_payload_parses_as_legacy():
    """A legacy raw payload whose first centroid mean's LE bytes happen to
    start with the wire magic must still parse as legacy (disambiguated by
    length: raw ≡ 0 mod 16, headered ≡ 4 mod 16) — not be stripped of 20
    bytes of real centroid data."""
    from sketchlib.tdigest.core import (
        WIRE_MAGIC,
        bytes_to_centroids,
        centroids_to_bytes,
        parse_tdigest_wire,
    )

    evil_mean = float(np.frombuffer(WIRE_MAGIC + b"\x00\x00\x00\x00", "<f8")[0])
    raw = centroids_to_bytes(np.array([evil_mean]), np.array([3.0]))
    assert raw.startswith(WIRE_MAGIC) and len(raw) % 16 == 0
    payload, delta, discrete = parse_tdigest_wire(raw)
    assert payload == raw and delta is None and discrete is None
    m, n = bytes_to_centroids(payload)
    assert m[0] == evil_mean and n[0] == 3.0
