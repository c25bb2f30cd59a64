"""Wire/serde fuzz across all 8 sketch families (VERDICT r03 #6).

Contract under test: ``deserialize`` must either return a sketch that
round-trips (``serialize(deserialize(b)) == b`` for valid wire bytes) or
raise ``ValueError`` — never crash with an unrelated exception and never
garbage-decode.  Fuzz corpus per family:

- valid blobs (round-trip law, byte-exact);
- every truncation prefix of a valid blob (the classic partial-write);
- valid blobs with a flipped byte in the header/length fields;
- pure random bytes, random bytes behind the correct magic prefix;
- empty input.

Seeded RNG — deterministic, no hypothesis dependency needed.
"""

import numpy as np
import pytest

from sketchlib.bloom import Bloom
from sketchlib.cms import CMS
from sketchlib.ddsketch import DDSketch
from sketchlib.hll import HLL
from sketchlib.kll import KLL
from sketchlib.kmv import KMV
from sketchlib.mg import MisraGries
from sketchlib.tdigest.core import MergingDigest

RNG = np.random.default_rng(20260818)


def _filled(make, update_vals):
    s = make()
    s.update_batch(update_vals)
    return s


def _families():
    vals = RNG.lognormal(4.0, 1.0, 5000)
    keys = np.array([f"k{i % 700}".encode() for i in range(5000)], dtype=object)
    key_hashes = np.array(
        [hash(f"k{i % 700}") & 0x7FFFFFFFFFFFFFFF for i in range(5000)],
        dtype=np.int64,
    )
    out = []
    for name, cls, mk in [
        ("tdigest", MergingDigest, lambda: _filled(lambda: MergingDigest(delta=0.01), vals)),
        ("hll", HLL, lambda: _filled(HLL, key_hashes)),
        ("cms", CMS, lambda: _filled(CMS, key_hashes)),
        ("bloom", Bloom, lambda: _filled(lambda: Bloom(expected_n=5000, fpr=0.01), key_hashes)),
        ("kll", KLL, lambda: _filled(KLL, vals)),
        ("kmv", KMV, lambda: _filled(KMV, key_hashes)),
        ("mg", MisraGries, lambda: _filled(MisraGries, key_hashes)),
        ("dd", DDSketch, lambda: _filled(
            lambda: DDSketch(alpha=0.01, max_bins=512),
            np.concatenate([vals, -vals[:500], np.zeros(7)]))),
    ]:
        out.append(pytest.param(name, cls, mk, id=name))
    return out


def _deser(cls, blob):
    """deserialize on the family's WIRE surface: the headered to_wire /
    from_wire pair for the t-digest (that is where its magic + truncation
    guard lives), plain classmethod deserialize elsewhere."""
    if cls is MergingDigest:
        return MergingDigest.from_wire(blob)
    return cls.deserialize(blob)


def _ser(s):
    return s.to_wire() if isinstance(s, MergingDigest) else s.serialize()


def _assert_clean(cls, blob):
    """Either a usable sketch comes back, or ValueError — nothing else."""
    try:
        s = _deser(cls, blob)
    except ValueError:
        return None
    # accepted: then it must re-serialize without crashing (no garbage state)
    out = _ser(s)
    assert isinstance(out, (bytes, bytearray))
    return s


@pytest.mark.parametrize("name,cls,mk", _families())
def test_roundtrip_exact(name, cls, mk):
    blob = _ser(mk())
    s = _deser(cls, blob)
    assert bytes(_ser(s)) == bytes(blob), f"{name}: round-trip not byte-stable"


@pytest.mark.parametrize("name,cls,mk", _families())
def test_truncations_never_garbage(name, cls, mk):
    blob = _ser(mk())
    # every prefix for short blobs, a stride for long ones, always incl. 0..16
    cuts = set(range(min(len(blob), 17)))
    cuts.update(range(0, len(blob), max(1, len(blob) // 64)))
    cuts.add(len(blob) - 1)
    for cut in sorted(cuts):
        trunc = blob[:cut]
        s = _assert_clean(cls, trunc)
        if s is not None:
            # a truncated blob that is *accepted* (e.g. a legacy headerless
            # form, or a cut landing on a whole-centroid boundary of the
            # concat-mergeable payload) must CANONICALIZE: serialize, parse,
            # re-serialize is byte-stable.  Accepting a prefix into garbage
            # state would fail here on the second pass.
            c = bytes(_ser(s))
            s2 = _deser(cls, c)
            assert bytes(_ser(s2)) == c, (
                f"{name}: truncation at {cut}/{len(blob)} accepted but does "
                f"not canonicalize"
            )


@pytest.mark.parametrize("name,cls,mk", _families())
def test_bitflips_and_random_never_crash(name, cls, mk):
    blob = bytearray(_ser(mk()))
    rng = np.random.default_rng(7)
    # header/length-field bit flips (first 32 bytes are where the framing is)
    for _ in range(64):
        i = int(rng.integers(0, min(32, len(blob))))
        mut = bytearray(blob)
        mut[i] ^= int(rng.integers(1, 256))
        _assert_clean(cls, bytes(mut))
    # random tails behind the right magic
    magic = bytes(blob[:4])
    for _ in range(32):
        n = int(rng.integers(0, 256))
        _assert_clean(cls, magic + rng.bytes(n))
    # pure random bytes + empty
    for _ in range(32):
        _assert_clean(cls, rng.bytes(int(rng.integers(0, 128))))
    _assert_clean(cls, b"")
