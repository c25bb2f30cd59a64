"""Multimodal binary-column plumbing: header round-trip, stubbed decode,
frame sampling, batch shapes."""

import struct

import numpy as np
import pytest

from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_pack_sniff_roundtrip(spark):
    from sketchlib.spark.media import pack_media, sniff_media_meta

    rows = [
        (1, pack_media("image", 640, 480, 0, b"px" * 100)),
        (2, pack_media("audio", 0, 0, 30_000, b"\x01" * 50)),
        (3, pack_media("video", 1920, 1080, 120_000, b"fr" * 7)),
        (4, b"JUNK" + b"\x00" * 20),  # unknown magic
        (5, b"\x01"),  # too short
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in sniff_media_meta(df).collect()}
    assert got[1] == {"media_id": 1, "kind": "image", "width": 640, "height": 480,
                      "duration_ms": 0, "payload_bytes": 216}
    assert got[2]["kind"] == "audio" and got[2]["duration_ms"] == 30_000
    assert got[3]["kind"] == "video" and got[3]["width"] == 1920
    assert got[4]["kind"] == "unknown" and got[4]["payload_bytes"] == 24
    assert got[5]["kind"] == "unknown"


def test_decoders_roundtrip_local():
    """Built-in decoders: encode->decode is exact for BMP pixels and
    within-quantization for WAV samples."""
    from sketchlib.spark.media import decode_bmp, decode_wav, encode_bmp, encode_wav

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)  # odd W -> row padding
    assert (decode_bmp(encode_bmp(px)) == px).all()
    x = rng.uniform(-1, 1, 4801).astype(np.float32)
    y = decode_wav(encode_wav(x))
    assert y.shape == x.shape and np.abs(y - x).max() < 2.0 / 32767

    with pytest.raises(ValueError):
        decode_bmp(b"not a bitmap at all")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFgarbage")


@pytest.mark.skipif(
    __import__("sketchlib.spark.media", fromlist=["available_decoders"])
    .available_decoders()["image_pil"] is False,
    reason="PIL not installed — built-in BMP parser is the exercised path",
)
def test_pil_bmp_parity():
    """When PIL exists, it must yield the same pixels as the built-in BMP
    parser (so features are decoder-independent)."""
    from sketchlib.spark.media import decode_bmp, encode_bmp

    import io

    from PIL import Image

    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    blob = encode_bmp(px)
    via_pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    assert (via_pil == decode_bmp(blob)).all()


def test_real_decode_auto_mode(spark):
    """mode='auto' really decodes BMP images and WAV audio (decode_ok=True,
    content-derived features) and falls back to the deterministic fake for
    video / undecodable bodies (decode_ok=False).  mode='real' nulls the
    failures instead."""
    from sketchlib.spark.media import (
        encode_bmp, encode_wav, media_features, pack_media,
    )

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    wav = encode_wav(np.sin(np.linspace(0, 60, 8000)).astype(np.float32))
    rows = [
        (1, pack_media("image", 16, 16, 0, encode_bmp(px))),
        (2, pack_media("audio", 0, 0, 500, wav)),
        (3, pack_media("video", 64, 64, 2000, b"opaque-frames")),
        (4, pack_media("image", 8, 8, 0, b"corrupt-not-bmp")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    auto = {r["media_id"]: r for r in media_features(df, mode="auto").collect()}
    assert auto[1]["decode_ok"] and auto[2]["decode_ok"]
    assert not auto[3]["decode_ok"] and not auto[4]["decode_ok"]
    for r in auto.values():  # fake fallback still yields a usable vector
        assert r["features"] is not None and len(r["features"]) == 8

    # image features are pixel-derived: independent reference computation
    from sketchlib.spark.media import _image_features
    want = _image_features(px, 8)
    assert np.allclose(auto[1]["features"], want, atol=1e-6)

    strict = {r["media_id"]: r for r in media_features(df, mode="real").collect()}
    assert strict[1]["features"] is not None and strict[3]["features"] is None
    assert strict[4]["features"] is None

    # back-compat spelling: fake=True == mode='fake', never decodes
    fk = {r["media_id"]: r for r in media_features(df, fake=True).collect()}
    assert not any(r["decode_ok"] for r in fk.values())


def test_fake_features_deterministic_unit_norm(spark):
    from sketchlib.spark.media import media_features, synth_media_from_docs

    media = synth_media_from_docs(_docs(spark))
    a = {r["media_id"]: r["features"] for r in media_features(media, fake=True).collect()}
    b = {
        r["media_id"]: r["features"]
        for r in media_features(media.repartition(9), fake=True).collect()
    }
    assert a == b
    for v in a.values():
        assert len(v) == 8
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_frame_sampling_counts(spark):
    from sketchlib.spark.media import pack_media, sample_frames

    df = spark.createDataFrame(
        [
            (1, pack_media("video", 64, 64, 9_500, b"")),   # 0..9500 @1000 -> 10
            (2, pack_media("video", 64, 64, 1_000, b"")),   # ts 0 only
            (3, pack_media("image", 64, 64, 0, b"")),       # not video -> none
        ],
        "media_id long, payload binary",
    )
    rows = sample_frames(df, every_ms=1000).collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
    assert len(per[1]) == 10 and per[1][0] == (0, 0) and sorted(per[1])[-1] == (9, 9000)
    assert per[2] == [(0, 0)]
    assert 3 not in per


def test_synth_media_matches_arithmetic(spark):
    from sketchlib.spark.media import sniff_media_meta, synth_media_from_docs

    docs = {r["doc_id"]: r["text"] for r in _docs(spark).limit(40).collect()}
    from pyspark.sql import functions as F

    sub = _docs(spark).filter(F.col("doc_id").isin(list(docs)))
    got = {r["media_id"]: r.asDict()
           for r in sniff_media_meta(synth_media_from_docs(sub)).collect()}
    kinds = ["image", "audio", "video"]
    for doc_id, text in docs.items():
        g = got[doc_id]
        k = kinds[doc_id % 3]
        assert g["kind"] == k
        assert g["width"] == (0 if k == "audio" else 16 + (doc_id * 7919) % 1024)
        assert g["duration_ms"] == (0 if k == "image" else 1000 + (doc_id * 31) % 60000)
        assert g["payload_bytes"] == 16 + len(text.encode())
