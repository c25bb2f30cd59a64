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


def test_decode_stub_raises_without_fake(spark):
    from sketchlib.spark.media import media_features

    df = spark.createDataFrame([(1, b"IMG0" + b"\x00" * 12)],
                               "media_id long, payload binary")
    with pytest.raises(NotImplementedError):
        media_features(df)  # fail fast at plan-build time


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
