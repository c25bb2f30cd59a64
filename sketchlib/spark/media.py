"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media are opaque ``binary`` payloads with typed metadata, processed as Arrow
batches through ``mapInPandas`` — the schema, partitioning, UDF signatures
and batch shapes are real and tested; only the pixel/sample *decode* step is
stubbed (no image/audio libraries in this container), clearly marked with
``NotImplementedError`` and a deterministic fake behind ``fake=True``.

Wire format of the synthetic payloads (gen + sniff round-trip):

  bytes 0..3   magic: b"IMG0" | b"AUD0" | b"VID0"
  bytes 4..7   width  (uint32 BE)   — images/video; 0 for audio
  bytes 8..11  height (uint32 BE)   — images/video; 0 for audio
  bytes 12..15 duration_ms (uint32 BE) — audio/video; 0 for images
  bytes 16..   body (opaque)

Scale notes: payloads at 100 TB stay in parquet/Iceberg binary columns and
never leave the executor; header sniffing reads 16 bytes per row, so the
scan is column-pruned to (id, payload) and the Python stage is bounded by
Arrow transfer of the payload column.  For very large media, store payloads
in object storage and keep (url, byte_range) here instead — the operators
below only need the header bytes.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGICS = {b"IMG0": "image", b"AUD0": "audio", b"VID0": "video"}
HEADER_LEN = 16

META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
    StructField("payload_bytes", LongType()),
])


def pack_media(kind: str, width: int, height: int, duration_ms: int,
               body: bytes) -> bytes:
    magic = {v: k for k, v in MAGICS.items()}[kind]
    return magic + struct.pack(">III", width, height, duration_ms) + body


def sniff_media_meta(df: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """Parse the typed header out of the opaque binary column.

    Only the first 16 bytes of each payload are touched; unknown magics
    yield kind='unknown' with zeroed dims.
    """

    def sniff(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            kinds, ws, hs, ds, sizes = [], [], [], [], []
            for b in pdf[payload_col]:
                b = bytes(b) if b is not None else b""
                sizes.append(len(b))
                if len(b) >= HEADER_LEN and b[:4] in MAGICS:
                    w, h, d = struct.unpack(">III", b[4:16])
                    kinds.append(MAGICS[b[:4]])
                    ws.append(w), hs.append(h), ds.append(d)
                else:
                    kinds.append("unknown")
                    ws.append(0), hs.append(0), ds.append(0)
            yield pd.DataFrame({
                "media_id": ids, "kind": kinds,
                "width": np.array(ws, dtype=np.int32),
                "height": np.array(hs, dtype=np.int32),
                "duration_ms": np.array(ds, dtype=np.int32),
                "payload_bytes": np.array(sizes, dtype=np.int64),
            })

    return df.select(id_col, payload_col).mapInPandas(sniff, schema=META_SCHEMA)


FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("features", ArrayType(FloatType())),
])


def media_features(df: DataFrame, dim: int = 8, fake: bool = False,
                   id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Decode + feature-extract.  The real decode needs PIL/librosa/ffmpeg —
    absent here — so without ``fake=True`` this raises NotImplementedError
    *at plan-build time* (fail fast, not per-executor).  ``fake=True``
    substitutes a deterministic body-hash feature vector with the production
    schema and batch shape, so the full Spark plumbing is exercised.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )

    def feats(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            out = np.empty((len(ids), dim), dtype=np.float32)
            for i, b in enumerate(pdf[payload_col]):
                body = bytes(b)[HEADER_LEN:] if b is not None else b""
                # deterministic "embedding": chunked byte sums, unit-scaled
                arr = np.frombuffer(body, dtype=np.uint8)
                if len(arr) == 0:
                    out[i] = 0.0
                    continue
                pad = (-len(arr)) % dim
                arr = np.pad(arr, (0, pad)).reshape(dim, -1)
                v = arr.sum(axis=1).astype(np.float32)
                out[i] = v / (np.linalg.norm(v) or 1.0)
            yield pd.DataFrame({"media_id": ids, "features": list(out)})

    return df.select(id_col, payload_col).mapInPandas(feats, schema=FEATURES_SCHEMA)


def synth_media_from_docs(df: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents`` (no external
    data): kind cycles image/audio/video by doc_id, dims/durations are fixed
    arithmetic in doc_id, body is the utf-8 text.  Exists so the binary
    plumbing can be driven end-to-end against an arithmetic SQL oracle."""

    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
    ])

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            payloads = []
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            for doc_id, text in zip(ids, pdf["text"]):
                k = kinds[int(doc_id) % 3]
                w = 0 if k == "audio" else 16 + (int(doc_id) * 7919) % 1024
                h = 0 if k == "audio" else 16 + (int(doc_id) * 104729) % 768
                d = 0 if k == "image" else 1000 + (int(doc_id) * 31) % 60000
                payloads.append(pack_media(k, w, h, d, text.encode("utf-8")))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select("doc_id", "text").mapInPandas(build, schema=out_schema)


FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("ts_ms", IntegerType()),
])


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  id_col: str = "media_id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per sampled
    timestamp (0, every_ms, 2*every_ms, ... < duration).  The frame *pixels*
    would come from the stubbed decoder; the sampling plan itself — the
    UDTF-style row explosion a real pipeline schedules decode work with —
    is fully real."""

    def frames(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_out, idxs, tss = [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b) if b is not None else b""
                if len(b) < HEADER_LEN or b[:4] != b"VID0":
                    continue
                (dur,) = struct.unpack(">I", b[12:16])
                k = 0
                for ts in range(0, dur, every_ms):
                    ids_out.append(mid), idxs.append(k), tss.append(ts)
                    k += 1
            yield pd.DataFrame({
                "media_id": np.array(ids_out, dtype=np.int64),
                "frame_idx": np.array(idxs, dtype=np.int32),
                "ts_ms": np.array(tss, dtype=np.int32),
            })

    return df.select(id_col, payload_col).mapInPandas(frames, schema=FRAMES_SCHEMA)
