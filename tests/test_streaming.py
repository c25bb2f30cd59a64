"""Structured Streaming digests: windowed stateful aggregation equals the
batch build in exact mode, regardless of trigger boundaries."""

import os

import numpy as np
import pandas as pd
import pytest


def _write_chunks(tmpdir, n_files=4, rows_per=500):
    """Deterministic event files: (warc_ts, lang, n_chars) across 3 hours."""
    rng = np.random.default_rng(77)
    paths = []
    base = np.datetime64("2025-03-01T00:00:00")
    for f in range(n_files):
        ts = base + rng.integers(0, 3 * 3600, rows_per).astype("timedelta64[s]")
        pdf = pd.DataFrame({
            "warc_ts": pd.Series(ts),
            "lang": rng.choice(["en", "de"], rows_per),
            "n_chars": rng.integers(10, 5000, rows_per).astype("float64"),
        })
        p = os.path.join(tmpdir, f"chunk-{f}.parquet")
        pdf.to_parquet(p)
        paths.append(p)
    return paths


def test_streaming_digests_match_batch(spark, tmp_path):
    from sketchlib.spark.streaming import streaming_tdigest
    from sketchlib.spark.tdigest_ops import tdigest_aggregate

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_chunks(src)

    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).option(
        "maxFilesPerTrigger", "1"  # force 4 incremental triggers
    ).parquet(src)

    out = streaming_tdigest(
        stream, ["lang"], "n_chars", ts_col="warc_ts",
        window="1 hour", watermark="10 hours", delta=0.0,
    )

    latest = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            latest[(r["lang"], r["window_start"])] = bytes(r["digest"])

    q = out.writeStream.outputMode("update").foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()

    # batch reference: exact digests per (lang, hour window)
    from pyspark.sql import functions as F

    batch = static.withColumn("_w", F.window("warc_ts", "1 hour")).select(
        "lang", F.col("_w.start").alias("window_start"), "n_chars"
    )
    ref = {
        (r["lang"], r["window_start"]): bytes(r["digest"])
        for r in tdigest_aggregate(
            batch, ["lang", "window_start"], "n_chars", delta=0.0
        ).collect()
    }
    assert set(latest) == set(ref)
    assert len(ref) == 6  # 2 langs x 3 hour-windows
    for k in ref:
        assert latest[k] == ref[k], f"stream/batch digest mismatch for {k}"
