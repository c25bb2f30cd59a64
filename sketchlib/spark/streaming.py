"""Structured Streaming sketch aggregation (SURVEY.md §2.9 / §7 step 10).

The t-digest is a one-pass bounded-memory stream summary (reference
README.md:19-21) with no time semantics of its own; Spark supplies the time
axis.  ``streaming_tdigest`` keys a stateful aggregation by
(group keys × event-time window) and holds exactly one serialized digest as
per-key state:

  readStream -> withWatermark(ts) -> groupBy(keys, window)
             -> applyInPandasWithState(update digest state) -> writeStream

State per key is the ≤40 KB serialized digest, so a million live windows
cost ~40 GB of state across the cluster — bounded, spillable via RocksDB
state store.  Late rows inside the watermark merge losslessly into the
window's digest (mergeability is what makes out-of-order ingest exact);
rows later than the watermark are dropped by Spark upstream.

In exact mode (delta=0.0 / discrete) the emitted digest for a window is
byte-identical to the batch build over the same rows, regardless of trigger
boundaries or arrival order — asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from datetime import timezone
from typing import Iterable, Iterator
from zoneinfo import ZoneInfo

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    StructField,
    StructType,
    TimestampType,
)

from sketchlib.tdigest.core import MergingDigest


def _session_tz(df: DataFrame) -> ZoneInfo | None:
    """The session timezone as a ZoneInfo, or None when it isn't an IANA name
    (then naive outputs pass through unchanged — matching a UTC session)."""
    name = df.sparkSession.conf.get("spark.sql.session.timeZone")
    try:
        return ZoneInfo(name)
    except (KeyError, ValueError):
        return None


def _epoch_ms(dt) -> int:
    """Epoch millis of a window bound taken from a state key.

    ``applyInPandasWithState`` hands grouping-key timestamps to Python as
    *UTC-naive* datetimes (measured on PySpark 4.1: the key Timestamp equals
    the UTC window bound regardless of ``spark.sql.session.timeZone`` and of
    the process TZ) — so attach UTC explicitly.  Naive ``.timestamp()`` would
    interpret them in the process's system timezone, offsetting the
    event-time timeout by the tz delta; when that lands in the past, the
    watermark clamp fires the timeout early — emitting a partial digest and
    breaking emit-exactly-once.
    """
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def _key_ts_out(dt, tz: ZoneInfo | None):
    """Convert a UTC-naive state-key timestamp into the form the *output*
    serializer expects.

    Asymmetry measured on PySpark 4.1: keys come in UTC-naive, but naive
    timestamps yielded into an output TimestampType column are interpreted
    in ``spark.sql.session.timeZone`` — echoing the key unchanged would
    shift the emitted window bound by the session-tz offset.  Re-render the
    UTC wall time as session-tz wall time so the round trip is the identity.
    """
    if dt.tzinfo is not None or tz is None:
        return dt
    return dt.replace(tzinfo=timezone.utc).astimezone(tz).replace(tzinfo=None)


def streaming_tdigest(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    delta: float = 0.01,
    discrete: bool = False,
) -> DataFrame:
    """Per-(keys × time-window) t-digest over a streaming DataFrame.

    Emits on every trigger (Update mode) one row per touched window:
    (keys..., window_start, window_end, digest).  The digest column is the
    same wire format as the batch path, so downstream quantile/CDF UDFs and
    merges apply unchanged.
    """
    from sketchlib.spark.shipping import ensure_on_workers

    ensure_on_workers(stream.sparkSession)
    tz = _session_tz(stream)
    win = F.window(F.col(ts_col), window)
    keyed = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("_win", win)
        .select(
            *keys,
            F.col("_win.start").alias("window_start"),
            F.col("_win.end").alias("window_end"),
            F.col(value_col).cast("double").alias("_v"),
            # the watermarked column must survive to the stateful operator
            # for EventTimeTimeout to be legal
            F.col(ts_col),
        )
    )

    key_fields = [keyed.schema[k] for k in keys]
    out_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in key_fields]
        + [
            StructField("window_start", TimestampType(), True),
            StructField("window_end", TimestampType(), True),
            StructField("digest", BinaryType(), True),
        ]
    )
    state_schema = StructType([StructField("digest", BinaryType(), True)])

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # the watermark passed window_end: Spark drops any further rows
            # for this window upstream, so the state can never grow again —
            # evict it (snapshots were already emitted every trigger)
            state.remove()
            return
        d = MergingDigest(delta=delta, discrete=discrete)
        if state.exists:
            (blob,) = state.get
            if blob:
                d.merge_bytes(bytes(blob))
        for pdf in pdfs:
            d.update_batch(pdf["_v"].to_numpy(dtype="float64"))
        blob = d.serialize()
        state.update((blob,))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(_epoch_ms(key[len(keys) + 1]), wm + 1))
        out = {name: [key[i]] for i, name in enumerate(keys)}
        out["window_start"] = [_key_ts_out(key[len(keys)], tz)]
        out["window_end"] = [_key_ts_out(key[len(keys) + 1], tz)]
        out["digest"] = [blob]
        yield pd.DataFrame(out)

    return keyed.groupBy(*keys, "window_start", "window_end").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_sketch(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    sketch: str,
    params: dict | None = None,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(keys × event-time window) sibling sketch (hll/cms/bloom/kll)
    over a streaming DataFrame — the generalization of
    ``streaming_tdigest`` to the whole Aggregator family.

    Same plan shape: hashing stays JVM-side (``xxhash64`` projection for the
    hashed sketches, exactly like the batch path in
    ``sketchlib.spark.sketch_ops``, so stream- and batch-built sketches are
    interchangeable — byte-identical for the order-insensitive sketches
    HLL/CMS/Bloom); state per key is one serialized sketch; Update-mode
    snapshots each trigger; state evicts once the watermark passes the
    window (EventTimeTimeout).
    """
    import numpy as np

    from sketchlib.spark.shipping import ensure_on_workers
    from sketchlib.spark.sketch_ops import _HASHED, SKETCHES

    ensure_on_workers(stream.sparkSession)
    cls = SKETCHES[sketch]
    params = dict(params or {})
    hashed = sketch in _HASHED
    tz = _session_tz(stream)
    win = F.window(F.col(ts_col), window)
    val = (F.xxhash64(value_col) if hashed
           else F.col(value_col).cast("double")).alias("_v")
    keyed = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("_win", win)
        .select(
            *keys,
            F.col("_win.start").alias("window_start"),
            F.col("_win.end").alias("window_end"),
            val,
            F.col(ts_col),  # keeps EventTimeTimeout legal
        )
    )
    key_fields = [keyed.schema[k] for k in keys]
    out_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in key_fields]
        + [
            StructField("window_start", TimestampType(), True),
            StructField("window_end", TimestampType(), True),
            StructField("sketch", BinaryType(), True),
        ]
    )
    state_schema = StructType([StructField("sketch", BinaryType(), True)])

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        sk = None
        if state.exists:
            (blob,) = state.get
            if blob:
                sk = cls.deserialize(bytes(blob), **params)
        if sk is None:
            sk = cls(**params)
        for pdf in pdfs:
            if hashed:
                sk.update_hashed(pdf["_v"].to_numpy(dtype="int64").view(np.uint64))
            else:
                sk.update_batch(pdf["_v"].to_numpy(dtype="float64"))
        blob = sk.serialize()
        state.update((blob,))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(_epoch_ms(key[len(keys) + 1]), wm + 1))
        out = {name: [key[i]] for i, name in enumerate(keys)}
        out["window_start"] = [_key_ts_out(key[len(keys)], tz)]
        out["window_end"] = [_key_ts_out(key[len(keys) + 1], tz)]
        out["sketch"] = [blob]
        yield pd.DataFrame(out)

    return keyed.groupBy(*keys, "window_start", "window_end").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_tdigest_final(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    delta: float = 0.01,
    discrete: bool = False,
) -> DataFrame:
    """Window-close variant: each (keys × window) digest is emitted exactly
    ONCE, when the event-time watermark passes the window end — the append
    shape downstream sinks (Iceberg appends, Kafka) want, vs the per-trigger
    snapshots of ``streaming_tdigest``.

    Mechanics: rows accumulate into the per-group digest state; on every
    update the group's event-time timeout is (re)armed at window_end, so
    Spark calls the function one final time with no rows once the watermark
    crosses it — that call emits the finished digest and drops the state.
    Until then the function emits nothing.
    """
    from sketchlib.spark.shipping import ensure_on_workers

    ensure_on_workers(stream.sparkSession)
    tz = _session_tz(stream)
    win = F.window(F.col(ts_col), window)
    keyed = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("_win", win)
        .select(
            *keys,
            F.col("_win.start").alias("window_start"),
            F.col("_win.end").alias("window_end"),
            F.col(value_col).cast("double").alias("_v"),
            # the watermarked column must survive to the stateful operator
            # for EventTimeTimeout to be legal
            F.col(ts_col),
        )
    )
    key_fields = [keyed.schema[k] for k in keys]
    out_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in key_fields]
        + [
            StructField("window_start", TimestampType(), True),
            StructField("window_end", TimestampType(), True),
            StructField("digest", BinaryType(), True),
        ]
    )
    state_schema = StructType([StructField("digest", BinaryType(), True)])

    def update(key, pdfs, state: GroupState):
        window_end = key[len(keys) + 1]
        if state.hasTimedOut:
            blob = state.get[0] if state.exists else None
            state.remove()
            if blob:
                out = {name: [key[i]] for i, name in enumerate(keys)}
                out["window_start"] = [_key_ts_out(key[len(keys)], tz)]
                out["window_end"] = [_key_ts_out(window_end, tz)]
                out["digest"] = [bytes(blob)]
                yield pd.DataFrame(out)
            return
        d = MergingDigest(delta=delta, discrete=discrete)
        if state.exists:
            (blob,) = state.get
            if blob:
                d.merge_bytes(bytes(blob))
        for pdf in pdfs:
            d.update_batch(pdf["_v"].to_numpy(dtype="float64"))
        state.update((d.serialize(),))
        # fire once the watermark passes the window end (epoch millis from
        # the UTC-naive key — see _epoch_ms); a timeout may not be set behind
        # the current watermark, so clamp — the clamped case means the window
        # is already closed and fires on the next trigger
        target = _epoch_ms(window_end)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(target, wm + 1))
        return
        yield  # pragma: no cover — keeps this a generator

    return keyed.groupBy(*keys, "window_start", "window_end").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
