"""Deterministic synthetic clickstream events for the join benchmarks.

Same chunking contract as gen_pages: chunk content depends only on the
absolute row ids, so any parallel chunking yields the identical table.
Schema mirrors the driver's ``events`` table where the round-3 temporal
joins are gated (event_id, ts, user_id, event_type, value): ~5% purchases,
user activity Zipf-skewed (hot users stress the per-key fan-out of the
bucketized range join exactly like hot hosts do at web scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BASE_EPOCH = np.datetime64("2024-03-01T00:00:00", "us")
SPAN_S = 30 * 86400
TYPES = np.array(["view", "click", "purchase"])

SCHEMA = pa.schema(
    [
        pa.field("event_id", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("user_id", pa.int64()),
        pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()),
    ]
)


def _zipf_users(rng: np.random.Generator, n: int, n_users: int) -> np.ndarray:
    ranks = np.arange(1, n_users + 1, dtype=np.float64)
    p = ranks**-1.1
    p /= p.sum()
    return rng.choice(n_users, size=n, p=p)


def gen_chunk(
    row_start: int, n: int, seed: int = 43, n_users: int = 200_000
) -> pd.DataFrame:
    rng = np.random.default_rng(np.random.SeedSequence([seed, row_start, n]))
    ids = np.arange(row_start, row_start + n, dtype=np.int64)
    users = _zipf_users(rng, n, n_users).astype(np.int64)
    offs_us = rng.integers(0, SPAN_S * 1_000_000, size=n, dtype=np.int64)
    ts = BASE_EPOCH + offs_us.astype("timedelta64[us]")
    r = rng.random(n)
    kind = np.where(r < 0.05, 2, np.where(r < 0.55, 0, 1))
    return pd.DataFrame(
        {
            "event_id": ids,
            # us-unit datetimes: pandas defaults to ns, which Spark's parquet
            # reader rejects (PARQUET_TYPE_ILLEGAL)
            "ts": pd.Series(ts).astype("datetime64[us]"),
            "user_id": users,
            "event_type": TYPES[kind],
            "value": np.round(rng.lognormal(3.0, 1.0, n), 2),
        }
    )
