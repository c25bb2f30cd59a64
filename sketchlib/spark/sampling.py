"""Deterministic hash-based sampling for training-data pipelines.

``df.sample()`` is seeded per-partition, so its output changes whenever the
input repartitions — useless for reproducible corpus curation.  These
operators derive keep/drop from a content hash of a stable id instead:
the same row is kept or dropped forever, on any cluster layout, any input
order, and any engine that can compute md5 (the DuckDB oracle reproduces
the sample bit-for-bit).

Scale: pure built-in expressions (md5/conv/pmod) — a codegen'd filter on
the scan with NO shuffle and no Python; sampling 100 TB costs one pass.
Stratified rates compose with everything downstream because membership is
a pure function of (id, rate): lowering a stratum's rate yields a strict
subset of the previous sample (the kept set at rate r is
{hash bucket < r·B}, monotone in r) — so curriculum re-samples never churn
previously-selected documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_bucket", "stratified_hash_sample",
           "weighted_priority_sample", "cap_per_key"]

BUCKETS = 10_000  # rate resolution 1e-4


def hash_bucket(id_col: Column, buckets: int = BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from a stable id: first 8 hex chars
    of md5 of the id's decimal string — engine-portable (DuckDB:
    ``('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % buckets``)."""
    h32 = F.conv(
        F.substring(F.md5(F.encode(id_col.cast("string"), "UTF-8")), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h32, F.lit(buckets))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Keep each row iff its hash bucket < rate(stratum)·buckets.

    ``rates`` maps stratum value -> keep fraction (resolution 1/buckets);
    unlisted strata use ``default_rate``.  The rate map is folded into a
    literal CASE expression (strata maps are small — languages, sources —
    and known up front), so the whole operator is one codegen'd filter.
    """
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    thresh = F.floor(rate * buckets).cast("long")
    return df.filter(hash_bucket(F.col(id_col), buckets) < thresh)


def weighted_priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row draws priority u^(1/w) — spelled ln(u)/w — with u a
    DETERMINISTIC uniform from the row id's md5 (60 bits), and the top-k
    priorities win.  P[row in sample] is proportional-to-size for the
    rows' weights, yet membership is a pure function of (id, weight, k):
    reproducible across partition layouts, cluster sizes, and engines.

    Scale: the priority is one codegen expression; global top-k compiles
    to TakeOrderedAndProject (per-partition partial top-k, only k rows per
    partition reach the driver-side merge), and per-stratum top-k
    (``by=``) is a window rank that Spark rewrites with a partial
    WindowGroupLimit below the shuffle.  Rows with weight <= 0 or NULL are
    excluded (they have zero inclusion probability).
    """
    u = (
        F.conv(
            F.substring(F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")), 1, 15),
            16, 10,
        ).cast("long").cast("double") + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    scored = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "_priority", F.log(u) / w
    )
    if by is None:
        out = scored.orderBy(F.col("_priority").desc(), F.col(id_col)).limit(k)
    else:
        from pyspark.sql import Window

        rank = F.row_number().over(
            Window.partitionBy(by).orderBy(F.col("_priority").desc(), F.col(id_col))
        )
        out = scored.withColumn("_rk", rank).filter(F.col("_rk") <= k).drop("_rk")
    return out.drop("_priority")


def cap_per_key(
    df: DataFrame,
    key_cols: str | list[str],
    k: int,
    id_col: str = "doc_id",
    keep_rank: bool = False,
) -> DataFrame:
    """Per-key quota sampling — "keep at most ``k`` documents per domain /
    host / source", the standard anti-monoculture cap in web-corpus
    curation (oversampled hosts would otherwise dominate the training
    mix).  Which k survive is DETERMINISTIC: rows rank by md5 of the
    stable id (tie-break id), so the kept set is a pure function of
    (key, id, k) — reproducible across partition layouts, cluster sizes,
    and engines (the DuckDB oracle reproduces it bit-for-bit), and
    monotone in k: raising the cap only ADDS rows, so curriculum
    re-curation never churns previously-kept documents.

    Scale: ONE hash shuffle on the key; the row_number <= k filter is
    rewritten by Spark into a partial WindowGroupLimit BELOW the exchange
    (plan-audited in pytest), so each map task forwards at most k rows per
    key it sees — the shuffle carries O(k · keys), never the corpus.
    ``keep_rank=True`` retains the 1-based rank column ``_cap_rank``.
    """
    from pyspark.sql import Window

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    rank = F.row_number().over(
        Window.partitionBy(*keys).orderBy(order.asc(), F.col(id_col).asc())
    )
    out = df.withColumn("_cap_rank", rank).filter(F.col("_cap_rank") <= k)
    return out if keep_rank else out.drop("_cap_rank")
