"""Temporal joins the reference's single-stream model has no analog for but
every event-sketch pipeline needs: a scalable as-of join.

``asof_join`` matches each left row to the latest right row with
``right_ts <= left_ts`` (or strictly ``<``) per key — the "most recent
fact before this event" primitive (market-data joins, last-touch
attribution, slowly-changing-dimension lookup).

Spark-first plan: NOT an inequality join (which Catalyst executes as a
broadcast-nested-loop or a cross-join-and-filter — O(|L|·|R|) per key and
a non-starter at 100 TB).  Instead both sides are union-tagged and sorted
once by (key, time): a single hash-partition shuffle on the key, then a
running ``last(right_payload, ignorenulls=True)`` window carries the most
recent right row forward onto every left row.  Cost is one shuffle +
one sort — the same as any groupBy on the key — and AQE's skew splitting
applies to hot keys.  DuckDB's native ``ASOF JOIN`` (and pandas
``merge_asof``) document the same semantics; the oracle uses the
window-SQL spelling to pin tie-breaking exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "range_join", "ts_epoch_seconds"]

def ts_epoch_seconds(df: DataFrame, col: str) -> F.Column:
    """Microsecond-exact epoch seconds (double) of a timestamp column,
    tz-INDEPENDENT for TIMESTAMP_NTZ: Spark refuses ``cast(ntz as double)``
    and the ``cast(ntz as timestamp)`` detour applies the session timezone
    (non-uniformly across DST boundaries), so decompose wall-clock fields
    instead — ``unix_date``·86400 + h·3600 + m·60 + fractional seconds, all
    codegen.  Double spacing at epoch~1.7e9 is ~0.24 us, so the mapping is
    injective and monotone: comparisons on the result agree exactly with
    microsecond timestamp comparisons."""
    dt = df.schema[col].dataType.typeName()
    if dt == "timestamp_ntz":
        return (
            F.unix_date(F.col(col).cast("date")) * F.lit(86400.0)
            + F.hour(F.col(col)) * F.lit(3600.0)
            + F.minute(F.col(col)) * F.lit(60.0)
            + F.expr(f"cast(extract(second from `{col}`) as double)")
        )
    return F.col(col).cast("double")


def _as_num(col: str, df: DataFrame) -> F.Column:
    if df.schema[col].dataType.typeName().startswith("timestamp"):
        return ts_epoch_seconds(df, col)
    return F.col(col).cast("double")




def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    *,
    allow_exact_matches: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row whose
    ``right_ts`` is <= (``allow_exact_matches``) or < that row's
    ``left_ts``, matching on key ``on``.  Left rows with no prior right row
    keep NULL payload (left-outer semantics).

    ``payload_cols``: right columns to carry (default: all except the key
    and ``right_ts``).  ``tiebreak_cols``: deterministic winner among right
    rows sharing the same ``right_ts`` — the row with the GREATEST
    tiebreak tuple wins (default: the payload columns themselves, so ties
    resolve to the lexicographically-largest payload; pass an id column
    for stable real-world use).

    One shuffle, no inequality join: union-tag both sides, sort within
    key partitions by (ts, side, tiebreak), running ``last(payload,
    ignorenulls=True)``.  Right rows at ts == left ts sort before the left
    row iff exact matches are allowed.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    if tiebreak_cols is None:
        tiebreak_cols = payload_cols

    # side flag orders right rows before the left row at equal ts when
    # exact matches count, after it when strict: last() then can't see them
    right_side, left_side = (0, 1) if allow_exact_matches else (1, 0)

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(right_side).alias("__side"),
        F.struct(*[F.col(c) for c in tiebreak_cols]).alias("__tie"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    u = l.unionByName(r.select(*keys, "__t", "__side", "__tie", "__payload"),
                      allowMissingColumns=True)

    if allow_exact_matches:
        # right(0) before left(1) at equal ts; among equal-ts right rows
        # ascending tiebreak so the running last() keeps the greatest
        order = [F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc()]
    else:
        order = [F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))

    out_cols = [c for c in left.columns]
    return (
        matched.filter(F.col("__side") == left_side)
        .select(
            *out_cols,
            *[F.col("__m").getField(c).alias(c) for c in payload_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_point: str,
    right_lo: str,
    right_hi: str,
    *,
    bucket_width: float | None = None,
    closed: str = "left",
    max_buckets: int | None = None,
) -> DataFrame:
    """Interval join: every left row matched to every right interval
    containing its point, per key — the attribution-window / validity-range
    primitive (``closed``: "left" = lo <= p < hi, "both" = lo <= p <= hi).

    Spark-first plan: an inequality join condition would make Catalyst pick
    BroadcastNestedLoopJoin — O(|L|·|R|) per key, a non-starter at 100 TB.
    Instead both sides are BUCKETIZED: each right interval explodes to the
    integer buckets of width ``bucket_width`` it covers (``sequence`` +
    ``explode``, pure codegen), each left point computes its single bucket,
    and the join becomes a hash EQUI-join on (key, bucket) + a codegen
    range filter.  A (row, interval) pair meets in exactly one bucket — the
    point's — so no dedup pass is needed.  Shuffle cost is one hash
    exchange of each side (right inflated by ~span/width); AQE skew
    splitting applies to hot keys.

    ``bucket_width`` defaults to the right side's mean span (one tiny JVM
    agg at plan build) — explode factor ~2.  ``max_buckets`` guards
    pathological intervals: exceeding it raises AT EXECUTION via
    ``raise_error`` (JVM-side, no silent truncation).

    Points/bounds may be numeric or timestamp; timestamps are compared on
    their tz-independent epoch value (cast to double).
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    keys = [on] if isinstance(on, str) else list(on)

    lo, hi = _as_num(right_lo, right), _as_num(right_hi, right)
    pt = _as_num(left_point, left)

    if bucket_width is None:
        row = right.select(F.avg(hi - lo).alias("w")).first()
        bucket_width = float(row["w"]) if row["w"] else 1.0
        if bucket_width <= 0:
            bucket_width = 1.0
    w = float(bucket_width)

    lob, hib = F.floor(lo / w).cast("long"), F.floor(hi / w).cast("long")
    n_buckets = hib - lob + F.lit(1)
    if max_buckets is not None:
        lob = F.when(
            n_buckets > max_buckets,
            F.raise_error(F.format_string(
                "range_join: interval spans more than %d buckets of width "
                "%s — widen bucket_width or cap the interval",
                F.lit(max_buckets), F.lit(str(w)))),
        ).otherwise(lob)
    r = right.select(
        "*", F.explode(F.sequence(lob, hib)).alias("__bucket"),
        lo.alias("__lo"), hi.alias("__hi"),
    )
    l = left.select("*", F.floor(pt / w).cast("long").alias("__bucket"),
                    pt.alias("__pt"))

    cond = [l[k] == r[k] for k in keys] + [l["__bucket"] == r["__bucket"]]
    upper = (l["__pt"] <= r["__hi"]) if closed == "both" else (l["__pt"] < r["__hi"])
    j = l.join(r, cond, "inner").where((l["__pt"] >= r["__lo"]) & upper)
    keep = [l[c] for c in left.columns] + [
        r[c] for c in right.columns if c not in (*keys, right_lo, right_hi)
    ]
    return j.select(*keep)
