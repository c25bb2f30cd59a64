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

__all__ = ["asof_join"]


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
