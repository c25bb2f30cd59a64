"""Headline queries + their DuckDB oracle SQL — the driver correctness gate.

Each ``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame``; ``ORACLES[name]``
is ANSI SQL DuckDB runs over the same parquet (views: region nation customer
supplier part orders lineitem events documents embeddings).  Column names and
types are aligned on both sides because the driver hashes values after
sorting columns by name.

Exactness strategy (SURVEY.md §5.9): the t-digest pipeline runs in *exact
mode* for gated queries — ``delta=0.0`` ("never merge", legal per reference
src/tdigest.ml, test:125) or ``discrete=True`` — so the full Spark path
(mapInPandas partials → shuffle → byte-concat merge → query UDF) is lossless
and its answers are bit-identical to SQL:

* merging-mode interpolated quantiles ≡ piecewise-linear interpolation at
  centroid midpoints (mean_cumn) — expressed with window functions;
* discrete-mode quantiles ≡ weighted Nearest Rank (min v with cum ≥ N·p);
* discrete-mode CDF ≡ count(x ≤ q)/count(*).

Compressed-mode (delta=0.01) accuracy is validated in pytest with tolerance
(rank error < delta) and exposed to the driver as a rows-only query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sketchlib.spark.tdigest_ops import (
    tdigest_aggregate,
    tdigest_cdf_udf,
    tdigest_count_udf,
    tdigest_quantiles_udf,
    tdigest_size_udf,
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from sketchlib.spark.shipping import ensure_on_workers

    ensure_on_workers(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Oracle SQL fragments
# ---------------------------------------------------------------------------


def _interp_quantile_sql(table: str, key: str, val: str, ps: dict[str, float]) -> str:
    """Exact SQL for merging-mode t-digest quantiles (midpoint interpolation).

    Replicates quantiles_of_centroids() bit-for-bit: identical expression
    tree in float64 (lerp ``pv + (h-pmc)*(v-pv)/(mc-pmc)``), identical
    clamping and Equal-hit semantics.
    """
    cases = []
    for alias, p in ps.items():
        cases.append(
            f"""  CASE WHEN max(total) * {p} <= min(mc) THEN min(v)
       WHEN max(total) * {p} >= max(mc) THEN max(v)
       ELSE max(CASE WHEN pmc < total * {p} AND total * {p} <= mc THEN
                  CASE WHEN total * {p} = mc THEN v
                       ELSE pv + (total * {p} - pmc) * (v - pv) / (mc - pmc) END
                END)
  END AS {alias}"""
        )
    sel = ",\n".join(cases)
    return f"""
WITH g AS (
  SELECT {key} AS k, CAST({val} AS DOUBLE) AS v, CAST(count(*) AS DOUBLE) AS c
  FROM {table}
  WHERE {val} IS NOT NULL
  GROUP BY {key}, {val}
), s AS (
  SELECT k, v, c,
         sum(c) OVER (PARTITION BY k ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY k) AS total
  FROM g
), m AS (
  SELECT k, v, cum - c/2 AS mc,
         lag(v) OVER (PARTITION BY k ORDER BY v) AS pv,
         lag(cum - c/2) OVER (PARTITION BY k ORDER BY v) AS pmc,
         total
  FROM s
)
SELECT k AS {key},
{sel}
FROM m
GROUP BY k
"""


def _nearest_rank_sql(table: str, key: str, val: str, ps: dict[str, float]) -> str:
    """Exact SQL for discrete-mode t-digest quantiles: weighted Nearest Rank,
    ``min v with cumulative weight ≥ N·p`` (reference percentile Discrete
    branch, src/tdigest.ml:454-455)."""
    sel = ",\n".join(
        f"  min(v) FILTER (WHERE cum >= total * {p}) AS {alias}"
        for alias, p in ps.items()
    )
    return f"""
WITH g AS (
  SELECT {key} AS k, CAST({val} AS DOUBLE) AS v, CAST(count(*) AS DOUBLE) AS c
  FROM {table}
  WHERE {val} IS NOT NULL
  GROUP BY {key}, {val}
), s AS (
  SELECT k, v,
         sum(c) OVER (PARTITION BY k ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY k) AS total
  FROM g
)
SELECT k AS {key},
{sel}
FROM s
GROUP BY k
"""


# ---------------------------------------------------------------------------
# Query implementations
# ---------------------------------------------------------------------------


def _explode_quantiles(digests: DataFrame, key: str, ps: dict[str, float],
                       discrete: bool) -> DataFrame:
    q = tdigest_quantiles_udf(list(ps.values()), discrete=discrete)
    out = digests.withColumn("_qs", q("digest"))
    for i, alias in enumerate(ps.keys()):
        out = out.withColumn(alias, F.col("_qs")[i])
    return out.select(key, *ps.keys())


PS_FLAGSHIP = {"q50": 0.5, "q95": 0.95, "q99": 0.99}
PS_DISCRETE = {"q25": 0.25, "q50": 0.5, "q75": 0.75, "q95": 0.95}


def q_td_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: p50/p95/p99 of text length per lang — exact-mode t-digest
    through the full distributed plan."""
    docs = load(spark, sf_dir, "documents")
    dig = tdigest_aggregate(docs, ["lang"], "n_chars", delta=0.0)
    return _explode_quantiles(dig, "lang", PS_FLAGSHIP, discrete=False)


def q_td_discrete_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dig = tdigest_aggregate(docs, ["lang"], "n_chars", discrete=True)
    return _explode_quantiles(dig, "lang", PS_DISCRETE, discrete=True)


def q_td_cdf_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-mode CDF (p_rank) of n_chars at fixed thresholds."""
    docs = load(spark, sf_dir, "documents")
    dig = tdigest_aggregate(docs, ["lang"], "n_chars", discrete=True)
    cdf = tdigest_cdf_udf([200.0, 500.0, 1000.0], discrete=True)
    out = dig.withColumn("_c", cdf("digest"))
    return out.select(
        "lang",
        F.col("_c")[0].alias("cdf_200"),
        F.col("_c")[1].alias("cdf_500"),
        F.col("_c")[2].alias("cdf_1000"),
    )


def q_td_digest_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest introspection (reference info/to_string): centroid count ==
    distinct values in exact mode, total weight == row count, serialized
    size == 16 B/centroid."""
    docs = load(spark, sf_dir, "documents")
    dig = tdigest_aggregate(docs, ["lang"], "n_chars", delta=0.0)
    return dig.select(
        "lang",
        tdigest_size_udf("digest").cast("long").alias("n_centroids"),
        tdigest_count_udf("digest").alias("total_weight"),
        F.octet_length("digest").cast("long").alias("digest_bytes"),
    )


def q_td_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete quantiles of a continuous double column (event value)."""
    ev = load(spark, sf_dir, "events")
    dig = tdigest_aggregate(ev, ["event_type"], "value", discrete=True)
    return _explode_quantiles(dig, "event_type", PS_DISCRETE, discrete=True)


def q_td_lineitem_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merging-mode interpolated quantiles over TPC-H lineitem prices."""
    li = load(spark, sf_dir, "lineitem")
    dig = tdigest_aggregate(li, ["l_returnflag"], "l_extendedprice", delta=0.0)
    return _explode_quantiles(dig, "l_returnflag", PS_FLAGSHIP, discrete=False)


def q_td_compressed_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production mode (delta=0.01, compressed ≤2500 centroids): approximate
    quantiles — no exact SQL oracle (validated in pytest within rank-error
    bound); driver records a rows-only check."""
    docs = load(spark, sf_dir, "documents")
    dig = tdigest_aggregate(docs, ["lang"], "n_chars", delta=0.01)
    return _explode_quantiles(dig, "lang", PS_FLAGSHIP, discrete=False)


# ---------------------------------------------------------------------------
# Sibling sketches (HLL / CMS / Bloom / KLL)
# ---------------------------------------------------------------------------


def q_bloom_membership_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-source Bloom filter over doc_ids (distributed two-phase),
    broadcast the filters, and probe every doc_id — zero false negatives
    means the matched count equals the row count exactly."""
    import pandas as pd

    from sketchlib.bloom import Bloom
    from sketchlib.spark.sketch_ops import sketch_aggregate

    docs = load(spark, sf_dir, "documents")
    params = {"expected_n": max(docs.count(), 1000), "fpr": 0.01}
    filters = {
        r["source"]: bytes(r["sketch"])
        for r in sketch_aggregate(docs, ["source"], "doc_id", "bloom", params).collect()
    }
    bc = spark.sparkContext.broadcast(filters)

    probe = docs.select("source", F.xxhash64("doc_id").alias("h"))
    schema = "source string, matched long, total long"

    def check(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for src, idx in pdf.groupby("source", sort=False).indices.items():
                b = Bloom.deserialize(bc.value[src])
                hits = b.contains_hashed(
                    pdf["h"].to_numpy(dtype="int64")[idx].view(np.uint64)
                )
                rows.append((src, int(hits.sum()), len(idx)))
            yield pd.DataFrame(rows, columns=["source", "matched", "total"])

    per_batch = probe.mapInPandas(check, schema=schema)
    return per_batch.groupBy("source").agg(
        F.sum("matched").alias("n_members"), F.sum("total").alias("n_docs")
    )


def q_cms_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global count-min over the source column; point-query each distinct
    source.  With w≫#keys the min over 5 rows is collision-free, so the
    estimates equal the exact counts (CMS never undercounts)."""
    import numpy as np

    from sketchlib.cms import CMS
    from sketchlib.spark.sketch_ops import sketch_aggregate

    docs = load(spark, sf_dir, "documents")
    blob = bytes(
        sketch_aggregate(docs, [], "source", "cms", {"width": 16384, "depth": 5})
        .collect()[0]["sketch"]
    )
    cms = CMS.deserialize(blob)
    keys = (
        docs.select("source", F.xxhash64("source").alias("h")).distinct().collect()
    )
    est = cms.query_hashed(np.array([r["h"] for r in keys], dtype=np.int64).view(np.uint64))
    return spark.createDataFrame(
        [(r["source"], int(e)) for r, e in zip(keys, est)],
        "source string, est_count long",
    )


def q_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct user_id per event_type — approximate estimate, no SQL
    oracle (tolerance checked in tests/test_spark_sketches.py)."""
    from sketchlib.hll import HLL
    from sketchlib.spark.sketch_ops import sketch_aggregate

    ev = load(spark, sf_dir, "events")
    sk = sketch_aggregate(ev, ["event_type"], "user_id", "hll", {"p": 14})

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def est(s):
        import pandas as pd

        return pd.Series([HLL.deserialize(bytes(b)).estimate() for b in s])

    return sk.select("event_type", est("sketch").alias("approx_users"))


def q_kll_nearest_rank_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL in oracle mode (k large enough that no compaction triggers at
    test scale): weighted nearest-rank quantiles, exactly SQL-checkable."""
    from sketchlib.kll import KLL
    from sketchlib.spark.sketch_ops import sketch_aggregate

    docs = load(spark, sf_dir, "documents")
    sk = sketch_aggregate(docs, ["lang"], "n_chars", "kll", {"k": 32768})

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    ps = list(PS_DISCRETE.values())

    @pandas_udf(ArrayType(DoubleType()))
    def quant(s):
        import pandas as pd

        return pd.Series([KLL.deserialize(bytes(b)).quantile(ps).tolist() for b in s])

    out = sk.withColumn("_q", quant("sketch"))
    for i, alias in enumerate(PS_DISCRETE):
        out = out.withColumn(alias, F.col("_q")[i])
    return out.select("lang", *PS_DISCRETE.keys())


QUERIES = {
    "td_quantiles_by_lang": q_td_quantiles_by_lang,
    "td_discrete_quantiles_by_lang": q_td_discrete_quantiles_by_lang,
    "td_cdf_by_lang": q_td_cdf_by_lang,
    "td_digest_stats_by_lang": q_td_digest_stats_by_lang,
    "td_events_by_type": q_td_events_by_type,
    "td_lineitem_price": q_td_lineitem_price,
    "td_compressed_by_lang": q_td_compressed_by_lang,
    "bloom_membership_by_source": q_bloom_membership_by_source,
    "cms_source_counts": q_cms_source_counts,
    "hll_users_by_type": q_hll_users_by_type,
    "kll_nearest_rank_by_lang": q_kll_nearest_rank_by_lang,
}

ORACLES = {
    "td_quantiles_by_lang": _interp_quantile_sql("documents", "lang", "n_chars", PS_FLAGSHIP),
    "td_discrete_quantiles_by_lang": _nearest_rank_sql(
        "documents", "lang", "n_chars", PS_DISCRETE
    ),
    "td_cdf_by_lang": """
SELECT lang,
  CAST(count(*) FILTER (WHERE n_chars <= 200) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cdf_200,
  CAST(count(*) FILTER (WHERE n_chars <= 500) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cdf_500,
  CAST(count(*) FILTER (WHERE n_chars <= 1000) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cdf_1000
FROM documents GROUP BY lang
""",
    "td_digest_stats_by_lang": """
SELECT lang,
  count(DISTINCT n_chars) AS n_centroids,
  CAST(count(*) AS DOUBLE) AS total_weight,
  16 * count(DISTINCT n_chars) AS digest_bytes
FROM documents GROUP BY lang
""",
    "td_events_by_type": _nearest_rank_sql("events", "event_type", "value", PS_DISCRETE),
    "td_lineitem_price": _interp_quantile_sql(
        "lineitem", "l_returnflag", "l_extendedprice", PS_FLAGSHIP
    ),
    # td_compressed_by_lang: intentionally no oracle (approximate estimate;
    # bounded-error check lives in tests/test_spark_agg.py)
    "bloom_membership_by_source": """
SELECT source, count(*) AS n_members, count(*) AS n_docs
FROM documents GROUP BY source
""",
    "cms_source_counts": """
SELECT source, count(*) AS est_count FROM documents GROUP BY source
""",
    # hll_users_by_type: no oracle (approximate; tolerance in tests)
    "kll_nearest_rank_by_lang": _nearest_rank_sql(
        "documents", "lang", "n_chars", PS_DISCRETE
    ),
}
