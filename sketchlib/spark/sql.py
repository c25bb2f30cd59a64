"""SQL surface: register the sketch functions so plain ``spark.sql`` works
(SURVEY.md §2.9 "UDF/UDAF surface").

    from sketchlib.spark.sql import register_sql_functions
    register_sql_functions(spark)
    spark.sql('''
        SELECT lang,
               tdigest_quantile(tdigest_agg(CAST(n_chars AS DOUBLE)), 0.99) AS p99
        FROM docs GROUP BY lang
    ''')

``tdigest_agg`` here is a pandas GROUPED_AGG UDF — convenient for ad-hoc
SQL, but Catalyst gives GROUPED_AGG UDFs **no partial aggregation**: every
group's rows shuffle to one reducer.  For production scale use the explicit
two-phase plan (``sketchlib.spark.tdigest_ops.tdigest_aggregate``); this
module is the interactive/BI convenience layer over the same wire format,
so digests built either way are interchangeable (``tdigest_merge_agg``
merges stored digest columns by byte concat).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType, IntegerType

from sketchlib.tdigest.core import (
    MergingDigest,
    bytes_to_centroids,
    cdf_of_centroids,
    centroids_to_bytes,
    merge_centroid_arrays,
    quantiles_of_centroids,
)


def register_sql_functions(spark: SparkSession, delta: float = 0.01) -> None:
    """Idempotent registration of the sketch SQL surface (t-digest family;
    sibling-sketch query functions are driven through their own modules)."""
    from sketchlib.spark.shipping import ensure_on_workers

    ensure_on_workers(spark)

    @pandas_udf(BinaryType())
    def tdigest_agg(v: pd.Series) -> bytes:
        d = MergingDigest(delta=delta)
        d.update_batch(v.to_numpy(dtype="float64", na_value=np.nan))
        d.compress()
        return d.serialize()

    @pandas_udf(BinaryType())
    def tdigest_merge_agg(blobs: pd.Series) -> bytes:
        d = MergingDigest.deserialize(
            b"".join(bytes(b) for b in blobs if b is not None), delta=delta
        )
        d.compress()
        return d.serialize()

    @pandas_udf(DoubleType())
    def tdigest_quantile(dig: pd.Series, p: pd.Series) -> pd.Series:
        out = []
        for b, pp in zip(dig, p):
            if b is None or len(b) == 0:
                out.append(float("nan"))
            else:
                m, n = bytes_to_centroids(bytes(b))
                out.append(float(quantiles_of_centroids(m, n, [float(pp)])[0]))
        return pd.Series(out)

    @pandas_udf(DoubleType())
    def tdigest_cdf(dig: pd.Series, q: pd.Series) -> pd.Series:
        out = []
        for b, qq in zip(dig, q):
            if b is None or len(b) == 0:
                out.append(float("nan"))
            else:
                m, n = bytes_to_centroids(bytes(b))
                out.append(float(cdf_of_centroids(m, n, [float(qq)])[0]))
        return pd.Series(out)

    @pandas_udf(IntegerType())
    def tdigest_size(dig: pd.Series) -> pd.Series:
        return pd.Series([0 if b is None else len(b) // 16 for b in dig],
                         dtype="int32")

    @pandas_udf(DoubleType())
    def tdigest_count(dig: pd.Series) -> pd.Series:
        out = []
        for b in dig:
            if b is None or len(b) == 0:
                out.append(0.0)
            else:
                _, n = bytes_to_centroids(bytes(b))
                out.append(float(n.sum()))
        return pd.Series(out)

    spark.udf.register("tdigest_agg", tdigest_agg)
    spark.udf.register("tdigest_merge_agg", tdigest_merge_agg)
    spark.udf.register("tdigest_quantile", tdigest_quantile)
    spark.udf.register("tdigest_cdf", tdigest_cdf)
    spark.udf.register("tdigest_size", tdigest_size)
    spark.udf.register("tdigest_count", tdigest_count)
