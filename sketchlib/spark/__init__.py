from sketchlib.spark.tdigest_ops import (  # noqa: F401
    tdigest_aggregate,
    tdigest_partials,
    tdigest_merge,
    tdigest_quantiles_udf,
    tdigest_cdf_udf,
    tdigest_size_udf,
    tdigest_count_udf,
    tdigest_centroids_udf,
    tdigest_compress_udf,
)
