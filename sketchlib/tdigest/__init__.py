from sketchlib.tdigest.core import (  # noqa: F401
    TDigest,
    MergingDigest,
    centroids_to_bytes,
    bytes_to_centroids,
    merge_centroid_arrays,
    compress_centroids,
    quantiles_of_centroids,
    cdf_of_centroids,
)
