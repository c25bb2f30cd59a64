"""Digest-driven range partitioning (plan.repartition_by_digest): balanced
equal-mass partitions from quantile cut points, each range id landing in its
OWN contiguous, ascending partition (murmur3-preimage remap), without
repartitionByRange's per-job sampling scan."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _skewed(spark, n=50_000):
    # deterministic skewed positive values: u^3 piles mass near 0
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_003)).cast("double")
         / F.lit(1_000_003.0))
    return spark.range(n).select(
        F.col("id"), (u * u * u * 1000.0).alias("v"))


def test_balanced_contiguous_ascending(spark):
    from sketchlib.spark.plan import repartition_by_digest

    df = _skewed(spark)
    n_parts = 16
    out = repartition_by_digest(df, "v", n_parts)
    per = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    )
    assert len(per) == n_parts
    ideal = 50_000 / n_parts
    for r in per:
        assert 0.6 * ideal <= r["cnt"] <= 1.4 * ideal, per
    # identity remap: ascending partition id == ascending value range,
    # ranges pairwise disjoint (this is what plain repartition(n, pid)
    # CANNOT give — murmur3 collisions would stack ranges)
    by_pid = sorted(per, key=lambda r: r["pid"])
    for a, b in zip(by_pid, by_pid[1:]):
        assert a["hi"] <= b["lo"]


def test_stored_digest_and_null_routing(spark):
    from sketchlib.spark.plan import digest_range_bounds, repartition_by_digest
    from sketchlib.spark.tdigest_ops import tdigest_aggregate

    df = _skewed(spark, 20_000)
    dig = bytes(
        tdigest_aggregate(
            df.withColumn("_g", F.lit(0)), ["_g"], "v").collect()[0]["digest"])
    # layout-invariant bounds: exact-mode digests are byte-identical under
    # any partitioning, so stored bounds are stable across clusters/runs —
    # the determinism repartitionByRange's sampling cannot give
    def exact_bounds(d):
        b = bytes(tdigest_aggregate(
            d.withColumn("_g", F.lit(0)), ["_g"], "v",
            delta=0.0).collect()[0]["digest"])
        return digest_range_bounds(b, 8)

    assert exact_bounds(df.repartition(3)) == exact_bounds(df.repartition(13))
    with_null = df.withColumn(
        "v", F.when(F.col("id") % 100 == 0, None).otherwise(F.col("v")))
    out = repartition_by_digest(with_null, "v", 8, digest=dig)
    null_pids = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("v").isNull()).select("pid").distinct().collect()
    )
    # NULLs sort first: all land in partition 0, like repartitionByRange
    assert [r["pid"] for r in null_pids] == [0]


def test_heavy_value_collapses_bounds(spark):
    from sketchlib.spark.plan import repartition_by_digest

    # 60% of rows share ONE value: range bounds cannot split it — it must
    # collapse cuts and own a partition, not crash or smear
    df = spark.range(10_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 6, 42.0)
        .otherwise(F.col("id").cast("double")).alias("v"),
    )
    out = repartition_by_digest(df, "v", 8, discrete=True)
    per = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("v") == 42.0).select("pid").distinct().collect()
    )
    assert len(per) == 1  # the heavy value lives in exactly one partition
    assert out.count() == 10_000


def test_searchsorted_path_matches_codegen_path(spark):
    from sketchlib.spark.plan import assign_range_partition

    df = _skewed(spark, 5_000)
    bounds = [i * 9.7 for i in range(1, 100)]  # 99 bounds -> Arrow path
    arrow = assign_range_partition(df, "v", bounds).collect()
    jvm = assign_range_partition(df, "v", bounds[:64]).collect()
    got = {r["id"]: r["_range_pid"] for r in arrow}
    for r in df.collect():
        import bisect
        assert got[r["id"]] == bisect.bisect_right(bounds, r["v"])
    # and the JVM codegen spelling agrees with bisect on its prefix
    got64 = {r["id"]: r["_range_pid"] for r in jvm}
    for r in df.collect():
        import bisect
        assert got64[r["id"]] == bisect.bisect_right(bounds[:64], r["v"])


def test_streaming_foreachbatch_alignment(spark, tmp_path):
    """The streaming-stable claim: with bounds from a STORED digest, every
    micro-batch's foreachBatch write is range-aligned with every other —
    no output file straddles a range bound, so files from different
    batches compact/prune together.  repartitionByRange here would
    re-sample each micro-batch and give drifting, straddling layouts."""
    import os

    import bisect

    from sketchlib.spark.plan import digest_range_bounds, repartition_by_digest
    from sketchlib.spark.tdigest_ops import tdigest_aggregate

    src = str(tmp_path / "src")
    os.makedirs(src)
    hist = _skewed(spark, 20_000)
    hist.write.parquet(src + "/seed")  # historical corpus -> stored digest
    dig = bytes(tdigest_aggregate(
        hist.withColumn("_g", F.lit(0)), ["_g"], "v").collect()[0]["digest"])
    bounds = digest_range_bounds(dig, 8)

    stream_dir = str(tmp_path / "stream_in")
    os.makedirs(stream_dir)
    for i in range(3):  # 3 single-file chunks -> 3 micro-batches
        pdf = (_skewed(spark, 2_000)
               .withColumn("id", F.col("id") + i * 100_000).toPandas())
        pdf.to_parquet(f"{stream_dir}/f{i}.parquet")

    out_dir = str(tmp_path / "out")
    static = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(static.schema).option(
        "maxFilesPerTrigger", "1").parquet(stream_dir)

    def sink(batch, _bid):
        repartition_by_digest(batch, "v", 8, digest=dig).write.mode(
            "append").parquet(out_dir)

    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "ckpt")).start()
    q.processAllAvailable()
    q.stop()

    per_file = (
        spark.read.parquet(out_dir)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    )
    assert len(per_file) >= 3 * 4  # several files per micro-batch
    for r in per_file:  # no file straddles a stored bound
        assert bisect.bisect_right(bounds, r["lo"]) == \
            bisect.bisect_right(bounds, r["hi"])
