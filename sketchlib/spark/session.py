"""SparkSession factory with the configs this library assumes.

Scale notes (designed for a 1000-executor cluster over ~100 TB; tested on
local[N]):

- AQE on: runtime coalescing of the post-aggregation shuffles (sketch rows
  are tiny — one ≤40 KB row per partition×key — so AQE collapses them).
- Arrow on, large batches: every sketch ingest path is a vectorized
  pandas/Arrow UDF; bigger batches amortize the JVM↔Python hop.
- shuffle.partitions is a default for local runs; at cluster scale set it
  to ~2-3× total cores or rely on AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "sketchlib",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SKETCHLIB_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
