"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Also reports sketch-build throughput (docs/sec for the production-mode
flagship) as extra fields.  ``--scaling`` mode runs the same build at two
parallelism levels (local[8] vs local[32]) and writes BENCH/BASELINE.md with
the scaling efficiency (the sandbox stand-in for N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _sf_of(path: str) -> float:
    m = re.search(r"sf([\d.]+)", path)
    return float(m.group(1)) if m else -1.0


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as e

    times: dict[str, float] = {}
    for name, fn in e.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times[name] = round(time.time() - t0, 3)
    return times


def flagship_throughput(spark, sf_dir: str) -> tuple[float, int]:
    """Production-mode sketch build: delta=0.01 digests of n_chars by lang.
    Returns (seconds, docs)."""
    from sketchlib.spark.tdigest_ops import tdigest_aggregate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    t0 = time.time()
    tdigest_aggregate(docs, ["lang"], "n_chars", delta=0.01).collect()
    return time.time() - t0, n


def main() -> None:
    from sketchlib.spark.session import get_spark

    spark = get_spark("sketchlib-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/Python-worker pool so per-query times measure the plan
    spark.range(1000).selectExpr("sum(id)").collect()

    t_all0 = time.time()
    times = run_queries(spark, SF_DIR)
    build_sec, n_docs = flagship_throughput(spark, SF_DIR)
    times["flagship_build_d001"] = round(build_sec, 3)
    total = round(time.time() - t_all0, 3)
    out = {
        "metric": "sketchlib_headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_of(SF_DIR),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
