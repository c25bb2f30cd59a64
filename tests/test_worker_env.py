"""Python-worker glibc malloc tunables (sketchlib.spark.session docstring):
the Arrow kernels allocate MB-scale numpy temporaries per batch; without
MALLOC_MMAP_MAX_=0 glibc serves them with mmap and munmaps on free, so
every batch re-faults freshly zeroed pages — measured 2.1x on the decontam
probe stage, and the page-allocator contention behind the 8->32-core
scaling ceiling of allocation-heavy kernels.  These tests pin that the
session factories set the tunables and that they actually REACH the
worker processes (env must be present at worker start for glibc to read
it; fork from the daemon preserves it)."""

import pytest

pytestmark = pytest.mark.spark


def test_malloc_tunables_reach_python_workers(spark):
    import pyarrow as pa

    def probe(batches):
        import os

        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [pa.array([os.environ.get("MALLOC_MMAP_MAX_", "MISSING")]),
                 pa.array([os.environ.get("MALLOC_TRIM_THRESHOLD_",
                                          "MISSING")])],
                names=["mmap", "trim"])

    rows = spark.range(4).repartition(2).mapInArrow(
        probe, "mmap string, trim string").collect()
    assert rows and all(r["mmap"] == "0" and r["trim"] == "-1" for r in rows)


def test_session_factories_set_malloc_tunables():
    """Both factories (local-mode get_spark and the spark-submit
    job_session) must carry the worker tunables in their builder configs —
    checked without launching a second JVM (getOrCreate would just hand
    back the test session and mask a regression)."""
    import inspect

    from sketchlib.spark import session

    for fn in (session.get_spark, session.job_session):
        src = inspect.getsource(fn)
        assert "spark.executorEnv.MALLOC_MMAP_MAX_" in src, fn.__name__
        assert "spark.executorEnv.MALLOC_TRIM_THRESHOLD_" in src, fn.__name__
