"""jobs/drift_monitor.py: end-to-end — identical digest tables report zero
drift (exit 0); a shifted slice and an appeared key are flagged (exit 2),
and the KS/quantile-delta columns carry the evidence."""

import json
import sys

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

pytestmark = pytest.mark.spark


def _digests(spark, src, out, where=None, scale=1.0):
    from sketchlib.spark.tdigest_ops import tdigest_aggregate

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    if where is not None:
        docs = docs.filter(where)
    docs = docs.withColumn(
        "v", (F.length("text").cast("double") * F.lit(scale)))
    tdigest_aggregate(docs, ["lang"], "v", discrete=True).write.mode(
        "overwrite").parquet(out)


def _run(monkeypatch, job, argv, capture):
    monkeypatch.setattr(sys, "argv", ["job"] + argv)
    return job.main()


def test_drift_monitor_end_to_end(spark, tmp_path, monkeypatch):
    sys.path.insert(0, "jobs")
    import drift_monitor as job

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    capture = []
    monkeypatch.setattr("builtins.print", lambda s: capture.append(s))

    base = str(tmp_path / "base")
    _digests(spark, SF_SMALL, base)

    # -- no drift: a table vs itself ------------------------------------------
    out0 = str(tmp_path / "report0")
    rc = _run(monkeypatch, job, [
        "--left", base, "--right", base, "--key-cols", "lang",
        "--discrete", "--output", out0], capture)
    rep = json.loads(capture[-1])
    assert rc == 0
    assert rep["n_drifted"] == 0 and rep["max_ks"] == 0.0
    r0 = spark.read.parquet(out0)
    assert r0.filter("ks != 0.0 OR p5_abs_delta != 0.0").count() == 0

    # -- drift: one lang's lengths tripled, one lang dropped -------------------
    shifted = str(tmp_path / "shifted")
    from sketchlib.spark.tdigest_ops import tdigest_aggregate

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    hot, gone = langs[0], langs[-1]
    docs2 = docs.filter(F.col("lang") != gone).withColumn(
        "v",
        F.when(F.col("lang") == hot,
               F.length("text").cast("double") * 3.0)
        .otherwise(F.length("text").cast("double")),
    )
    tdigest_aggregate(docs2, ["lang"], "v", discrete=True).write.mode(
        "overwrite").parquet(shifted)

    out1 = str(tmp_path / "report1")
    rc = _run(monkeypatch, job, [
        "--left", base, "--right", shifted, "--key-cols", "lang",
        "--discrete", "--ks-threshold", "0.1", "--output", out1], capture)
    rep = json.loads(capture[-1])
    assert rc == 2
    assert rep["n_keys"] == len(langs)
    assert rep["gone_keys"] == 1 and rep["new_keys"] == 0
    rows = {r["lang"]: r for r in spark.read.parquet(out1).collect()}
    # tripling every value shifts the whole CDF: KS is large and the p95
    # delta is positive; untouched langs stay exactly at zero
    assert rows[hot]["drifted"] and rows[hot]["ks"] > 0.5
    assert rows[hot]["p95_abs_delta"] > 0
    assert rows[gone]["drifted"] and rows[gone]["ks"] is None
    calm = [l for l in langs if l not in (hot, gone)]
    assert all(not rows[l]["drifted"] and rows[l]["ks"] == 0.0 for l in calm)
    assert rep["n_drifted"] == 2
