"""jobs/profile_corpus.py: end-to-end — long + wide outputs parse into the
right sketch kinds and the digest matches the dedicated build byte-wise."""

import json
import sys

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

pytestmark = pytest.mark.spark


def test_profile_job_end_to_end(spark, tmp_path, monkeypatch):
    sys.path.insert(0, "jobs")
    import profile_corpus as job

    src = str(tmp_path / "in")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang", "source", "text")
    # the default specs profile url — documents has source instead
    docs.withColumnRenamed("source", "url").write.parquet(src)

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    capture = []
    monkeypatch.setattr("builtins.print", lambda s: capture.append(s))

    out_long = str(tmp_path / "long")
    monkeypatch.setattr(sys, "argv", [
        "job", "--input", src, "--output", out_long])
    job.main()
    rep = json.loads(capture[-1])
    langs = [r["lang"] for r in spark.read.parquet(out_long)
             .select("lang").distinct().collect()]
    assert rep["groups_x_families"] == len(langs) * 4

    # digest rows equal the dedicated single-family build byte-wise
    from sketchlib.spark.tdigest_ops import tdigest_aggregate

    want = {r["lang"]: bytes(r["digest"]) for r in tdigest_aggregate(
        spark.read.parquet(src).withColumn(
            "__n_chars", F.length("text").cast("double")),
        ["lang"], "__n_chars", discrete=True).collect()}
    got = {r["lang"]: bytes(r["sketch"])
           for r in spark.read.parquet(out_long)
           .filter("sk_name = 'td_len'").collect()}
    assert got == want

    # wide mode: one binary column per family
    out_wide = str(tmp_path / "wide")
    monkeypatch.setattr(sys, "argv", [
        "job", "--input", src, "--output", out_wide, "--wide"])
    job.main()
    wide = spark.read.parquet(out_wide)
    assert {"lang", "td_len", "hll_url", "cms_url", "mg_url"} <= set(wide.columns)
    assert {r["lang"]: bytes(r["td_len"]) for r in wide.collect()} == want
