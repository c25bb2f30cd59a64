"""jobs/sample_corpus.py: mixture-rate solver + end-to-end determinism of
the sampled output."""

import sys

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_MED

pytestmark = pytest.mark.spark


def test_solve_rates_quota_and_clamp():
    sys.path.insert(0, "jobs")
    from sample_corpus import solve_rates

    counts = {"en": 1000, "de": 100, "fr": 0}
    rates = solve_rates(counts, {"en": 0.5, "de": 0.4, "fr": 0.1}, 500)
    assert rates["en"] == 0.25        # 250 of 1000
    assert rates["de"] == 1.0         # wants 200, only 100 — clamped
    assert rates["fr"] == 1.0         # empty stratum: keep-all of nothing


def test_sample_job_end_to_end(spark, tmp_path):
    """Run the job's core path (solver + stratified filter + write) and
    assert determinism, quota tracking, and the monotone-subset law."""
    sys.path.insert(0, "jobs")
    from sample_corpus import solve_rates

    from sketchlib.spark.sampling import stratified_hash_sample

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    counts = {r["lang"]: r["c"]
              for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    props = {"en": 0.6, "de": 0.4}
    rates = solve_rates(counts, props, 100)
    s1 = stratified_hash_sample(docs, rates, "lang", "doc_id", default_rate=0.0)
    got = {r["lang"]: r["c"]
           for r in s1.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    # only target strata appear; counts within hash-granularity of quota
    assert set(got) <= set(props)
    for lang in got:
        want = props[lang] * 100
        assert abs(got[lang] - want) <= max(10, 0.35 * want), (lang, got, want)
    # monotone-subset law: half the budget keeps a strict subset
    half = solve_rates(counts, props, 50)
    s2 = stratified_hash_sample(docs, half, "lang", "doc_id", default_rate=0.0)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids2 <= ids1
    # layout determinism
    s3 = stratified_hash_sample(docs.repartition(17), rates, "lang", "doc_id",
                                default_rate=0.0)
    assert {r["doc_id"] for r in s3.select("doc_id").collect()} == ids1
