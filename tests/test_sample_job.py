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


def test_cap_per_key_semantics(spark):
    """per-source quota cap: <= k rows per key; deterministic under
    repartitioning; monotone in k (raising the cap only ADDS rows); rank
    column is 1..n_kept per key."""
    from sketchlib.spark.sampling import cap_per_key

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet").select(
        "doc_id", "source")
    c10 = cap_per_key(docs, "source", 10, keep_rank=True)
    per = c10.groupBy("source").count().collect()
    assert per and all(r["count"] <= 10 for r in per)
    ranks = c10.groupBy("source").agg(
        F.max("_cap_rank").alias("mx"), F.count("*").alias("n")).collect()
    assert all(r["mx"] == r["n"] for r in ranks)

    a = {tuple(r) for r in c10.collect()}
    b = {tuple(r) for r in cap_per_key(
        docs.repartition(17), "source", 10, keep_rank=True).collect()}
    assert a == b

    ids10 = {r["doc_id"] for r in c10.collect()}
    ids25 = {r["doc_id"] for r in cap_per_key(docs, "source", 25).collect()}
    assert ids10 < ids25


def test_cap_per_key_plan_window_group_limit(spark):
    """the rank<=k filter must compile to a partial WindowGroupLimit below
    the exchange — the map side forwards at most k rows per key, so the
    shuffle carries O(k·keys), never the corpus."""
    from sketchlib.spark.sampling import cap_per_key

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet").select(
        "doc_id", "source")
    plan = cap_per_key(docs, "source", 10)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") <= 2  # hash exchange (+AQE read), no extra


def test_sample_job_cap_then_mixture(spark, tmp_path, monkeypatch):
    """--cap-key/--cap-k: the quota applies BEFORE the mixture solve, so
    the output honors both the per-source cap and the target mixture."""
    sys.path.insert(0, "jobs")
    import sample_corpus as job

    capture = []
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr("builtins.print", lambda s: capture.append(s))
    monkeypatch.setattr(
        sys, "argv",
        ["job", "--input", f"{SF_MED}/documents.parquet",
         "--output", str(tmp_path / "out"),
         "--target-props", '{"en": 0.6, "de": 0.4}',
         "--target-rows", "60",
         "--cap-key", "source", "--cap-k", "15"])
    assert job.main() is None
    out = spark.read.parquet(str(tmp_path / "out"))
    per_src = out.groupBy("source").count().collect()
    assert per_src and all(r["count"] <= 15 for r in per_src)
    assert {r["lang"] for r in out.select("lang").distinct().collect()} <= {"en", "de"}


def test_sample_job_domain_cap(spark, tmp_path, monkeypatch):
    """--domain-from url: the job derives the registrable-domain column in
    pure codegen and caps per DOMAIN — www./cdn. subdomains of one site
    share one quota (the reason a host-level key is wrong)."""
    sys.path.insert(0, "jobs")
    import sample_corpus as job

    src = str(tmp_path / "pages")
    rows = [
        (i, f"https://{sub}.site{i % 3}.co.uk/p/{i}", "en")
        for i, sub in ((j, ["www", "cdn", "a.b"][j % 3]) for j in range(90))
    ]
    spark.createDataFrame(
        rows, "doc_id long, url string, lang string").write.parquet(src)

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr("builtins.print", lambda s: None)
    monkeypatch.setattr(
        sys, "argv",
        ["job", "--input", src, "--output", str(tmp_path / "out"),
         "--rates", "{}", "--default-rate", "1.0",
         "--domain-from", "url", "--cap-key", "domain", "--cap-k", "10"])
    assert job.main() is None
    out = spark.read.parquet(str(tmp_path / "out"))
    per_dom = {r["domain"]: r["count"]
               for r in out.groupBy("domain").count().collect()}
    assert set(per_dom) == {f"site{i}.co.uk" for i in range(3)}
    assert all(c == 10 for c in per_dom.values()), per_dom
