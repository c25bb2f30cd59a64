"""jobs/ann_index.py: build + probe end-to-end — the stored probe equals
the in-memory ivf_topk on the same deterministic training."""

import json
import sys

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

pytestmark = pytest.mark.spark


def test_ann_index_job_build_then_probe(spark, tmp_path, monkeypatch):
    sys.path.insert(0, "jobs")
    import ann_index as job

    from sketchlib.spark.ann import ivf_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    src = str(tmp_path / "vectors")
    emb.write.parquet(src)
    qids = [0, 1, 2]
    qsrc = str(tmp_path / "queries")
    emb.filter(F.col("vec_id").isin(qids)).write.parquet(qsrc)

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    capture = []
    monkeypatch.setattr("builtins.print", lambda s: capture.append(s))

    idx = str(tmp_path / "ivf")
    monkeypatch.setattr(sys, "argv", [
        "job", "build", "--input", src, "--index", idx, "--n-lists", "16"])
    job.main()
    rep = json.loads(capture[-1])
    assert rep["mode"] == "build" and rep["n_lists"] == 16
    assert rep["n_vectors"] == emb.count()

    out = str(tmp_path / "nn")
    monkeypatch.setattr(sys, "argv", [
        "job", "probe", "--index", idx, "--queries", qsrc,
        "--output", out, "--k", "5", "--nprobe", "4"])
    job.main()
    rep = json.loads(capture[-1])
    assert rep["mode"] == "probe" and rep["n_queries"] == 3

    got = {(r["query_id"], r["rank"], r["neighbor_id"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["query_id"], r["rank"], r["neighbor_id"])
            for r in ivf_topk(emb, qids, k=5, n_lists=16, nprobe=4).collect()}
    assert got == want
