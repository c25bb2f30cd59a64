"""Cross-document paragraph dedup (dedup.paragraph_dedup): the CCNet/Gopher
boilerplate rule, checked against a pure-python oracle on real docs plus
planted boilerplate."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

pytestmark = pytest.mark.spark

SEP = "\n\n"
BOILER = "Accept cookies to continue.\nSite navigation: home | about"


def _python_oracle(rows, min_docs):
    from collections import defaultdict

    by_para = defaultdict(set)
    for did, text in rows:
        if text is None:
            continue
        for p in text.split(SEP):
            if p.strip():
                by_para[p].add(did)
    dup = {p for p, ids in by_para.items() if len(ids) >= min_docs}
    out = {}
    for did, text in rows:
        if text is None:
            out[did] = (None, 0, 0)
            continue
        paras = text.split(SEP)
        keep = [p for p in paras if p not in dup or not p.strip()]
        n_paras = sum(1 for p in paras if p.strip())
        n_removed = len({i for i, p in enumerate(paras)
                         if p.strip() and p in dup})
        out[did] = (SEP.join(keep), n_paras, n_removed)
    return out


def test_paragraph_dedup_matches_python_oracle(spark):
    from sketchlib.spark.dedup import paragraph_dedup

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text")
    # plant boilerplate on ~1/3 of docs (prepended) and a NULL-text doc
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(BOILER + SEP), F.col("text")))
        .when(F.col("doc_id") % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("text")),
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_paragraphs"], r["n_removed"])
        for r in paragraph_dedup(planted, min_docs=3).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in planted.collect()]
    want = _python_oracle(rows, min_docs=3)
    assert set(got) == set(want)
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, list(mismatches.items())[:3]
    # the planted boilerplate must actually have been removed somewhere
    assert sum(n for _, _, n in got.values()) > 0


def test_paragraph_dedup_broadcast_equivalent(spark):
    from sketchlib.spark.dedup import paragraph_dedup

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text").limit(200)
    planted = docs.withColumn(
        "text", F.concat(F.lit(BOILER + SEP), F.col("text")))
    a = sorted(map(tuple, paragraph_dedup(planted).collect()))
    b = sorted(map(tuple, paragraph_dedup(
        planted, broadcast_dups=True).collect()))
    assert a == b
