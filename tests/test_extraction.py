"""Byte-identical extraction invariant (north rule / FIXTURES.md §1) and
generator determinism."""

import os

import numpy as np
import pandas as pd
import pytest

from sketchlib.data.extract import extract_one, extract_series
from sketchlib.data.gen_pages import gen_chunk, write_pages


def test_extract_rule_fixed_points():
    html = b"<html><head><title>T1</title><script>var x=1;</script>" \
           b"<style>.a{}</style></head><body><p>hello  world</p><p>two</p></body></html>"
    assert extract_one(html) == "T1 hello world two"
    # vectorized path identical to scalar path
    assert extract_series(pd.Series([html]))[0] == "T1 hello world two"


def test_extract_edge_cases():
    assert extract_one(b"") == ""
    assert extract_one(b"no tags at all") == "no tags at all"
    assert extract_one(b"<p>a</p \t\n ><p>b</p>") == "a b"  # malformed tail tag
    # script spans with embedded tags are fully removed
    assert extract_one(b"<script>if (a<b) { x(); }</script>rest") == "rest"
    # case-insensitive script/style
    assert extract_one(b"<SCRIPT>x</SCRIPT><STYLE>y</STYLE>z") == "z"


def test_generator_deterministic_and_chunk_invariant():
    a = gen_chunk(0, 500)
    b = gen_chunk(0, 500)
    pd.testing.assert_frame_equal(a, b)
    # chunking by absolute row id: rows [100,200) equal regardless of chunking
    c = gen_chunk(100, 100)
    assert c["url"].iloc[0].endswith("000100")


def test_generated_text_matches_extraction():
    pdf = gen_chunk(0, 2000)
    extracted = extract_series(pdf["html"])
    assert (extracted == pdf["text"]).all()
    # skew properties: en is the hot language, hosts are Zipf
    frac_en = (pdf["lang"] == "en").mean()
    assert 0.45 < frac_en < 0.65
    hosts = pdf["url"].str.extract(r"site(\d+)")[0].astype(int)
    assert (hosts == hosts.mode()[0]).sum() > 100  # hot host exists


@pytest.mark.spark
def test_spark_extraction_byte_identical(spark, tmp_path):
    path = os.path.join(tmp_path, "pages.parquet")
    write_pages(path, 5000)
    from pyspark.sql import functions as F

    from sketchlib.spark.extract_ops import with_extracted_text

    df = spark.read.parquet(path)
    out = with_extracted_text(df)
    n_total = out.count()
    n_match = out.where(F.col("text_extracted") == F.col("text")).count()
    assert n_total == 5000
    assert n_match == n_total  # byte-identical per url
    # quantile pipeline over extracted length == over stored n_chars
    from sketchlib.spark.tdigest_ops import tdigest_aggregate

    a = tdigest_aggregate(
        out.select("lang", F.length("text_extracted").alias("L")), ["lang"], "L", delta=0.0
    ).collect()
    b = tdigest_aggregate(
        df.select("lang", F.length("text").alias("L")), ["lang"], "L", delta=0.0
    ).collect()
    assert {r["lang"]: bytes(r["digest"]) for r in a} == {
        r["lang"]: bytes(r["digest"]) for r in b
    }


def test_extract_len_path_identical():
    """The length-only projection pushdown (bytes fast path, VERDICT r03 #3)
    must agree with len(extract_one(...)) everywhere — including its
    fallback triggers (non-ASCII, \\x1c-\\x1f controls, unclosed
    script/style, malformed tags)."""
    import random

    from sketchlib.data.extract import extract_len_one, extract_len_series

    pdf = gen_chunk(0, 3000)
    got = extract_len_series(pdf["html"])
    want = pdf["text"].str.len().to_numpy(dtype="float64")
    assert (got == want).all()

    random.seed(11)
    frag = ["<script>", "</script>", "<style>", "</style>", "<p>", "</p>",
            "<", ">", "wörd", "word", " ", "\t", "\n", "\x1c", "\x1d",
            "\x85", "\xa0", "<SCRIPT>x</SCRIPT>", "a<b", "c>d",
            "<script>no close", "x</script>", ""]
    for _ in range(500):
        d = "".join(random.choices(frag, k=random.randint(0, 10))).encode("utf-8")
        assert extract_len_one(d) == len(extract_one(d)), repr(d)
