"""url_host / registrable_domain: handcrafted edge table + hypothesis
property vs a pure-Python oracle of the documented heuristic.  The ops are
pure codegen (regex subset where Java and RE2 agree), so the same steps in
DuckDB must yield identical bytes — that equivalence is gated end-to-end by
the domain_stats oracle query; here we pin the semantics."""

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sketchlib.spark.textops import (
    TWO_LEVEL_SUFFIXES,
    registrable_domain,
    url_host,
)

CASES = [
    ("https://www.news-7.co.uk/a/123", "www.news-7.co.uk", "news-7.co.uk"),
    ("http://blog.user42.example.com:8080/p?q=1",
     "blog.user42.example.com", "example.com"),
    ("https://cdn.src3.net/asset/9", "cdn.src3.net", "src3.net"),
    ("https://192.168.44.1/raw", "192.168.44.1", "192.168.44.1"),
    ("https://src5.org/77", "src5.org", "src5.org"),
    ("https://user:pw@deep.sub.shop3.com.au/x",
     "deep.sub.shop3.com.au", "shop3.com.au"),
    ("https://single-label/x", "single-label", "single-label"),
    ("https://Host.Example.COM./trailing", "host.example.com", "example.com"),
    ("not a url", None, None),
    ("ftp://files.example.org:21/", "files.example.org", "example.org"),
    ("https://a.b.c.d.e.co.jp/deep", "a.b.c.d.e.co.jp", "e.co.jp"),
    ("https://10.0.0.1:8443/x", "10.0.0.1", "10.0.0.1"),
    (None, None, None),
    # greedy userinfo strip: up to the LAST '@'
    ("https://weird@@host.com/x", "host.com", "host.com"),
    ("https:///nohost", None, None),
    ("https://co.uk/suffix-as-host", "co.uk", "co.uk"),
    ("//scheme-relative.example.com/x", None, None),
]


def _py_host(url):
    if url is None:
        return None
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", url)
    if not m:
        return None
    host = re.sub(r"^.*@", "", m.group(1))
    host = re.sub(r":[0-9]*$", "", host)
    host = re.sub(r"\.$", "", host.lower())
    return host or None


def _py_domain(host):
    if host is None:
        return None
    if re.fullmatch(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", host):
        return host
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    if ".".join(parts[-2:]) in TWO_LEVEL_SUFFIXES:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


def _run(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = (
        df.select("url", url_host("url").alias("host"))
        .withColumn("domain", registrable_domain("host"))
        .collect()
    )
    return {r["url"]: (r["host"], r["domain"]) for r in out}


def test_domain_edge_table(spark):
    got = _run(spark, [u for u, _, _ in CASES])
    for url, host, dom in CASES:
        assert got[url] == (host, dom), url


_label = st.text(
    alphabet="abz09-AB_", min_size=0, max_size=6)
_urls = st.one_of(
    st.none(),
    st.text(alphabet="ab:/@.?#%", max_size=20),
    st.builds(
        lambda scheme, user, labels, port, path: (
            scheme + "://" + (user + "@" if user else "")
            + ".".join(labels) + (":" + port if port else "") + "/" + path
        ),
        st.sampled_from(["http", "https", "ftp", "x+z.w-1"]),
        st.one_of(st.just(""), st.text(alphabet="ab:@", max_size=5)),
        st.lists(_label, min_size=1, max_size=5),
        st.one_of(st.just(""), st.text(alphabet="0123456789", max_size=4)),
        st.text(alphabet="ab/?#.", max_size=8),
    ),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_urls, min_size=1, max_size=20, unique=True))
def test_domain_property_vs_python_oracle(spark, urls):
    got = _run(spark, urls)
    for u in urls:
        host = _py_host(u)
        assert got[u] == (host, _py_domain(host)), repr(u)


def test_domain_extraction_streams(spark, tmp_path):
    """stateless projection: the SAME url_host/registrable_domain columns
    over a readStream yield exactly the batch values — domain keys can be
    derived on the live crawl before any stateful stage."""
    import os

    src = str(tmp_path / "src")
    urls = [u for u, _, _ in CASES if u is not None]
    spark.createDataFrame(
        [(i, urls[i % len(urls)]) for i in range(40)],
        "doc_id long, url string",
    ).repartition(4).write.parquet(src)
    static = spark.read.parquet(src)

    def project(df):
        return df.select(
            "doc_id", url_host("url").alias("host")
        ).withColumn("domain", registrable_domain("host"))

    batch = {r["doc_id"]: (r["host"], r["domain"])
             for r in project(static).collect()}
    stream = spark.readStream.schema(static.schema).option(
        "maxFilesPerTrigger", "1").parquet(src)
    got = []
    q = (project(stream).writeStream.outputMode("append")
         .foreachBatch(lambda bdf, _id: got.extend(bdf.collect())).start())
    q.processAllAvailable()
    q.stop()
    assert {r["doc_id"]: (r["host"], r["domain"]) for r in got} == batch
