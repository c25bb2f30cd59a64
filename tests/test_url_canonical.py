"""canonical_url: Spark output must byte-match a DuckDB mirror of the
documented spec (the oracle contract), and satisfy the dedup-key laws —
idempotence, param-order invariance, tracking-param erasure, passthrough
of what we don't understand."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.textops import TRACKING_PARAM_RE, canonical_url

URLS = [
    "http://example.com/a/b",
    "https://Example.COM/a/b",                      # scheme fold + host lower
    "http://www.example.com/a/b",                    # www strip
    "HTTPS://WWW.EXAMPLE.COM:443/a/b/",              # port + trailing slash
    "http://example.com:80/a//b///c",                # default port + // runs
    "http://example.com/a/b?z=1&a=2",                # param sort
    "http://example.com/a/b?a=2&z=1",                # same identity as above
    "http://example.com/a/b?utm_source=tw&a=2",      # tracking strip
    "http://example.com/a/b?utm_source=tw&utm_campaign=x",  # all tracked
    "http://example.com/a/b?gclid=123&fbclid=9&a=1",
    "http://example.com/a/b#frag",                   # fragment never enters
    "http://example.com/?ref=home",
    "http://example.com",                            # no path
    "http://example.com/",                           # root path -> ''
    "http://user:pw@example.com/x",                  # userinfo strip
    "http://example.com./x",                         # trailing host dot
    "http://example.com/a%20b?x=%C3%A9",             # encodings untouched
    "http://sub.www.example.com/x",                  # only LEADING www.
    "ftp://example.com/x",                           # non-http passthrough
    "not a url at all",                              # unparseable passthrough
    "  http://example.com/pad  ",                    # trim
    "http://example.com/a?b&=v&c=1",                 # empty params dropped
    "https://example.com/a?ref_src=twsrc&keep=1&_ga=2.1",
    "http://EXAMPLE.com:8080/x",                     # ports dropped (all)
]

_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)"


def _duck_mirror(urls, fold_scheme=True, drop_www=True):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    fold = ("CASE WHEN scheme0 = 'https' THEN 'http' ELSE scheme0 END"
            if fold_scheme else "scheme0")
    www = (r"regexp_replace(host0, '^www\.', '')" if drop_www else "host0")
    q = rf"""
    WITH p AS (SELECT url, trim(url) AS u FROM t),
    x AS (SELECT url, u,
        lower(coalesce(regexp_extract(u, '{_RE}', 1), '')) AS scheme0,
        coalesce(regexp_extract(u, '{_RE}', 2), '') AS auth,
        coalesce(regexp_extract(u, '{_RE}', 3), '') AS path0,
        coalesce(regexp_extract(u, '{_RE}', 4), '') AS query0
    FROM p),
    h AS (SELECT *,
        nullif(regexp_replace(lower(regexp_replace(regexp_replace(auth,
            '^.*@', ''), ':[0-9]*$', '')), '\.$', ''), '') AS host0
    FROM x),
    y AS (SELECT *,
        {fold} AS scheme1,
        {www} AS host1,
        regexp_replace(regexp_replace(path0, '/+', '/', 'g'), '/$', '')
            AS path1,
        coalesce(array_to_string(list_sort(list_filter(
            string_split(query0, '&'),
            q -> q <> '' AND NOT regexp_matches(q, '{TRACKING_PARAM_RE}'))),
            '&'), '') AS q1
    FROM h)
    SELECT url, CASE
        WHEN scheme1 IN ('http', 'https') AND host1 IS NOT NULL
        THEN scheme1 || '://' || host1 || path1 ||
             CASE WHEN q1 = '' THEN '' ELSE '?' || q1 END
        ELSE u END AS canon
    FROM y
    """
    return dict(con.execute(q).fetchall())


def _spark_canon(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", canonical_url("url", **kw).alias("c")).collect()
    return {r["url"]: r["c"] for r in rows}


@pytest.mark.parametrize("kw", [
    {}, {"fold_scheme": False}, {"drop_www": False},
    {"fold_scheme": False, "drop_www": False},
])
def test_canonical_url_matches_duckdb_mirror(spark, kw):
    got = _spark_canon(spark, URLS, **kw)
    exp = _duck_mirror(URLS, **{"fold_scheme": True, "drop_www": True, **kw})
    assert got == exp


def test_canonical_url_laws(spark):
    got = _spark_canon(spark, URLS)
    # idempotence: canonicalizing a canonical URL is a no-op
    again = _spark_canon(spark, list(set(got.values())))
    assert all(again[v] == v for v in got.values())
    # param order is not identity
    assert got["http://example.com/a/b?z=1&a=2"] == \
        got["http://example.com/a/b?a=2&z=1"]
    # tracking params are not identity; all-tracked == bare
    assert got["http://example.com/a/b?utm_source=tw&utm_campaign=x"] == \
        "http://example.com/a/b"
    # scheme/www/port/trailing-slash variants collapse
    assert got["HTTPS://WWW.EXAMPLE.COM:443/a/b/"] == \
        got["http://example.com/a/b"] == "http://example.com/a/b"
    # passthrough: unparseable and non-http inputs survive byte-identical
    assert got["not a url at all"] == "not a url at all"
    assert got["ftp://example.com/x"] == "ftp://example.com/x"
    # NULL stays NULL
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(canonical_url("url").alias("c")).collect()[0]["c"] is None


def test_canonical_url_dedup_key(spark):
    """Composition check: exact dedup keyed on canonical_url collapses the
    crawl-variant cluster to one keeper while distinct pages survive."""
    rows = [
        (1, "http://example.com/a/b"),
        (2, "https://www.example.com/a/b/"),
        (3, "http://example.com/a/b?utm_source=x"),
        (4, "http://example.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    keyed = df.withColumn("canon", canonical_url("url"))
    groups = keyed.groupBy("canon").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
    got = {r["canon"]: (r["n"], r["keeper"]) for r in groups.collect()}
    assert got == {
        "http://example.com/a/b": (3, 1),
        "http://example.com/other": (1, 4),
    }


# ---------------------------------------------------------------------------
# hypothesis property: Spark canonical_url == pure-Python spec mirror
# ---------------------------------------------------------------------------

import re

from hypothesis import given, settings, strategies as st

_SPLIT = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)\??([^#]*)")
_TRACK = re.compile(TRACKING_PARAM_RE)


def _py_canon(u, fold_scheme=True, drop_www=True):
    """Pure-Python mirror of the documented spec (regex steps, not urllib
    — Spark trim strips SPACES only, so the strategies avoid other
    whitespace)."""
    if u is None:
        return None
    t = u.strip(" ")
    m = _SPLIT.match(t)
    scheme = m.group(1).lower() if m else ""
    if fold_scheme and scheme == "https":
        scheme = "http"
    auth = m.group(2) if m else ""
    host = re.sub(r"^.*@", "", auth)
    host = re.sub(r":[0-9]*$", "", host)
    host = re.sub(r"\.$", "", host.lower()) or None
    if host is not None and drop_www:
        host = re.sub(r"^www\.", "", host)
    path = re.sub(r"/+", "/", m.group(3)) if m else ""
    path = re.sub(r"/$", "", path)
    query = m.group(4) if m else ""
    kept = sorted(p for p in query.split("&") if p and not _TRACK.match(p))
    q = "&".join(kept)
    if scheme in ("http", "https") and host is not None:
        return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")
    return t


_param = st.sampled_from(
    ["", "a=1", "z=9", "b", "A=B", "utm_source=tw", "utm_x", "gclid=1",
     "ref=h", "q=a&b"])
_structured = st.builds(
    lambda scheme, user, www, labels, dot, port, path, params, frag: (
        scheme + "://" + (user + "@" if user else "") + www
        + ".".join(labels) + dot + (":" + port if port else "") + path
        + ("?" + "&".join(params) if params else "")
        + ("#f" if frag else "")
    ),
    st.sampled_from(["http", "https", "HTTP", "HTTPS", "ftp", "x+z.w-1"]),
    st.one_of(st.just(""), st.text(alphabet="ab:@", max_size=4)),
    st.sampled_from(["", "www.", "WWW."]),
    st.lists(st.text(alphabet="abz09-AB_", min_size=0, max_size=5),
             min_size=1, max_size=4),
    st.sampled_from(["", "."]),
    st.one_of(st.just(""), st.text(alphabet="0123456789", max_size=4)),
    st.sampled_from(["", "/", "/a/b", "/a//b/", "//", "/a%20b"]),
    st.lists(_param, max_size=4),
    st.booleans(),
)
_url_like = st.one_of(
    st.none(),
    st.text(alphabet="ab://?#&=. @", max_size=24),
    _structured,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_url_like, min_size=1, max_size=25, unique=True))
def test_canonical_url_property_vs_python_oracle(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        canonical_url("url").alias("c"),
        canonical_url("url", fold_scheme=False, drop_www=False).alias("c2"),
    ).collect()
    for r in rows:
        u = r["url"]
        assert r["c"] == _py_canon(u), repr(u)
        assert r["c2"] == _py_canon(u, fold_scheme=False,
                                    drop_www=False), repr(u)
