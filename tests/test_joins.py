"""asof_join semantics (vs pandas.merge_asof as the public-semantics
oracle), stratified hash sampling laws, and transitive dedup grouping."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def sides(spark):
    left = _mk(spark, [
        # (key, ts, lid)
        ("a", 10.0, 1), ("a", 20.0, 2), ("a", 20.5, 3), ("b", 5.0, 4),
        ("c", 7.0, 5),   # key with no right rows at all
        ("a", 4.9, 6),   # before any right row
    ], "k string, ts double, lid int")
    right = _mk(spark, [
        # (key, rts, rid, payload)
        ("a", 5.0, 100, 1.5), ("a", 20.0, 101, 2.5), ("a", 20.0, 102, 3.5),
        ("b", 5.0, 103, 4.5), ("b", 6.0, 104, 5.5),
    ], "k string, rts double, rid int, payload double")
    return left, right


def _got(df):
    return {r["lid"]: (r["rid"], r["payload"]) for r in df.collect()}


def test_asof_exact_matches(spark, sides):
    from sketchlib.spark.joins import asof_join

    left, right = sides
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    payload_cols=["rid", "payload"], allow_exact_matches=True,
                    tiebreak_cols=["rid"])
    got = _got(out)
    assert got[1] == (100, 1.5)          # 10.0 -> rts 5.0
    assert got[2] == (102, 3.5)          # ts==rts 20.0 counts; tie -> max rid
    assert got[3] == (102, 3.5)
    assert got[4] == (103, 4.5)          # equal ts at key b
    assert got[5] == (None, None)        # no right rows for key c
    assert got[6] == (None, None)        # before any right row


def test_asof_strict(spark, sides):
    from sketchlib.spark.joins import asof_join

    left, right = sides
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    payload_cols=["rid", "payload"], allow_exact_matches=False,
                    tiebreak_cols=["rid"])
    got = _got(out)
    assert got[2] == (100, 1.5)          # rts==20.0 excluded under strict
    assert got[3] == (102, 3.5)          # 20.5 still sees the 20.0 rows
    assert got[4] == (None, None)        # only right row is AT 5.0


@pytest.mark.parametrize("exact", [True, False])
def test_asof_matches_pandas_merge_asof(spark, exact):
    """Randomized cross-check against pandas.merge_asof (the documented
    public semantics).  Unique right timestamps per key so the pandas
    tie-break ambiguity never triggers."""
    rng = np.random.default_rng(7)
    keys = np.array(["u", "v", "w"])
    lp = pd.DataFrame({
        "k": rng.choice(keys, 200),
        "ts": rng.integers(0, 1000, 200).astype("float64"),
        "lid": np.arange(200),
    })
    rp = pd.DataFrame({
        "k": rng.choice(keys, 60),
        "rts": rng.permutation(1000)[:60].astype("float64"),
        "rid": np.arange(60),
    })
    from sketchlib.spark.joins import asof_join

    out = asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp),
                    on="k", left_ts="ts", right_ts="rts",
                    payload_cols=["rid"], allow_exact_matches=exact)
    got = {r["lid"]: r["rid"] for r in out.collect()}

    want_df = pd.merge_asof(
        lp.sort_values("ts", kind="stable"), rp.sort_values("rts"),
        left_on="ts", right_on="rts", by="k", allow_exact_matches=exact,
    )
    want = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in want_df.itertuples()}
    assert got == want


def test_asof_plan_has_no_nested_loop(spark, sides):
    """The whole point: the plan must be shuffle+window, never a
    BroadcastNestedLoopJoin / CartesianProduct inequality join."""
    from sketchlib.spark.joins import asof_join

    left, right = sides
    plan = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                     payload_cols=["rid"])._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" in plan


def test_stratified_sample_laws(spark):
    """Determinism under repartition, monotone subset in the rate, and
    rate accuracy on a large stratum."""
    from sketchlib.spark.sampling import stratified_hash_sample

    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2 == 0).cast("string").alias("lang"),
    )
    a = stratified_hash_sample(df, {"true": 0.3}, id_col="doc_id")
    b = stratified_hash_sample(df.repartition(13), {"true": 0.3}, id_col="doc_id")
    ids_a = {r["doc_id"] for r in a.collect()}
    ids_b = {r["doc_id"] for r in b.collect()}
    assert ids_a == ids_b                      # layout-independent
    lo = {r["doc_id"] for r in
          stratified_hash_sample(df, {"true": 0.1}, id_col="doc_id").collect()
          if r["lang"] == "true"}
    hi = {i for i in ids_a if i % 2 == 0}
    assert lo <= hi                            # monotone subset in rate
    n_true = sum(1 for i in ids_a if i % 2 == 0)
    assert abs(n_true / 10_000 - 0.3) < 0.02   # md5 uniformity
    n_false = sum(1 for i in ids_a if i % 2 == 1)
    assert n_false == 10_000                   # default rate 1.0 keeps all


def test_stratified_sample_no_shuffle(spark):
    from sketchlib.spark.sampling import stratified_hash_sample

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = stratified_hash_sample(df, {"en": 0.5})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_group_keepers_transitive(spark):
    """A~B and B~C (each pair >= threshold) must collapse to ONE keeper
    even when A~C alone is below threshold; uniques keep themselves; NULL
    text rows never group."""
    from sketchlib.spark.dedup import dedup_group_keepers

    base = "the quick brown fox jumps over the lazy dog " * 6
    a = base
    b = base + "alpha beta gamma delta"        # ~B close to A
    c = base + "alpha beta gamma delta epsilon zeta eta theta"  # close to B
    rows = [
        (1, a), (2, b), (3, c),
        (4, a),                                 # exact dup of 1
        (5, "completely different text about spark and sketches"),
        (6, None), (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["keeper_id"]
           for r in dedup_group_keepers(df, threshold=0.5).collect()}
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert got[5] == 5 and got[6] == 6 and got[7] == 7


def test_weighted_sample_margin_and_determinism(spark):
    """The rank-10/11 priority gap per lang must exceed 1e-9 (so Spark/
    DuckDB libm ulp differences cannot flip sample membership), and the
    sample must be layout-independent."""
    from sketchlib.spark.sampling import weighted_priority_sample
    from pyspark.sql import Window

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    u = (F.conv(F.substring(F.md5(F.encode(F.col("doc_id").cast("string"),
                                           "UTF-8")), 1, 15), 16, 10)
         .cast("long").cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    pk = F.log(u) / F.col("n_chars").cast("double")
    ranked = (docs.filter(F.col("n_chars") > 0)
              .withColumn("pk", pk)
              .withColumn("rk", F.row_number().over(
                  Window.partitionBy("lang").orderBy(F.desc("pk"), "doc_id"))))
    by_lang = {}
    for r in ranked.filter(F.col("rk").isin(10, 11)).collect():
        by_lang.setdefault(r["lang"], {})[r["rk"]] = r["pk"]
    for lang, d in by_lang.items():
        if 10 in d and 11 in d:
            assert d[10] - d[11] > 1e-9, (lang, d)

    a = weighted_priority_sample(docs, 10, "n_chars", by="lang")
    b = weighted_priority_sample(docs.repartition(17), 10, "n_chars", by="lang")
    assert ({r["doc_id"] for r in a.collect()}
            == {r["doc_id"] for r in b.collect()})


def test_weighted_sample_is_pps(spark):
    """Statistical law: across many disjoint id-spaces, inclusion
    frequency must track weight (probability proportional to size).  A
    10x-weight item must appear in the top-k far more often than a 1x
    item."""
    from sketchlib.spark.sampling import weighted_priority_sample

    # 400 groups of 20 rows; in each group one row has weight 10, rest 1
    rows = [(g * 100 + i, "g%d" % g, 10.0 if i == 0 else 1.0)
            for g in range(400) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    got = weighted_priority_sample(df, 1, "w", by="grp").collect()
    heavy_wins = sum(1 for r in got if r["doc_id"] % 100 == 0)
    # P[heavy wins] = 10/(10+19) ~= 0.345; binomial sd ~ 0.024
    assert 0.25 < heavy_wins / 400 < 0.45, heavy_wins


def test_weighted_sample_global_topk_plan(spark):
    """Global k must compile to TakeOrderedAndProject (partial top-k per
    partition), not a full sort."""
    from sketchlib.spark.sampling import weighted_priority_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = weighted_priority_sample(docs, 25, "n_chars")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_range_join_semantics(spark):
    """Bucketized range join == brute-force interval containment, for both
    interval closures, including a point exactly on a bucket boundary."""
    from sketchlib.spark.joins import range_join

    L = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 15.0), (3, "b", 7.0), (4, "a", 10.0)],
        "id long, k string, p double",
    )
    R = spark.createDataFrame(
        [(100, "a", 0.0, 10.0), (200, "a", 5.0, 20.0), (300, "b", 8.0, 9.0)],
        "rid long, k string, lo double, hi double",
    )
    got = sorted((r["id"], r["rid"]) for r in
                 range_join(L, R, "k", "p", "lo", "hi",
                            bucket_width=5.0).collect())
    assert got == [(1, 100), (1, 200), (2, 200), (4, 200)]
    got_both = sorted((r["id"], r["rid"]) for r in
                      range_join(L, R, "k", "p", "lo", "hi",
                                 closed="both").collect())  # auto width
    assert got_both == [(1, 100), (1, 200), (2, 200), (4, 100), (4, 200)]


def test_range_join_no_nested_loop_and_guard(spark):
    """The plan must be a hash/sort-merge EQUI-join (never
    BroadcastNestedLoopJoin), and max_buckets must raise at execution."""
    import pytest as _pytest
    from sketchlib.spark.joins import range_join

    L = spark.createDataFrame([(1, "a", 5.0)], "id long, k string, p double")
    R = spark.createDataFrame([(9, "a", 0.0, 10.0)],
                              "rid long, k string, lo double, hi double")
    j = range_join(L, R, "k", "p", "lo", "hi", bucket_width=5.0)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    with _pytest.raises(Exception, match="range_join"):
        range_join(L, R, "k", "p", "lo", "hi", bucket_width=0.01,
                   max_buckets=5).collect()


def test_range_join_ntz_timestamps_match_pandas(spark):
    """Timestamp (NTZ) points/bounds: epoch decomposition must agree with a
    brute-force pandas interval check on the real events table."""
    import pandas as pd
    from pyspark.sql import functions as F
    from sketchlib.spark.joins import range_join, ts_epoch_seconds

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    evp = ev.filter(F.col("event_type") == "purchase")
    purch = evp.select(
        F.col("event_id").alias("pid"), "user_id",
        ts_epoch_seconds(evp, "ts").alias("lo"),
        (ts_epoch_seconds(evp, "ts") + 3600.0).alias("hi"))
    got = sorted((r["event_id"], r["pid"]) for r in range_join(
        ev.select("event_id", "user_id", "ts"), purch,
        "user_id", "ts", "lo", "hi", bucket_width=3600.0).collect())

    e = ev.select("event_id", "user_id", "ts").toPandas()
    p = evp.select(F.col("event_id").alias("pid"), "user_id",
                   F.col("ts").alias("pts")).toPandas()
    m = e.merge(p, on="user_id")
    m = m[(m.ts >= m.pts) & (m.ts < m.pts + pd.Timedelta(hours=1))]
    want = sorted(zip(m.event_id, m.pid))
    assert got == want
