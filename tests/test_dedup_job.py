"""jobs/dedup_corpus.py: min-id propagation over combined exact+near
duplicate edges must equal union-find connected components."""

import pytest

from tests.conftest import SF_MED

pytestmark = pytest.mark.spark


def test_propagate_min_keeper_equals_union_find(spark):
    import sys

    sys.path.insert(0, "jobs")
    from dedup_corpus import propagate_min_keeper

    # edges forming: a chain 1-2-3-4 (transitive), a pair 10-11, a
    # triangle 20-21-22, and a long chain exercising multi-round converge
    chain = [(i, i + 1) for i in range(100, 120)]
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    df = spark.createDataFrame(edges + chain, "a_id long, b_id long")
    got = {r["id"]: r["keeper_id"] for r in propagate_min_keeper(df).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges + chain:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in set(parent)}
    assert got == want


def test_dedup_job_pipeline_on_sf001(spark, tmp_path):
    """The job's core composition (exact edges + LSH pairs -> min-id
    groups joined back onto all ids) against a DuckDB+union-find truth."""
    import sys

    import duckdb
    from pyspark.sql import functions as F

    sys.path.insert(0, "jobs")
    from dedup_corpus import propagate_min_keeper

    from sketchlib.spark.dedup import exact_dedup_keepers, minhash_lsh_dedup_pairs

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    ek = exact_dedup_keepers(docs).filter(
        F.col("doc_id") != F.col("keeper_id")
    ).select(F.col("keeper_id").alias("a_id"), F.col("doc_id").alias("b_id"))
    near = minhash_lsh_dedup_pairs(docs, 0.8).select("a_id", "b_id")
    grouped = propagate_min_keeper(ek.union(near))
    keeper = (
        docs.select(F.col("doc_id").alias("id"))
        .join(grouped, "id", "left")
        .select("id", F.coalesce("keeper_id", F.col("id")).alias("keeper_id"))
    )
    got = {r["id"]: r["keeper_id"] for r in keeper.collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_MED}/documents.parquet')")
    import __spark_entry__ as e

    near_t = con.execute(e.oracle_sql()["dedup_jaccard_pairs"]).fetchall()
    exact_t = con.execute(
        "SELECT min(doc_id) OVER (PARTITION BY text) AS k, doc_id "
        "FROM documents QUALIFY doc_id != k").fetchall()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in [(r[0], r[1]) for r in near_t] + [(r[0], r[1]) for r in exact_t]:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for i, k in got.items():
        want = find(i) if i in parent else i
        assert k == want, (i, k, want)


def test_propagate_min_keeper_log_convergence_and_cap_error(spark):
    """Pointer jumping must give O(log L) convergence: a 100-link chain
    converges within 10 rounds; and hitting the round cap without a
    fixpoint must RAISE, never return an under-merged mapping."""
    import sys

    sys.path.insert(0, "jobs")
    from dedup_corpus import propagate_min_keeper

    chain = [(i, i + 1) for i in range(1000, 1100)]
    df = spark.createDataFrame(chain, "a_id long, b_id long")
    got = {r["id"]: r["keeper_id"]
           for r in propagate_min_keeper(df, max_rounds=10).collect()}
    assert set(got.values()) == {1000}

    with pytest.raises(RuntimeError, match="no fixpoint"):
        propagate_min_keeper(df, max_rounds=1)
