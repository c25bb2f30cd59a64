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

    near_t = con.execute(e.oracle_sql()["dedup_neardup_pairs"]).fetchall()
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


def test_dedup_job_incremental_index(spark, tmp_path, monkeypatch):
    """Two-epoch incremental run: epoch 1 persists its keepers' banded-LSH
    index; epoch 2 drops near-copies of epoch-1 docs with the EPOCH-1 doc
    as keeper (no re-signing of epoch 1), still dedups within-batch, and
    writes the cumulative index."""
    import sys

    import numpy as np
    from pyspark.sql import functions as F

    sys.path.insert(0, "jobs")
    import dedup_corpus as job

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]

    def text():
        return " ".join(rng.choice(vocab, 30))

    e1_rows = [(i, text()) for i in range(20)]
    e1 = str(tmp_path / "e1")
    spark.createDataFrame(e1_rows, "doc_id long, text string").write.parquet(e1)

    # epoch 2: 100..109 near-copies of epoch-1 docs 0..9; 110..119 fresh;
    # 120 a within-batch copy of 110
    e2_rows = [(100 + k, e1_rows[k][1] + " tail") for k in range(10)]
    fresh = [(110 + k, text()) for k in range(10)]
    e2_rows += fresh + [(120, fresh[0][1] + " tail")]
    e2 = str(tmp_path / "e2")
    spark.createDataFrame(e2_rows, "doc_id long, text string").write.parquet(e2)

    o1, o2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    idx1, idx2 = str(tmp_path / "idx1"), str(tmp_path / "idx2")

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr("builtins.print", lambda s: None)
    monkeypatch.setattr(sys, "argv", [
        "job", "--input", e1, "--output", o1, "--sig-index-out", idx1])
    assert job.main() is None
    monkeypatch.setattr(sys, "argv", [
        "job", "--input", e2, "--output", o2,
        "--sig-index-in", idx1, "--sig-index-out", idx2])
    assert job.main() is None

    out2 = {r["id"]: r["keeper_id"]
            for r in spark.read.parquet(o2).collect()}
    assert set(out2) == {r[0] for r in e2_rows}
    for k in range(10):                      # vs-index drops, epoch-1 keeper
        assert out2[100 + k] == k, (k, out2)
    for k in range(110, 120):                # fresh docs keep themselves
        assert out2[k] == k
    assert out2[120] == 110                  # within-batch dedup still runs

    kept1 = {r["id"] for r in spark.read.parquet(o1)
             .filter(F.col("id") == F.col("keeper_id")).collect()}
    idx_ids = {r["doc_id"] for r in spark.read.parquet(f"{idx2}/banded")
               .select("doc_id").distinct().collect()}
    assert idx_ids == kept1 | set(range(110, 120))   # cumulative union
    meta = spark.read.parquet(f"{idx2}/meta").collect()[0]
    assert (meta["ngram"], meta["num_perm"]) == (3, 64)
    # flag omitted -> the post-soak default kernel is recorded in meta
    assert meta["sig_kernel"] == "poly"


def test_dedup_job_index_pins_sig_kernel(spark, tmp_path, monkeypatch):
    """An index built with --sig-kernel xxh (the non-default kernel since
    the recall soak flipped the default to poly) records the kernel in
    meta, and a later --sig-index-in run signs with THAT kernel even when
    the flag is omitted (mixing kernels would make every index probe
    miss — the probe finding all planted near-dups proves it signed xxh,
    not this run's poly default)."""
    import sys

    import numpy as np

    sys.path.insert(0, "jobs")
    import dedup_corpus as job

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(150)]

    def text():
        return " ".join(rng.choice(vocab, 30))

    e1_rows = [(i, text()) for i in range(8)]
    e1 = str(tmp_path / "e1")
    spark.createDataFrame(e1_rows, "doc_id long, text string").write.parquet(e1)
    e2 = str(tmp_path / "e2")
    spark.createDataFrame(
        [(100 + k, e1_rows[k][1] + " tail") for k in range(4)]
        + [(200, text())],
        "doc_id long, text string").write.parquet(e2)

    o1, o2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    idx1 = str(tmp_path / "idx1")
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr("builtins.print", lambda s: None)
    monkeypatch.setattr(sys, "argv", [
        "job", "--input", e1, "--output", o1,
        "--sig-kernel", "xxh", "--sig-index-out", idx1])
    assert job.main() is None
    meta = spark.read.parquet(f"{idx1}/meta").collect()[0]
    assert meta["sig_kernel"] == "xxh"

    # flag omitted on purpose: the kernel must come from the index meta
    monkeypatch.setattr(sys, "argv", [
        "job", "--input", e2, "--output", o2, "--sig-index-in", idx1])
    assert job.main() is None
    out2 = {r["id"]: r["keeper_id"] for r in spark.read.parquet(o2).collect()}
    for k in range(4):
        assert out2[100 + k] == k, (k, out2)
    assert out2[200] == 200


def test_dedup_job_bucketed_index(spark, tmp_path, monkeypatch):
    """--sig-index-format bucketed: the index files are written CLUSTERED+
    SORTED BY (band, bh) (bucket ids in the part-file names — no
    metastore), a later flag-omitted probe re-registers them from meta and
    produces EXACTLY the drops of a plain-parquet index over the same
    corpus, the probe's plan reads the index side as a bucketed scan with
    no Exchange below the join, and a third cumulative run unions into the
    bucketed layout."""
    import re
    import sys

    import numpy as np
    from pyspark.sql import functions as F

    sys.path.insert(0, "jobs")
    import dedup_corpus as job

    from sketchlib.spark.dedup import (
        banded_signatures,
        lsh_candidates_vs_index,
        minhash_signatures,
        read_bucketed_banded,
    )

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(220)]

    def text():
        return " ".join(rng.choice(vocab, 30))

    e1_rows = [(i, text()) for i in range(24)]
    e1 = str(tmp_path / "e1")
    spark.createDataFrame(e1_rows, "doc_id long, text string").write.parquet(e1)
    e2_rows = [(100 + k, e1_rows[k][1] + " tail") for k in range(8)]
    e2_rows += [(300, text())]
    e2 = str(tmp_path / "e2")
    spark.createDataFrame(e2_rows, "doc_id long, text string").write.parquet(e2)

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr("builtins.print", lambda s: None)

    def run(argv):
        monkeypatch.setattr(sys, "argv", ["job"] + argv)
        assert job.main() is None

    # build the SAME epoch-1 index in both layouts
    ob, op = str(tmp_path / "ob"), str(tmp_path / "op")
    idx_b, idx_p = str(tmp_path / "idx_b"), str(tmp_path / "idx_p")
    run(["--input", e1, "--output", ob, "--sig-index-out", idx_b,
         "--sig-index-format", "bucketed", "--index-buckets", "8"])
    run(["--input", e1, "--output", op, "--sig-index-out", idx_p])

    meta = spark.read.parquet(f"{idx_b}/meta").collect()[0]
    assert meta["format"] == "bucketed" and meta["n_buckets"] == 8
    assert "band" in meta["schema_ddl"] and "bh" in meta["schema_ddl"]
    # bucket ids live in the file names
    files = [f for f in __import__("os").listdir(f"{idx_b}/banded")
             if f.startswith("part-")]
    assert files and all(re.search(r"_0000[0-7]\.", f) for f in files)
    # same banded ROWS in both layouts
    rows_b = {tuple(r) for r in spark.read.parquet(f"{idx_b}/banded").collect()}
    rows_p = {tuple(r) for r in spark.read.parquet(f"{idx_p}/banded").collect()}
    assert rows_b == rows_p

    # probes against both layouts drop identically
    o2b, o2p = str(tmp_path / "o2b"), str(tmp_path / "o2p")
    run(["--input", e2, "--output", o2b, "--sig-index-in", idx_b])
    run(["--input", e2, "--output", o2p, "--sig-index-in", idx_p])
    got_b = {(r["id"], r["keeper_id"])
             for r in spark.read.parquet(o2b).collect()}
    got_p = {(r["id"], r["keeper_id"])
             for r in spark.read.parquet(o2p).collect()}
    assert got_b == got_p
    assert {(100 + k, k) for k in range(8)} <= got_b
    assert (300, 300) in got_b

    # plan shape: index side is a bucketed scan, no Exchange below the join
    index = read_bucketed_banded(spark, f"{idx_b}/banded",
                                 meta["schema_ddl"], 8)
    new_b = banded_signatures(minhash_signatures(
        spark.read.parquet(e2), kernel="poly"))
    def plan_of(df):
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")

    # force SortMergeJoin (the tiny test frames would broadcast) and count
    # SHUFFLE exchanges only: the bucketed layout removes EXACTLY the
    # index side's Exchange vs a plain read of the same files
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(lsh_candidates_vs_index(new_b, index))
        plain_idx = spark.read.parquet(f"{idx_b}/banded")
        plan_plain = plan_of(lsh_candidates_vs_index(new_b, plain_idx))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "Bucketed: true" in plan
    shuffles = r"(?<!Broadcast)Exchange"
    n_b = len(re.findall(shuffles, plan.split("\n\n")[0]))
    n_p = len(re.findall(shuffles, plan_plain.split("\n\n")[0]))
    assert n_b == n_p - 1, (n_b, n_p)

    # cumulative: bucketed in + bucketed out unions both epochs' keepers
    o3, idx3 = str(tmp_path / "o3"), str(tmp_path / "idx3")
    run(["--input", e2, "--output", o3, "--sig-index-in", idx_b,
         "--sig-index-out", idx3, "--sig-index-format", "bucketed",
         "--index-buckets", "8"])
    m3 = spark.read.parquet(f"{idx3}/meta").collect()[0]
    ids3 = {r["doc_id"] for r in spark.read.parquet(f"{idx3}/banded")
            .select("doc_id").distinct().collect()}
    assert m3["format"] == "bucketed"
    assert ids3 == set(range(24)) | {300}
