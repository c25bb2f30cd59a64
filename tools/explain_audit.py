"""Physical-plan audit: assert the plans we designed are the plans we got.

Checks, per key operator (at sf0.01, plans only — nothing executes):
- column pruning reaches the parquet scan (ReadSchema contains only the
  narrow columns, never `text`/`html` when the op doesn't need them);
- predicate pushdown shows up as PushedFilters;
- the lang-ID profile join and the resume anti-join are BroadcastHashJoins;
- whole-stage codegen covers the JVM-side ops (textops/dedup have no
  Python stage before the final aggregation).

Usage: python tools/explain_audit.py [sf_dir]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAIL = []


def check(name: str, plan: str, must: list[str], must_not: list[str] = ()):  # noqa
    ok = True
    for pat in must:
        if not re.search(pat, plan):
            FAIL.append(f"{name}: MISSING {pat!r}")
            ok = False
    for pat in must_not:
        if re.search(pat, plan):
            FAIL.append(f"{name}: UNEXPECTED {pat!r}")
            ok = False
    print(f"{name:40s} {'OK' if ok else 'FAIL'}")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from sketchlib.spark.session import get_spark
    from sketchlib.spark.tdigest_ops import tdigest_aggregate, tdigest_partials

    spark = get_spark("explain-audit", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. digest build: scan must read only (lang, n_chars) — not text
    p = plan_of(tdigest_partials(docs, ["lang"], "n_chars", 0.01))
    check("tdigest partials column pruning", p,
          must=[r"ReadSchema:.*lang.*n_chars|ReadSchema:.*n_chars.*lang"],
          must_not=[r"ReadSchema:[^\n]*text", r"Exchange"])

    # 2. filtered build: predicate pushed to the scan
    p = plan_of(
        tdigest_partials(docs.filter(F.col("lang") == "en"), ["lang"], "n_chars", 0.01)
    )
    check("filter pushdown to parquet", p, must=[r"PushedFilters: \[[^\]]*EqualTo\(lang,en\)"])

    # 3. full two-phase agg: exactly ONE exchange (the digest-row shuffle)
    p = plan_of(tdigest_aggregate(docs, ["lang"], "n_chars", 0.01))
    n_exch = len(re.findall(r"\(\d+\) Exchange", p))
    print(f"{'two-phase agg shuffle count':40s} {'OK' if n_exch == 1 else 'FAIL'} ({n_exch})")
    if n_exch != 1:
        FAIL.append(f"two-phase agg: {n_exch} shuffles, want 1")

    # 4. lang-ID: profile join is broadcast, tokens never shuffle with text
    from sketchlib.spark.textops import lang_id_confusion

    p = plan_of(lang_id_confusion(docs))
    check("lang-ID broadcast profile join", p, must=[r"BroadcastHashJoin"])

    # 5. textops stay JVM-side: no Python evaluation anywhere
    from sketchlib.spark.textops import token_stats

    p = plan_of(token_stats(docs))
    check("token_stats pure JVM (no Python)", p,
          must=[r"codegen id"],
          must_not=[r"ArrowEvalPython|BatchEvalPython|MapInPandas"])

    # 6. dedup minhash signatures: JVM aggregates, no Python stage
    from sketchlib.spark.dedup import minhash_signatures

    p = plan_of(minhash_signatures(docs))
    check("minhash signatures pure JVM", p,
          must=[r"HashAggregate"],
          must_not=[r"ArrowEvalPython|BatchEvalPython|MapInPandas"])

    # 7. checkpoint resume: anti-join against completed parts is broadcast
    from sketchlib.spark.checkpoint import TDigestCheckpointer

    ck = TDigestCheckpointer(spark, "/tmp/_audit_ckpt", ["lang"], "n_chars",
                             "doc_id", n_parts=8)
    tagged = ck._with_part_id(docs.select("doc_id", "lang", "n_chars"))
    done = spark.createDataFrame([(0,)], "part_id int")
    pending = tagged.join(
        F.broadcast(done.withColumnRenamed("part_id", "_part_id")),
        "_part_id", "left_anti")
    p = plan_of(pending)
    check("resume anti-join broadcast", p, must=[r"BroadcastHashJoin.*LeftAnti|BroadcastNestedLoop.*LeftAnti"])

    spark.stop()
    print()
    if FAIL:
        print("FAILURES:")
        for f in FAIL:
            print(" -", f)
        sys.exit(1)
    print("all plan checks passed")


if __name__ == "__main__":
    main()
