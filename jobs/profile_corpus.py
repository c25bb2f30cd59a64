"""Production job: one-pass corpus profile — build N sketch families per
group from ONE scan and write the sketch rows to parquet (the storable
profile other jobs, dashboards, and drift monitors query at KB cost).

    spark-submit --master <cluster> --py-files dist/sketchlib.zip \
        jobs/profile_corpus.py \
        --input s3://.../pages/ --output /warehouse/profile \
        [--keys lang] [--specs '<JSON list>'] [--wide]

Default specs (the standard corpus profile): discrete t-digest of text
length (exact quantiles/CDF), HLL p14 of url (distinct pages), count-min
16384x5 of url (per-url frequency probes), Misra-Gries m=64 of url
(frequent items).  Override with ``--specs`` using
``sketchlib.spark.sketch_ops.profile_aggregate``'s spec format:
``[{"name": ..., "col": ..., "kind": tdigest|hll|cms|bloom|kll|kmv|mg|dd,
"params": {...}}, ...]``.

At 100 TB the scan IS the job, so the one-pass profile costs ~1/N of the
dedicated per-family builds (measured 1.98x at 8M rows locally where the
Python sketch CPU shares the scan; BENCH/BASELINE.md).  Output is the
long format (keys, sk_name, sketch binary) — pass ``--wide`` to pivot one
binary column per family (KB-scale pivot over sketch rows only).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

DEFAULT_SPECS = [
    {"name": "td_len", "col": "__n_chars", "kind": "tdigest",
     "params": {"discrete": True}},
    {"name": "hll_url", "col": "url", "kind": "hll", "params": {"p": 14}},
    {"name": "cms_url", "col": "url", "kind": "cms",
     "params": {"width": 16384, "depth": 5}},
    {"name": "mg_url", "col": "url", "kind": "mg", "params": {"m": 64}},
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--keys", default="lang",
                    help="comma-separated grouping columns")
    ap.add_argument("--specs", default=None,
                    help="JSON list of sketch specs (default: td/HLL/CMS/MG)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--wide", action="store_true",
                    help="pivot to one binary column per sketch family")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sketchlib.spark.session import job_session

    from sketchlib.spark.sketch_ops import profile_aggregate, profile_pivot

    spark = job_session("sketchlib-profile-corpus")
    spark.sparkContext.setLogLevel("WARN")
    keys = [k for k in args.keys.split(",") if k]
    specs = (json.loads(args.specs) if args.specs is not None
             else DEFAULT_SPECS)
    df = spark.read.parquet(args.input)
    if any(s["col"] == "__n_chars" for s in specs):
        df = df.withColumn(
            "__n_chars", F.length(args.text_col).cast("double"))
    t0 = time.time()

    prof = profile_aggregate(df, keys, specs)
    if args.wide:
        prof = profile_pivot(prof, keys, specs)
    prof.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    n_rows = out.count()
    total_bytes = None
    if not args.wide:
        total_bytes = out.agg(
            F.sum(F.length("sketch")).alias("b")).collect()[0]["b"]
    print(json.dumps({
        "groups_x_families" if not args.wide else "groups": n_rows,
        "families": len(specs),
        "keys": keys,
        "sketch_bytes_total": int(total_bytes) if total_bytes else None,
        "wall_sec": round(time.time() - t0, 2),
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
