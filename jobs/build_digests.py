"""Production job: build per-key t-digests over a table, checkpointed and
resumable — the spark-submit entry point of the north star.

    spark-submit --master <cluster> --py-files dist/sketchlib.zip \
        jobs/build_digests.py \
        --input  s3://.../pages/  --value-col n_chars --keys lang \
        --output /warehouse/digests  --checkpoint /warehouse/ckpt/run1 \
        --id-col doc_id  [--delta 0.01] [--n-parts 256]

Reads the input table, builds partial digests per logical partition with
per-partition lineage + metrics rows appended to the checkpoint location
(Iceberg table when a catalog is configured, parquet directory otherwise),
then finalizes: lossless union per key + one deterministic compress,
written to --output as (keys..., digest binary).  Killing and resubmitting
the same command resumes from the checkpoint: finished partitions are
skipped via a broadcast anti-join and the final digests are byte-identical
to an uninterrupted run.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--keys", required=True, help="comma-separated key columns")
    ap.add_argument("--value-col", required=True)
    ap.add_argument("--id-col", required=True,
                    help="stable row id used for deterministic partition hashing")
    ap.add_argument("--delta", type=float, default=0.01)
    ap.add_argument("--discrete", action="store_true")
    ap.add_argument("--n-parts", type=int, default=64)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--sketch", default="tdigest",
                    choices=["tdigest", "hll", "cms", "bloom", "kll", "kmv"],
                    help="sketch kind to build (default t-digest)")
    ap.add_argument("--sketch-params", default="{}",
                    help='JSON params for sibling sketches, e.g. \'{"p":14}\'')
    args = ap.parse_args()


    from sketchlib.spark.session import job_session

    # plain builder: master/conf come from spark-submit, not from code
    spark = job_session("sketchlib-build-digests")
    spark.sparkContext.setLogLevel("WARN")

    from sketchlib.spark.checkpoint import TDigestCheckpointer

    keys = args.keys.split(",")
    ck = TDigestCheckpointer(
        spark, args.checkpoint, keys, args.value_col, args.id_col,
        n_parts=args.n_parts, delta=args.delta, discrete=args.discrete,
        run_id=args.run_id, sketch=args.sketch,
        params=json.loads(args.sketch_params),
    )
    df = spark.read.parquet(args.input)
    t0 = time.time()
    n_done = ck.run(df)
    final = ck.finalize()
    final.write.mode("overwrite").parquet(args.output)
    print(json.dumps({
        "partitions_processed_this_run": n_done,
        "keys": keys,
        "output": args.output,
        "wall_sec": round(time.time() - t0, 2),
        "rows_out": final.count(),
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
