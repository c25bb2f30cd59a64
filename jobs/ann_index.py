"""Production job: stored IVF index over an embedding table — build once,
probe forever with partition-pruned scans.

    # build: train the coarse quantizer and persist the index
    spark-submit --master <cluster> --py-files dist/sketchlib.zip \
        jobs/ann_index.py build \
        --input s3://.../embeddings/ --index /warehouse/ann_ivf \
        [--n-lists 1024] [--sample 65536] [--id-col vec_id] \
        [--vec-col embedding]

    # append: assign NEW vectors with the stored centroids (no retrain,
    # no rescan of existing vectors) and append to their list partitions
    spark-submit ... jobs/ann_index.py append \
        --input s3://.../embeddings_day2/ --index /warehouse/ann_ivf

    # probe: top-k neighbors for a table of query vectors
    spark-submit ... jobs/ann_index.py probe \
        --index /warehouse/ann_ivf --queries s3://.../new_vectors/ \
        --output /warehouse/neighbors [--k 10] [--nprobe 32]

Scale design (``sketchlib.spark.ann.write_ivf_index`` /
``ivf_topk_vs_index``): vectors are stored ``partitionBy(list_id)``, so a
probe's scan is partition-pruned to its ``nprobe`` lists — the I/O
fraction is structurally ~nprobe/n_lists of the collection at any size.
Training is a deterministic driver-side sample (rebuild from identical
input ⇒ identical index); assignment is one broadcast matmul per Arrow
batch.  Queries need not be index members.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "append", "probe"])
    ap.add_argument("--index", required=True)
    ap.add_argument("--input")
    ap.add_argument("--queries")
    ap.add_argument("--output")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--n-lists", type=int, default=16)
    ap.add_argument("--sample", type=int, default=2048)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=4)
    args = ap.parse_args()

    from sketchlib.spark.session import job_session

    spark = job_session("sketchlib-ann-index")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    if args.mode == "append":
        if not args.input:
            ap.error("append requires --input")
        from sketchlib.spark.ann import append_to_ivf_index

        df = spark.read.parquet(args.input)
        append_to_ivf_index(df, args.index,
                            id_col=args.id_col, vec_col=args.vec_col)
        report = {
            "mode": "append",
            "n_appended": df.count(),
            "n_vectors": spark.read.parquet(f"{args.index}/vectors").count(),
            "index": args.index,
        }
    elif args.mode == "build":
        if not args.input:
            ap.error("build requires --input")
        from sketchlib.spark.ann import write_ivf_index

        df = spark.read.parquet(args.input)
        cent = write_ivf_index(
            df, args.index, n_lists=args.n_lists, sample=args.sample,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        report = {
            "mode": "build",
            "n_lists": int(cent.shape[0]),
            "dim": int(cent.shape[1]),
            "n_vectors": spark.read.parquet(f"{args.index}/vectors").count(),
            "index": args.index,
        }
    else:
        if not (args.queries and args.output):
            ap.error("probe requires --queries and --output")
        from sketchlib.spark.ann import ivf_topk_vs_index

        queries = spark.read.parquet(args.queries)
        out = ivf_topk_vs_index(
            spark, args.index, queries, k=args.k, nprobe=args.nprobe,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        out.write.mode("overwrite").parquet(args.output)
        report = {
            "mode": "probe",
            "k": args.k,
            "nprobe": args.nprobe,
            "n_queries": queries.count(),
            "n_result_rows": spark.read.parquet(args.output).count(),
            "output": args.output,
        }

    report["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
