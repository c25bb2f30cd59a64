"""Production job: deterministic corpus sampling / mixture curation — the
training-data pipeline's spark-submit sampling entry point.

    spark-submit --master <cluster> --py-files dist/sketchlib.zip \
        jobs/sample_corpus.py \
        --input s3://.../pages/ --output /warehouse/sampled \
        --strata-col lang --id-col doc_id \
        --rates '{"en": 0.25, "zh": 0.5}' [--default-rate 1.0]

    # or solve the rates from a target MIXTURE:
    ... --target-props '{"en": 0.5, "de": 0.3, "fr": 0.2}' --target-rows 1000000

    # per-SITE quota on a web corpus: derive the registrable domain from a
    # url column (pure codegen) and cap on it before the mixture solve
    ... --domain-from url --cap-key domain --cap-k 100000

Two modes, both hash-deterministic (membership is a pure function of the
row id — reproducible on any cluster layout, any engine; see
``sketchlib.spark.sampling``):

- ``--rates``: explicit per-stratum keep fractions → one codegen'd filter
  on the scan, NO shuffle; 100 TB costs one pass.
- ``--target-props`` + ``--target-rows``: the curriculum-mixture solver.
  One cheap JVM ``groupBy(strata).count()`` gives per-stratum sizes; the
  keep rate for stratum s is ``min(1, props[s]·target_rows / count[s])``
  (a stratum short of its quota is kept whole and the job reports the
  achieved mixture honestly rather than silently re-normalizing).  Strata
  absent from the target get rate 0 — a mixture spec is exhaustive.

Because hash sampling is monotone in the rate, re-running with a smaller
budget keeps a strict subset of the previous sample — curriculum phases
never churn already-selected documents.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def solve_rates(
    counts: dict[str, int], props: dict[str, float], target_rows: int
) -> dict[str, float]:
    """Per-stratum keep rates hitting ``props``·``target_rows`` rows where
    possible; clamped to 1.0 where the stratum is too small (reported, not
    re-normalized)."""
    rates = {}
    for s, p in props.items():
        have = counts.get(s, 0)
        want = p * target_rows
        rates[s] = 1.0 if have == 0 else min(1.0, want / have)
    return rates


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--strata-col", default="lang")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--rates", default=None,
                    help="JSON {stratum: keep fraction}")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--target-props", default=None,
                    help="JSON {stratum: mixture proportion}; with "
                         "--target-rows, solves the rates")
    ap.add_argument("--target-rows", type=int, default=None)
    ap.add_argument("--cap-key", default=None,
                    help="apply a per-key quota cap BEFORE sampling (e.g. "
                         "source/host: anti-monoculture rule)")
    ap.add_argument("--cap-k", type=int, default=None,
                    help="max rows kept per --cap-key value")
    ap.add_argument("--domain-from", default=None, metavar="URL_COL",
                    help="derive a 'domain' column (registrable eTLD+1 of "
                         "the URL column, pure codegen) usable as "
                         "--cap-key domain / --strata-col domain — the "
                         "per-site quota key of a web corpus")
    args = ap.parse_args()
    if (args.cap_key is None) != (args.cap_k is None):
        ap.error("--cap-key and --cap-k go together")
    if (args.rates is None) == (args.target_props is None):
        ap.error("exactly one of --rates / --target-props is required")
    if args.target_props is not None and args.target_rows is None:
        ap.error("--target-props requires --target-rows")

    from pyspark.sql import functions as F

    from sketchlib.spark.session import job_session

    from sketchlib.spark.sampling import cap_per_key, stratified_hash_sample

    spark = job_session("sketchlib-sample-corpus")
    spark.sparkContext.setLogLevel("WARN")
    df = spark.read.parquet(args.input)
    t0 = time.time()
    if args.domain_from is not None:
        from sketchlib.spark.textops import registrable_domain, url_host

        df = df.withColumn(
            "domain", registrable_domain(url_host(args.domain_from)))
    if args.cap_key is not None:
        # quota first, then mixture: the rate solver must see the capped
        # per-stratum counts or the achieved mixture would overshoot
        df = cap_per_key(df, args.cap_key, args.cap_k, id_col=args.id_col)

    default_rate = args.default_rate
    if args.rates is not None:
        rates = {k: float(v) for k, v in json.loads(args.rates).items()}
    else:
        props = {k: float(v) for k, v in json.loads(args.target_props).items()}
        counts = {
            r[args.strata_col]: r["c"]
            for r in df.groupBy(args.strata_col).agg(F.count("*").alias("c")).collect()
        }
        rates = solve_rates(counts, props, args.target_rows)
        default_rate = 0.0  # a mixture spec is exhaustive

    sampled = stratified_hash_sample(
        df, rates, args.strata_col, args.id_col, default_rate=default_rate
    )
    sampled.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    achieved = {
        r[args.strata_col]: r["c"]
        for r in out.groupBy(args.strata_col).agg(F.count("*").alias("c")).collect()
    }
    total = sum(achieved.values())
    print(json.dumps({
        "rows": total,
        "rates": rates,
        "achieved_mixture": {
            k: round(v / total, 4) for k, v in sorted(achieved.items())
        } if total else {},
        "wall_sec": round(time.time() - t0, 2),
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
