"""Recall-parity soak: MinHash kernel="poly" vs kernel="xxh".

SURVEY §7.4 candidate (e) gate — PASSED (BENCH/soak_sigkernel_d4.json:
max drift 0.0026 over 6 seeded runs): the polynomial Arrow signature
kernel (~2x throughput, zero-Exchange — `dedup.minhash_signatures`) is
now the DEFAULT for the incremental-index probe (`jobs/dedup_corpus.py`)
and the curate near-dup stage (`jobs/curate_corpus.py`); this soak is
the evidence and stays runnable as the regression gate.  Both kernels
are independent uniform 64-bit hash families over the same n-gram set,
so Pr[min collision] = J holds for each; this soak measures that the
EMPIRICAL banding recall agrees — across seeds, corpora shapes, and
thresholds — rather than trusting the analysis.

Method (per seed x threshold):
  1. synthesize a corpus with planted near-duplicate pairs whose TRUE
     Jaccard spans the banding curve's sensitive region (mutation rates
     from 0 to ~0.35 over 20-400-token docs; multiple token
     distributions incl. a low-entropy "boilerplate" stratum, repeated
     tokens, short docs, unicode);
  2. ground truth = exact all-pairs `ngram_jaccard_pairs` (no candidate
     restriction) at the threshold;
  3. per kernel, run the full gated discovery path
     `minhash_lsh_dedup_pairs` (verify is exact either way, so found
     pairs are a SUBSET of ground truth; recall = found / truth);
  4. report aggregate + per-Jaccard-bucket recall for both kernels and
     the drift |recall_poly - recall_xxh|.

Pass criterion (printed as `"pass"`): aggregate drift <= 0.02 per
(seed, threshold) run, and per-bucket drift <= 0.05 wherever the bucket
holds >= 40 true pairs.  Writes the full record to
BENCH/soak_sigkernel_d4.json and prints one compact JSON line.

Run:  python tools/soak_sigkernel.py [--seeds 3] [--docs 1500]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = [(0.80, 0.85), (0.85, 0.90), (0.90, 0.95), (0.95, 1.001)]


def make_corpus(seed: int, n_docs: int):
    """Deterministic corpus with planted near-dups at known mutation rates.

    Strata (per base doc, round-robin):
      - "web":   400-word vocab, length lognormal 20..400 tokens
      - "boiler": 40-word vocab (low entropy, shared shingles across
                  unrelated docs — stresses candidate precision)
      - "uni":   unicode tokens, short docs 8..40 tokens
    ~45%% of docs are mutated copies of an earlier base doc: each token
    independently replaced with prob m, m cycling through
    [0.0, 0.02, 0.05, 0.1, 0.2, 0.35] (spans true Jaccard ~1.0 down to
    well below any threshold).  Returns list[(doc_id, text)].
    """
    rng = np.random.default_rng(np.random.SeedSequence([909, seed]))
    vocab_web = np.array([f"w{i:03d}" for i in range(400)])
    vocab_boiler = np.array([f"b{i:02d}" for i in range(40)])
    vocab_uni = np.array([f"été{i}" for i in range(120)]
                         + [f"中文{i}" for i in range(120)])
    rates = [0.0, 0.02, 0.05, 0.1, 0.2, 0.35]

    docs: list[tuple[int, str]] = []
    bases: list[np.ndarray] = []
    n_base = int(n_docs * 0.55)
    for i in range(n_base):
        kind = i % 3
        if kind == 0:
            vocab = vocab_web
            n = int(np.clip(rng.lognormal(4.0, 0.8), 20, 400))
        elif kind == 1:
            vocab = vocab_boiler
            n = int(np.clip(rng.lognormal(3.5, 0.6), 15, 200))
        else:
            vocab = vocab_uni
            n = int(rng.integers(8, 41))
        toks = rng.choice(vocab, size=n)
        bases.append(toks)
        docs.append((i, " ".join(toks)))
    next_id = n_base
    k = 0
    while next_id < n_docs:
        src = bases[int(rng.integers(0, len(bases)))]
        m = rates[k % len(rates)]
        k += 1
        toks = src.copy()
        if m > 0:
            flip = rng.random(len(toks)) < m
            toks[flip] = rng.choice(vocab_web, size=int(flip.sum()))
        docs.append((next_id, " ".join(toks)))
        next_id += 1
    return docs


def run_one(spark, docs, threshold: float):
    from pyspark.sql import functions as F

    from sketchlib.spark.dedup import minhash_lsh_dedup_pairs, ngram_jaccard_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string") \
        .repartition(16).cache()
    df.count()
    truth = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold).collect()
    }
    out = {"threshold": threshold, "n_truth": len(truth), "kernels": {}}
    found_sets = {}
    for kernel in ("xxh", "poly"):
        t0 = time.time()
        found = {
            (r["a_id"], r["b_id"])
            for r in minhash_lsh_dedup_pairs(
                df, threshold, kernel=kernel).select("a_id", "b_id").collect()
        }
        assert found <= set(truth), "verify must make found ⊆ truth"
        found_sets[kernel] = found
        rec = {"recall": round(len(found) / max(len(truth), 1), 4),
               "n_found": len(found), "sec": round(time.time() - t0, 2),
               "buckets": {}}
        for lo, hi in BUCKETS:
            in_b = {p for p, j in truth.items() if lo <= j < hi}
            hit = len(in_b & found)
            rec["buckets"][f"[{lo},{hi})"] = {
                "n": len(in_b),
                "recall": round(hit / len(in_b), 4) if in_b else None,
            }
        out["kernels"][kernel] = rec
    df.unpersist()
    xxh, poly = out["kernels"]["xxh"], out["kernels"]["poly"]
    out["drift"] = round(abs(poly["recall"] - xxh["recall"]), 4)
    out["sym_diff"] = len(found_sets["xxh"] ^ found_sets["poly"])
    bucket_drifts = []
    for key in xxh["buckets"]:
        bx, bp = xxh["buckets"][key], poly["buckets"][key]
        if bx["n"] >= 40:
            bucket_drifts.append(abs((bp["recall"] or 0) - (bx["recall"] or 0)))
    out["max_bucket_drift"] = round(max(bucket_drifts), 4) if bucket_drifts else None
    out["ok"] = out["drift"] <= 0.02 and (
        out["max_bucket_drift"] is None or out["max_bucket_drift"] <= 0.05)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--docs", type=int, default=1500)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    from sketchlib.spark.session import get_spark

    spark = get_spark("soak-sigkernel", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    runs = []
    for seed in range(1, args.seeds + 1):
        docs = make_corpus(seed, args.docs)
        for threshold in (0.7, 0.8):
            r = run_one(spark, docs, threshold)
            r["seed"] = seed
            runs.append(r)
            print(f"# seed={seed} t={threshold} truth={r['n_truth']} "
                  f"xxh={r['kernels']['xxh']['recall']} "
                  f"poly={r['kernels']['poly']['recall']} "
                  f"drift={r['drift']} ok={r['ok']}", file=sys.stderr)
    spark.stop()

    record = {
        "what": "minhash kernel recall-parity soak (poly vs xxh), "
                "full gated discovery path, exact all-pairs ground truth",
        "docs_per_seed": args.docs,
        "runs": runs,
        "pass": all(r["ok"] for r in runs),
        "agg": {
            k: round(float(np.mean([r["kernels"][k]["recall"] for r in runs])), 4)
            for k in ("xxh", "poly")
        },
        "max_drift": max(r["drift"] for r in runs),
    }
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "soak_sigkernel_d4.json"), "w") as f:
        json.dump(record, f, indent=1)
    compact = {k: record[k] for k in ("pass", "agg", "max_drift")}
    compact["n_runs"] = len(runs)
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
