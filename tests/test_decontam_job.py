"""jobs/decontaminate_corpus.py: flag + filter modes end-to-end against a
pure-python n-gram overlap oracle."""

import json
import sys

import pytest

from tests.conftest import SF_SMALL

pytestmark = pytest.mark.spark


def _py_contaminated(train_rows, eval_rows, ngram):
    def grams(text):
        toks = [w for w in (text or "").split(" ") if w] if text is not None else []
        if text is None:
            return set()
        if len(toks) < ngram:
            return {text}
        return {" ".join(toks[i:i + ngram]) for i in range(len(toks) - ngram + 1)}

    ev = set()
    for _, t in eval_rows:
        ev |= grams(t)
    out = {}
    for i, t in train_rows:
        g = grams(t)
        hits = len(g & ev)
        out[i] = (len(g) if g else 1, hits)
    return out


def test_decontaminate_job_both_modes(spark, tmp_path, monkeypatch):
    sys.path.insert(0, "jobs")
    import decontaminate_corpus as job

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text")
    train_df = docs.filter("doc_id % 23 != 0")
    eval_df = docs.filter("doc_id % 23 = 0")
    train_path, eval_path = str(tmp_path / "train"), str(tmp_path / "eval")
    train_df.write.parquet(train_path)
    eval_df.write.parquet(eval_path)

    oracle = _py_contaminated(
        [(r["doc_id"], r["text"]) for r in train_df.collect()],
        [(r["doc_id"], r["text"]) for r in eval_df.collect()],
        ngram=4,
    )
    want_bad = {i for i, (n, h) in oracle.items() if h > 0}

    # main() ends with spark.stop(); neutralize it — the session fixture
    # is shared across the test module
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    # flag mode: per-doc stats table matches the python oracle exactly
    out_flag = str(tmp_path / "flagged")
    monkeypatch.setattr(sys, "argv", [
        "job", "--train", train_path, "--eval", eval_path,
        "--output", out_flag, "--ngram", "4", "--mode", "flag"])
    capture = []
    monkeypatch.setattr("builtins.print", lambda s: capture.append(s))
    job.main()
    report = json.loads(capture[-1])
    assert report["contaminated_rows"] == len(want_bad)
    got = {r["doc_id"]: (r["n_ngrams"], r["n_hits"])
           for r in spark.read.parquet(out_flag).collect()}
    assert got == oracle

    # filter mode: output is exactly train minus contaminated ids
    out_filter = str(tmp_path / "clean")
    monkeypatch.setattr(sys, "argv", [
        "job", "--train", train_path, "--eval", eval_path,
        "--output", out_filter, "--ngram", "4", "--mode", "filter"])
    job.main()
    report = json.loads(capture[-1])
    clean_ids = {r["doc_id"]
                 for r in spark.read.parquet(out_filter).collect()}
    all_ids = set(oracle)
    assert clean_ids == all_ids - want_bad
    assert report["contaminated_rows"] == len(want_bad)


def test_decontaminate_job_bloom_engine(spark, tmp_path, monkeypatch):
    """--engine bloom: zero false negatives (every doc the exact engine
    drops is dropped), extra drops fpr-bounded (none at fpr 1e-6 on this
    corpus), flag mode emits the graded overlap columns."""
    sys.path.insert(0, "jobs")
    import decontaminate_corpus as job

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text")
    train_df = docs.filter("doc_id % 23 != 0")
    eval_df = docs.filter("doc_id % 23 = 0")
    train_path, eval_path = str(tmp_path / "train"), str(tmp_path / "eval")
    train_df.write.parquet(train_path)
    eval_df.write.parquet(eval_path)

    oracle = _py_contaminated(
        [(r["doc_id"], r["text"]) for r in train_df.collect()],
        [(r["doc_id"], r["text"]) for r in eval_df.collect()],
        ngram=4,
    )
    want_bad = {i for i, (n, h) in oracle.items() if h > 0}

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    capture = []
    monkeypatch.setattr("builtins.print", lambda s: capture.append(s))

    out_filter = str(tmp_path / "clean_bloom")
    monkeypatch.setattr(sys, "argv", [
        "job", "--train", train_path, "--eval", eval_path,
        "--output", out_filter, "--ngram", "4", "--mode", "filter",
        "--engine", "bloom", "--bloom-fpr", "1e-6"])
    job.main()
    report = json.loads(capture[-1])
    assert report["engine"] == "bloom"
    clean_ids = {r["doc_id"]
                 for r in spark.read.parquet(out_filter).collect()}
    # zero FN: nothing the exact oracle drops survives
    assert not (clean_ids & want_bad)
    # at fpr 1e-6 on 500 docs no false positive fires -> exact agreement
    assert clean_ids == set(oracle) - want_bad

    out_flag = str(tmp_path / "flag_bloom")
    monkeypatch.setattr(sys, "argv", [
        "job", "--train", train_path, "--eval", eval_path,
        "--output", out_flag, "--ngram", "4", "--mode", "flag",
        "--engine", "bloom", "--bloom-fpr", "1e-6"])
    job.main()
    got = spark.read.parquet(out_flag)
    assert {"n_windows", "n_hits", "overlap_ratio", "contaminated"} <= set(
        got.columns)
    graded = {r["doc_id"]: r for r in got.collect()}
    # window-grain hits imply the exact path's distinct-gram hits and
    # vice versa (same n-gram universe)
    assert {i for i, r in graded.items() if r["n_hits"] > 0} == want_bad


def _py_jaccard(a, b, n=3):
    def sh(t):
        toks = [w for w in (t or "").split(" ") if w]
        if len(toks) < n:
            return {t}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_decontaminate_job_fuzzy_engine(spark, tmp_path, monkeypatch):
    """--engine fuzzy: the near-dup pass drops exactly the train docs with
    Jaccard >= threshold vs any eval doc (brute-force python oracle);
    flag mode emits per-doc match stats."""
    sys.path.insert(0, "jobs")
    import decontaminate_corpus as job

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text")
    train_df = docs.filter("doc_id % 5 != 0")
    eval_df = docs.filter("doc_id % 5 = 0")
    train_path, eval_path = str(tmp_path / "train"), str(tmp_path / "eval")
    train_df.write.parquet(train_path)
    eval_df.write.parquet(eval_path)

    train_rows = {r["doc_id"]: r["text"] for r in train_df.collect()}
    eval_rows = {r["doc_id"]: r["text"] for r in eval_df.collect()}
    want_bad = {
        t for t, tt in train_rows.items()
        if any(_py_jaccard(tt, et) >= 0.8 for et in eval_rows.values())
    }
    assert want_bad  # the planted near-dups straddle the split

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    capture = []
    monkeypatch.setattr("builtins.print", lambda s: capture.append(s))

    out_filter = str(tmp_path / "clean_fuzzy")
    monkeypatch.setattr(sys, "argv", [
        "job", "--train", train_path, "--eval", eval_path,
        "--output", out_filter, "--ngram", "3", "--mode", "filter",
        "--engine", "fuzzy", "--fuzzy-threshold", "0.8"])
    job.main()
    report = json.loads(capture[-1])
    assert report["engine"] == "fuzzy"
    assert report["contaminated_rows"] == len(want_bad)
    clean_ids = {r["doc_id"]
                 for r in spark.read.parquet(out_filter).collect()}
    assert clean_ids == set(train_rows) - want_bad

    out_flag = str(tmp_path / "flag_fuzzy")
    monkeypatch.setattr(sys, "argv", [
        "job", "--train", train_path, "--eval", eval_path,
        "--output", out_flag, "--ngram", "3", "--mode", "flag",
        "--engine", "fuzzy", "--fuzzy-threshold", "0.8"])
    job.main()
    got = {r["doc_id"]: r for r in spark.read.parquet(out_flag).collect()}
    assert set(got) == want_bad
    for r in got.values():
        assert r["n_eval_matches"] >= 1 and r["max_sim"] >= 0.8
