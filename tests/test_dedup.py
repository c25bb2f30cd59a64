"""Dedup operators: exact, n-gram Jaccard, MinHash+LSH, SimHash."""

import itertools

import pytest

from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = [w for w in t.split(" ") if w]
        if len(toks) < n:
            return {t}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup_keepers(spark):
    from sketchlib.spark.dedup import exact_dedup_keepers

    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (5, "a b c"), (3, "x y z"), (9, "q")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keeper_id"], r["group_size"])
           for r in exact_dedup_keepers(df).collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 5: (5, 1), 9: (9, 1)}


def test_jaccard_pairs_match_bruteforce(spark):
    from sketchlib.spark.dedup import ngram_jaccard_pairs

    rows = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if _jaccard(rows[a], rows[b]) >= 0.8
    }
    got = {
        (r["a_id"], r["b_id"])
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.8).collect()
    }
    assert got == want
    assert len(got) > 0  # the corpus plants near-duplicates


def test_minhash_lsh_equals_exact_pairs(spark):
    """Discovery path (LSH) must find every planted near-dup: its verified
    output equals the exact-Jaccard pair set."""
    from sketchlib.spark.dedup import minhash_lsh_dedup_pairs, ngram_jaccard_pairs

    exact = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.8).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in minhash_lsh_dedup_pairs(_docs(spark), threshold=0.8).collect()
    }
    assert lsh == exact


def test_minhash_signature_partition_invariant(spark):
    from sketchlib.spark.dedup import minhash_signatures

    a = {r["doc_id"]: r["sig"] for r in minhash_signatures(_docs(spark)).collect()}
    b = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(_docs(spark).repartition(17)).collect()
    }
    assert a == b


def test_simhash_hamming_pairs_complete(spark):
    """Banded blocking must equal the brute-force cross join (pigeonhole
    completeness for hamming <= 3 over 4 bands)."""
    from sketchlib.spark.dedup import simhash_docs, simhash_hamming_pairs

    sigs = {r["doc_id"]: r["simhash"] for r in simhash_docs(_docs(spark)).collect()}
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_hamming_pairs(_docs(spark), max_dist=3).collect()
    }
    assert got == want


def test_simhash_matches_python(spark):
    """Spark simhash == pure-Python simhash (same md5-derived token hash)."""
    import hashlib

    from sketchlib.spark.dedup import SIMHASH_BITS, simhash_docs

    from pyspark.sql import functions as F

    rows = {r["doc_id"]: r["text"] for r in _docs(spark).limit(50).collect()}
    sub = _docs(spark).filter(F.col("doc_id").isin(list(rows)))
    got = {r["doc_id"]: r["simhash"] for r in simhash_docs(sub).collect()}

    for doc_id, text in rows.items():
        sums = [0] * SIMHASH_BITS
        for w in (w for w in text.split(" ") if w):
            hv = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            for j in range(SIMHASH_BITS):
                sums[j] += 1 if (hv >> j) & 1 else -1
        sig = sum(1 << j for j in range(SIMHASH_BITS) if sums[j] >= 0)
        assert got[doc_id] == sig, doc_id


def test_minhash_hash_family_distinct_and_64bit(spark):
    """The 64 minhash functions (xxhash64 seeded by index) must be pairwise
    distinct on real data, and the shingle space must be genuinely 64-bit —
    signature values far outside the old 2^31 Mersenne range must occur
    (negative min-hashes are the norm over signed int64)."""
    from sketchlib.spark.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sigs = [r["sig"] for r in minhash_signatures(docs).collect()]
    assert sigs and all(len(s) == 64 for s in sigs)
    # functions are distinct: no two signature positions identical everywhere
    import numpy as np

    m = np.array(sigs, dtype=np.int64)
    for i in range(64):
        for j in range(i + 1, 64):
            if (m[:, i] == m[:, j]).all():
                raise AssertionError(f"minhash functions {i} and {j} identical")
    # min of ~uniform int64 over many shingles is deep negative — far below
    # the old [0, 2^31) band
    assert m.min() < -(1 << 60)


def test_signlsh_auto_bands_bounds_random_candidates():
    """The chosen band width must keep EXPECTED random-pair candidates
    (C(n,2)·b·2^-w) under the 4-per-row budget at every corpus size, while
    never under-banding a corpus that could afford more recall."""
    from sketchlib.spark.ann import signlsh_auto_bands

    for n in (10_000, 1_000_000, 1_000_000_000):
        b, cap = signlsh_auto_bands(n, n_bits=64)
        w = 64 // b
        exp_cand = 0.5 * n * (n - 1) * b * 2.0 ** -w
        assert exp_cand <= 4.0 * n, (n, b, exp_cand)
        # the next-larger divisor band count must violate the budget
        # (i.e. we picked the max-recall feasible width)
        nxt = next((x for x in range(b + 1, 65) if 64 % x == 0), None)
        if nxt:
            wn = 64 // nxt
            assert 0.5 * n * (n - 1) * nxt * 2.0 ** -wn > 4.0 * n
        assert cap >= 256
    # measured rule from the 1M-vector sweep: 2 bands there
    assert signlsh_auto_bands(1_000_000)[0] == 2


def test_minhash_auto_bands_tracks_threshold():
    """Recall at the threshold must clear the target for the chosen b, and
    the hand-tuned default (b=16 at t=0.8, 64 perms) must be reproduced."""
    from sketchlib.spark.dedup import minhash_auto_bands

    for t in (0.5, 0.7, 0.8, 0.9, 0.95):
        b, cap = minhash_auto_bands(t, 64, 1_000_000)
        r = 64 // b
        recall = 1.0 - (1.0 - t ** r) ** b
        assert recall >= 0.9, (t, b, recall)
        assert cap == max(256, int(1_000_000 ** 0.5))
    assert minhash_auto_bands(0.8, 64)[0] == 16
    assert minhash_auto_bands(0.8, 64)[1] is None  # lossless default


def test_hot_bucket_cap_guards_skew(spark):
    """The max_bucket_size skew guard: with a boilerplate corpus that puts
    everything in the same band buckets, the capped simhash join must emit
    no pairs from the oversized buckets while the uncapped one explodes;
    and with the cap above the bucket sizes the result is unchanged."""
    from pyspark.sql import functions as F

    from sketchlib.spark.dedup import simhash_hamming_pairs

    rows = [(i, "common boilerplate template text repeated verbatim") for i in range(40)]
    rows += [(100 + i, f"unique document number {i} with distinct words {i*7}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = simhash_hamming_pairs(df, max_dist=3).count()
    assert uncapped >= 40 * 39 / 2  # the template clique explodes

    capped = simhash_hamming_pairs(df, max_dist=3, max_bucket_size=10).count()
    assert capped < uncapped

    # cap far above every bucket: identical to the exact result
    loose = simhash_hamming_pairs(df, max_dist=3, max_bucket_size=10_000)
    exact = simhash_hamming_pairs(df, max_dist=3)
    assert sorted(map(tuple, loose.collect())) == sorted(map(tuple, exact.collect()))


def test_lsh_hashed_verify_matches_string_verify(spark):
    """The scale mode (arithmetic shingle hashes in verification) must find
    exactly the same pair ids as string-exact verification on the planted
    near-dup corpus."""
    from sketchlib.spark.dedup import minhash_lsh_dedup_pairs

    s = {(r["a_id"], r["b_id"])
         for r in minhash_lsh_dedup_pairs(_docs(spark), threshold=0.8).collect()}
    h = {(r["a_id"], r["b_id"])
         for r in minhash_lsh_dedup_pairs(_docs(spark), threshold=0.8,
                                          hashed_verify=True).collect()}
    assert s == h and len(s) > 0


def test_hashed_shingles_null_text_matches_string_mode(spark):
    """NULL-text documents must produce no pairs in BOTH verification modes
    (xxhash64(NULL) hashes to the seed — without the guard every null-text
    pair would come back as an exact near-dup in hashed mode)."""
    from sketchlib.spark.dedup import minhash_lsh_dedup_pairs

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None), (4, "real document text body here")],
        "doc_id long, text string",
    )
    assert minhash_lsh_dedup_pairs(df, 0.8).count() == 0
    assert minhash_lsh_dedup_pairs(df, 0.8, hashed_verify=True).count() == 0


def test_contamination_hits_exact(spark):
    from sketchlib.spark.dedup import contamination_hits

    train = spark.createDataFrame(
        [(1, "en", "a b c d e f"),      # 4-grams: abcd bcde cdef
         (2, "en", "x y z w v"),        # xyzw yzwv -> no eval overlap
         (3, "de", "a b c d q q q q"),  # shares abcd with eval
         (4, "de", "t"),                # short: whole-text shingle "t"
         (5, "de", None)],              # NULL text: 1 null shingle, 0 hits
        "doc_id long, lang string, text string",
    )
    ev = spark.createDataFrame(
        [(100, "en", "a b c d e"),      # eval 4-grams: abcd bcde
         (101, "en", "t")],             # whole-text shingle "t"
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"]: r.asDict()
           for r in contamination_hits(train, ev, ngram=4, keep=["lang"]).collect()}
    assert got[1]["n_hits"] == 2 and got[1]["n_ngrams"] == 3
    assert got[1]["containment"] == 2 / 3
    assert got[2]["n_hits"] == 0
    assert got[3]["n_hits"] == 1  # abcd only; qqqq repeats dedup to 1 gram
    assert got[4]["n_hits"] == 1 and got[4]["containment"] == 1.0
    assert got[5]["n_hits"] == 0 and got[5]["n_ngrams"] == 1


def test_contamination_shuffle_join_same_result(spark):
    from sketchlib.spark.dedup import contamination_hits

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang", "text")
    import pyspark.sql.functions as F
    train = docs.filter(F.col("doc_id") % 23 != 0)
    ev = docs.filter(F.col("doc_id") % 23 == 0)
    a = sorted(map(tuple, contamination_hits(train, ev, ngram=4).collect()))
    b = sorted(map(tuple, contamination_hits(
        train, ev, ngram=4, broadcast_eval=False).collect()))
    assert a == b


def test_contamination_hashed_equals_string_mode(spark):
    from sketchlib.spark.dedup import contamination_hits

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang", "text")
    import pyspark.sql.functions as F
    train = docs.filter(F.col("doc_id") % 23 != 0)
    ev = docs.filter(F.col("doc_id") % 23 == 0)
    a = sorted(map(tuple, contamination_hits(train, ev, ngram=4).collect()))
    b = sorted(map(tuple, contamination_hits(
        train, ev, ngram=4, hashed=True).collect()))
    assert a == b  # 64-bit space: collisions impossible at this size


def test_bloom_decontam_empty_eval_corpus(spark):
    from sketchlib.spark.dedup import bloom_decontam_flags, eval_ngram_bloom

    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, None)], "doc_id long, text string")
    empty_ev = spark.createDataFrame([], "doc_id long, text string")
    blob = eval_ngram_bloom(empty_ev, ngram=3)
    flags = {r["doc_id"]: r["contaminated"]
             for r in bloom_decontam_flags(train, blob, ngram=3).collect()}
    assert flags == {1: False, 2: False}


def test_bloom_decontam_null_text_never_flagged(spark):
    """ADVICE r03: xxhash64(NULL) is the seed (42), not NULL — if NULL
    shingles are filtered AFTER hashing (or ingested on the eval side), a
    null-text eval doc makes every null-text train doc probe positive,
    diverging from the exact path whose equi-join drops NULLs.  NULLs must
    be stripped BEFORE hashing on both sides."""
    from sketchlib.spark.dedup import bloom_decontam_flags, eval_ngram_bloom

    # eval corpus CONTAINS a null-text doc -> its NULL shingle must not
    # enter the filter
    ev = spark.createDataFrame(
        [(100, "x y z w v"), (101, None)], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, "x y z w v")],
        "doc_id long, text string")
    blob = eval_ngram_bloom(ev, ngram=3, fpr=1e-4)
    flags = {r["doc_id"]: r["contaminated"]
             for r in bloom_decontam_flags(train, blob, ngram=3).collect()}
    # doc 3 shares eval 3-grams (true positive); docs 1 and 2 must be clean
    # (doc 2 is the null-text doc that previously probed with 42)
    assert flags == {1: False, 2: False, 3: True}


def test_dedup_group_best_keepers(spark):
    """quality policy: within each duplicate component the keeper is the
    best-score member (tie-break min id); singletons keep themselves;
    ascending=True flips for lower-is-better scores; NULL scores lose."""
    from sketchlib.spark.dedup import dedup_group_best_keepers

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (1, base, 0.2),             # group A (exact dup of 2, near-dup 3)
        (2, base, 0.9),             # best score in A -> keeper of A
        (3, base + "extra tail words here", 0.5),
        (10, "something entirely different and unique", 0.7),  # singleton
        (11, "x " * 100, None),     # group B with 12; NULL score loses
        (12, "x " * 100, 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    got = {r["id"]: r["keeper_id"] for r in dedup_group_best_keepers(
        df, "score", threshold=0.5).collect()}
    assert got[1] == got[2] == got[3] == 2
    assert got[10] == 10
    assert got[11] == got[12] == 12
    # lower-is-better: group A keeper flips to doc 1 (score 0.2)
    asc = {r["id"]: r["keeper_id"] for r in dedup_group_best_keepers(
        df, "score", threshold=0.5, ascending=True).collect()}
    assert asc[1] == asc[2] == asc[3] == 1
    assert asc[11] == asc[12] == 12  # NULL still loses under ascending


def test_lsh_index_incremental_equals_batch(spark, tmp_path):
    """Incremental law: candidates of a NEW crawl against a STORED banded
    index equal the cross (new x index) restriction of the union corpus's
    candidate pairs (cap off); the index round-trips through parquet; an
    empty new side yields zero candidates."""
    from sketchlib.spark.dedup import (
        banded_signatures,
        lsh_candidate_pairs,
        lsh_candidates_vs_index,
        minhash_signatures,
    )

    docs = _docs(spark)
    old = docs.filter("doc_id % 3 != 0")
    new = docs.filter("doc_id % 3 = 0")
    old_ids = {r["doc_id"] for r in old.select("doc_id").collect()}

    # stored index: signatures -> banded -> parquet -> reload
    idx_path = str(tmp_path / "lsh_index")
    banded_signatures(minhash_signatures(old)).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    got = {
        (r["new_id"], r["index_id"])
        for r in lsh_candidates_vs_index(
            banded_signatures(minhash_signatures(new)), index
        ).collect()
    }

    union_pairs = {
        (r["a_id"], r["b_id"])
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    want = {
        (b, a) if a in old_ids else (a, b)
        for a, b in union_pairs
        if (a in old_ids) != (b in old_ids)
    }
    assert got == want and got, (len(got), len(want))

    empty = new.filter("doc_id < 0")
    assert (
        lsh_candidates_vs_index(
            banded_signatures(minhash_signatures(empty)), index
        ).count()
        == 0
    )

    # prune="bloom" (map-side index-scan filter): EXACT same candidate set
    # (zero false negatives; Bloom false positives die in the equi-join),
    # an empty new side prunes everything, and the cap composes
    new_banded = banded_signatures(minhash_signatures(new))
    pruned = {
        (r["new_id"], r["index_id"])
        for r in lsh_candidates_vs_index(
            new_banded, index, prune="bloom"
        ).collect()
    }
    assert pruned == got
    assert (
        lsh_candidates_vs_index(
            banded_signatures(minhash_signatures(empty)), index, prune="bloom"
        ).count()
        == 0
    )
    capped = {
        (r["new_id"], r["index_id"])
        for r in lsh_candidates_vs_index(
            new_banded, index, max_bucket_size=3, prune="bloom"
        ).collect()
    }
    assert capped <= got
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown prune"):
        lsh_candidates_vs_index(new_banded, index, prune="nope")


def test_minhash_stateless_byte_identical(spark):
    """stateless=True (per-row array_min/transform, zero Exchange) yields
    byte-identical signatures to the explode+groupBy path, on any layout,
    including short-text and NULL-text docs."""
    from pyspark.sql import functions as F

    from sketchlib.spark.dedup import minhash_signatures

    docs = _docs(spark).unionByName(spark.createDataFrame(
        [(9001, None), (9002, "one"), (9003, "two words")],
        "doc_id long, text string").withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s")).withColumn("n_chars", F.lit(0)),
        allowMissingColumns=True)
    a = {r["doc_id"]: list(r["sig"])
         for r in minhash_signatures(docs).collect()}
    b = {r["doc_id"]: list(r["sig"])
         for r in minhash_signatures(docs, stateless=True).collect()}
    c = {r["doc_id"]: list(r["sig"])
         for r in minhash_signatures(
             docs.repartition(13), stateless=True).collect()}
    assert a == b == c
    # the stateless plan has no Exchange (the point: streaming-capable)
    plan = minhash_signatures(docs, stateless=True)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_streaming_vs_index_probe(spark, tmp_path):
    """Live-crawl near-dup probe: stateless signatures + banding + the
    stream-static equi-join against a STORED index run on a readStream;
    the per-micro-batch-deduped pair set equals the batch probe."""
    import os

    from sketchlib.spark.dedup import (
        banded_signatures,
        lsh_candidates_vs_index,
        minhash_signatures,
    )

    docs = _docs(spark)
    old = docs.filter("doc_id % 3 != 0")
    new = docs.filter("doc_id % 3 = 0").select("doc_id", "text")

    idx_path = str(tmp_path / "idx")
    banded_signatures(minhash_signatures(old)).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    batch = {
        (r["new_id"], r["index_id"])
        for r in lsh_candidates_vs_index(
            banded_signatures(minhash_signatures(new, stateless=True)), index
        ).collect()
    }

    src = str(tmp_path / "src")
    new.repartition(4).write.parquet(src)
    stream = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(src)
    cands = lsh_candidates_vs_index(
        banded_signatures(minhash_signatures(stream, stateless=True)),
        index, distinct=False)
    got = set()
    q = (cands.writeStream.outputMode("append")
         .foreachBatch(lambda bdf, _id: got.update(
             (r["new_id"], r["index_id"]) for r in bdf.collect())).start())
    q.processAllAvailable()
    q.stop()
    assert got == batch and got


def test_duplicate_span_stats_matches_python(spark):
    """duplicate_span_stats vs a brute-force python oracle of the same
    definition (fixed-window hashes, >= min_docs distinct docs, interval
    union), on planted shared spans: a 25-token block shared by docs 0/1,
    a 12-token block shared by docs 2/3 (span=10 catches it; span=20 must
    not), overlapping repeats inside one doc NOT flagged (distinct-doc
    rule), short and NULL docs."""
    import numpy as np

    from sketchlib.spark.dedup import duplicate_span_stats

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]

    def words(n):
        return list(rng.choice(vocab, n))

    block25 = words(25)
    block12 = words(12)
    docs = {
        0: words(30) + block25 + words(5),
        1: block25 + words(40),
        2: words(8) + block12 + words(3),
        3: words(20) + block12,
        4: words(50),                     # clean
        5: words(6) + words(6),           # short-ish, clean
        6: [],                            # empty
    }
    rows = [(i, " ".join(t) if t else None) for i, t in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def oracle(span):
        grams = {}
        for i, toks in docs.items():
            for p in range(len(toks) - span + 1):
                grams.setdefault(tuple(toks[p:p + span]), set()).add(i)
        dup = {g for g, ids in grams.items() if len(ids) >= 2}
        out = {}
        for i, toks in docs.items():
            pos = [p for p in range(len(toks) - span + 1)
                   if tuple(toks[p:p + span]) in dup]
            covered = set()
            for p in pos:
                covered.update(range(p, p + span))
            out[i] = (len(toks), len(pos), len(covered),
                      len(covered) / len(toks) if toks else 0.0)
        return out

    for span in (10, 20):
        got = {r["doc_id"]: (r["n_tokens"], r["n_dup_spans"],
                             r["dup_tokens"], r["dup_frac"])
               for r in duplicate_span_stats(df, span=span).collect()}
        want = oracle(span)
        assert got == want, (span, got, want)
    # layout determinism
    a = sorted(map(tuple, duplicate_span_stats(df, span=10).collect()))
    b = sorted(map(tuple,
                   duplicate_span_stats(df.repartition(5), span=10).collect()))
    assert a == b


def test_remove_duplicate_spans_matches_python(spark):
    """remove_duplicate_spans (the ExactSubstr REMOVAL half) vs a python
    oracle of the same definition, on the same planted corpus as the
    stats test: the shared 25-token block is excised from both docs
    (union of overlapping windows = the whole block), the 12-token block
    only at span=10, clean/short/NULL docs keep their ORIGINAL bytes, and
    keep_first=True retains every occurrence in the min-id owner."""
    import numpy as np

    from sketchlib.spark.dedup import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]

    def words(n):
        return list(rng.choice(vocab, n))

    block25 = words(25)
    block12 = words(12)
    docs = {
        0: words(30) + block25 + words(5),
        1: block25 + words(40),
        2: words(8) + block12 + words(3),
        3: words(20) + block12,
        4: words(50),
        5: words(6) + words(6),
        6: [],
    }
    rows = [(i, " ".join(t) if t else None) for i, t in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def oracle(span, keep_first):
        grams = {}
        for i, toks in docs.items():
            for p in range(len(toks) - span + 1):
                grams.setdefault(tuple(toks[p:p + span]), set()).add(i)
        dup = {g: min(ids) for g, ids in grams.items() if len(ids) >= 2}
        out = {}
        for i, toks in docs.items():
            covered = set()
            for p in range(len(toks) - span + 1):
                g = tuple(toks[p:p + span])
                if g in dup and not (keep_first and dup[g] == i):
                    covered.update(range(p, p + span))
            kept = [t for j, t in enumerate(toks) if j not in covered]
            clean = (" ".join(kept) if covered
                     else (" ".join(toks) if toks else None))
            out[i] = (clean, len(toks), len(covered),
                      len(toks) - len(covered))
        return out

    for span in (10, 20):
        for kf in (False, True):
            got = {
                r["doc_id"]: (r["text_clean"], r["n_tokens"],
                              r["dup_tokens"], r["n_kept_tokens"])
                for r in remove_duplicate_spans(
                    df, span=span, keep_first=kf).collect()
            }
            want = oracle(span, kf)
            assert got == want, (span, kf)

    # coverage counts agree with the stats operator (same definition)
    st = {r["doc_id"]: r["dup_tokens"]
          for r in duplicate_span_stats(df, span=10).collect()}
    rm = {r["doc_id"]: r["dup_tokens"]
          for r in remove_duplicate_spans(df, span=10).collect()}
    assert st == rm
    # with_stats: the single-pass form reproduces the full stats output
    st_full = {r["doc_id"]: (r["n_tokens"], r["n_dup_spans"],
                             r["dup_tokens"], r["dup_frac"])
               for r in duplicate_span_stats(df, span=10).collect()}
    ws = {r["doc_id"]: (r["n_tokens"], r["n_dup_spans"],
                        r["dup_tokens"], r["dup_frac"])
          for r in remove_duplicate_spans(
              df, span=10, with_stats=True).collect()}
    assert ws == st_full
    # layout determinism
    a = sorted(map(tuple, remove_duplicate_spans(df, span=10).collect()))
    b = sorted(map(tuple, remove_duplicate_spans(
        df.repartition(5), span=10).collect()))
    assert a == b


def test_ngram_containment_pairs_vs_python(spark):
    """measure="containment" vs a brute-force python oracle (max
    containment n_common/min(n_a,n_b) over 3-gram shingle SETS), and the
    asymmetry law the measure exists for: a short doc embedded verbatim in
    a long one scores containment 1.0 but Jaccard well under 0.8."""
    import numpy as np

    from sketchlib.spark.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]

    def words(n):
        return list(rng.choice(vocab, n))

    quote = words(12)                      # the embedded fragment
    docs = {
        0: quote,                          # short doc = the quote itself
        1: words(40) + quote + words(40),  # long doc embedding it
        2: words(30),
        3: words(30),
    }
    docs[3] = docs[2][:15] + words(15)     # partial overlap pair
    rows = [(i, " ".join(t)) for i, t in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def shingles(toks, n=3):
        return {" ".join(toks[p:p + n]) for p in range(len(toks) - n + 1)}

    def oracle(measure, thr):
        out = {}
        ids = sorted(docs)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                sa, sb = shingles(docs[a]), shingles(docs[b])
                c = len(sa & sb)
                if not c:
                    continue
                sim = (c / len(sa | sb) if measure == "jaccard"
                       else c / min(len(sa), len(sb)))
                if sim >= thr:
                    out[(a, b)] = (c, len(sa), len(sb), sim)
        return out

    for measure, thr in (("containment", 0.9), ("jaccard", 0.8),
                         ("containment", 0.3), ("jaccard", 0.2)):
        got = {(r["a_id"], r["b_id"]):
               (r["n_common"], r["n_a"], r["n_b"], r[measure])
               for r in ngram_jaccard_pairs(
                   df, thr, measure=measure).collect()}
        assert got == oracle(measure, thr), (measure, thr, got)
    # the asymmetry law: containment finds the quote pair, Jaccard cannot
    assert (0, 1) in oracle("containment", 0.9)
    assert (0, 1) not in oracle("jaccard", 0.8)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="measure"):
        ngram_jaccard_pairs(df, 0.5, measure="dice").collect()


def test_minhash_poly_kernel_invariants(spark):
    """kernel="poly" (token-hash-once + poly_window_fold + splitmix64
    minima in one Arrow projection): identical docs sign equal; empty and
    whitespace-only docs share the empty-sum shingle; NULL text yields a
    NULL signature; signatures are partitioning/batch-slicing invariant;
    the plan has zero Exchange; the matching-minima fraction estimates the
    window-set Jaccard (J=4/6 pair within a loose 4-sigma bound)."""
    from sketchlib.spark.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y"), (4, ""),
         (5, None), (6, "a b c d e f h"), (7, "   ")],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["sig"]
         for r in minhash_signatures(df, kernel="poly").collect()}
    assert s[1] == s[2] and len(s[1]) == 64
    assert s[4] == s[7]
    assert s[5] is None
    assert s[1] != s[3]
    est = sum(a == b for a, b in zip(s[1], s[6])) / 64
    assert abs(est - 4 / 6) < 0.25  # 4*sigma at num_perm=64
    s2 = {r["doc_id"]: r["sig"]
          for r in minhash_signatures(df.repartition(7),
                                      kernel="poly").collect()}
    assert s == s2
    plan = minhash_signatures(df, kernel="poly")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_minhash_poly_pipeline_matches_xxh(spark):
    """The verified LSH output is kernel-independent on the planted-dup
    corpus: candidates differ only by shingle-space/banding noise and the
    exact-Jaccard verification removes it."""
    from pyspark.sql import functions as F

    from sketchlib.spark.dedup import minhash_lsh_dedup_pairs

    docs = _docs(spark).unionByName(spark.createDataFrame(
        [(9001, None), (9002, "one"), (9003, "two words")],
        "doc_id long, text string").withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s")).withColumn("n_chars", F.lit(0)),
        allowMissingColumns=True)
    a = {(r["a_id"], r["b_id"])
         for r in minhash_lsh_dedup_pairs(docs, threshold=0.8).collect()}
    b = {(r["a_id"], r["b_id"])
         for r in minhash_lsh_dedup_pairs(docs, threshold=0.8,
                                          kernel="poly").collect()}
    assert a == b and a


def test_minhash_poly_streaming_equals_batch(spark, tmp_path):
    """kernel="poly" is a stateless projection: the SAME call runs on a
    readStream and emits byte-identical signatures to the batch run."""
    from sketchlib.spark.dedup import minhash_signatures

    new = _docs(spark).select("doc_id", "text")
    batch = {r["doc_id"]: r["sig"]
             for r in minhash_signatures(new, kernel="poly").collect()}

    src = str(tmp_path / "src")
    new.repartition(4).write.parquet(src)
    stream = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(src)
    got = {}
    q = (minhash_signatures(stream, kernel="poly")
         .writeStream.outputMode("append")
         .foreachBatch(lambda bdf, _id: got.update(
             (r["doc_id"], r["sig"]) for r in bdf.collect())).start())
    q.processAllAvailable()
    q.stop()
    assert got == batch and got


def test_minhash_poly_family_golden(spark):
    """The poly kernel's hash family is part of the STORED-INDEX format:
    indices record sig_kernel="poly" and a later probe signs with the same
    kernel, so any change to the family (window polynomial, splitmix mix,
    per-perm multipliers) silently zeroes every index hit.  Pin the first
    four signature values of a fixed doc — a deliberate family change must
    bump the kernel name (poly -> poly2) and update this golden."""
    from sketchlib.spark.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    sig = minhash_signatures(df, kernel="poly").collect()[0]["sig"]
    assert sig[:4] == [644659787054476853, 7947582341147907936,
                       699415566012630479, 4195368463979408032]


def test_minhash_unknown_kernel_raises(spark):
    from sketchlib.spark.dedup import minhash_signatures

    with pytest.raises(ValueError, match="unknown kernel"):
        minhash_signatures(_docs(spark), kernel="nope")


def test_bloom_overlap_stats(spark, tmp_path):
    """Graded corpus-overlap scoring: exact agreement with a driver-side
    recompute through the same kernels, consistency with the boolean flags
    probe, ratio exactly 1.0 for a doc that IS a reference doc, NULL ratio
    for null/empty text, and batch == readStream (stateless projection)."""
    import numpy as np
    import pyspark.sql.functions as F

    from sketchlib.bloom import Bloom
    from sketchlib.hashing import poly_window_fold, xxh64_long
    from sketchlib.spark.dedup import (
        bloom_decontam_flags,
        bloom_overlap_stats,
        eval_ngram_bloom,
    )

    ev = spark.createDataFrame(
        [(100, "a b c d e f"), (101, "x y z w v u t")],
        "doc_id long, text string")
    rows = [
        (1, "a b c d e f"),            # IS eval doc 100 -> ratio 1.0
        (2, "p q a b c d e r s t u"),  # one eval 5-gram among 7 windows
        (3, "m n o p q r s"),          # disjoint -> 0 (modulo fpr, tiny here)
        (4, None),                     # null text -> NULL ratio
        (5, ""),                       # empty text -> NULL ratio
        (6, "x y"),                    # short doc: ONE fallback window, miss
        (7, "x y z w v"),              # short-vs-5? 5 tokens = 1 window, hit
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    blob = eval_ngram_bloom(ev, ngram=5, fpr=1e-6)

    got = {r["doc_id"]: r for r in bloom_overlap_stats(
        train, blob, ngram=5).collect()}
    assert got[1]["overlap_ratio"] == 1.0 and got[1]["contaminated"]
    assert got[2]["n_windows"] == 7 and got[2]["n_hits"] == 1
    assert got[2]["overlap_ratio"] == 1.0 / 7.0
    assert got[3]["n_hits"] == 0 and not got[3]["contaminated"]
    assert got[4]["n_windows"] == 0 and got[4]["overlap_ratio"] is None
    assert got[5]["n_windows"] == 0 and got[5]["overlap_ratio"] is None
    assert got[6]["n_windows"] == 1 and got[6]["n_hits"] == 0
    # 5 tokens with n=5: exactly one full window, present in eval doc 101
    assert got[7]["n_windows"] == 1 and got[7]["overlap_ratio"] == 1.0

    # driver-side recompute through the same kernels (different plumbing):
    # JVM token hashes pulled via a plain select, then numpy fold + probe
    b = Bloom.deserialize(blob)
    tok = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.when(F.col("text").isNotNull(),
               F.transform(F.filter(F.split("text", " "),
                                    lambda w: w != ""),
                           lambda t: F.xxhash64(t))).alias("th"),
    ).collect()
    for r in tok:
        if r["th"] is None or len(r["th"]) == 0:
            assert got[r["doc_id"]]["n_windows"] == 0
            continue
        vals = np.array(r["th"], dtype=np.int64)
        offs = np.array([0, len(vals)], dtype=np.int64)
        win, _ = poly_window_fold(vals, offs, 5)
        hits = int(b.contains_hashed(xxh64_long(win)).sum())
        assert got[r["doc_id"]]["n_windows"] == len(win)
        assert got[r["doc_id"]]["n_hits"] == hits

    # boolean consistency with the flags probe on every >=1-token doc
    flags = {r["doc_id"]: r["contaminated"] for r in bloom_decontam_flags(
        train, blob, ngram=5).collect()}
    for did, r in got.items():
        if r["n_windows"] > 0:
            assert r["contaminated"] == flags[did]

    # stateless -> identical on a readStream
    src = str(tmp_path / "overlap_src")
    train.write.parquet(src)
    stream = spark.readStream.schema(train.schema).parquet(src)
    out = []
    q = bloom_overlap_stats(stream, blob, ngram=5).writeStream.outputMode(
        "append").foreachBatch(
        lambda bdf, _i: out.extend(bdf.collect())).start()
    q.processAllAvailable(); q.stop()
    streamed = {r["doc_id"]: r for r in out}
    assert {d: tuple(r) for d, r in streamed.items()} == {
        d: tuple(r) for d, r in got.items()}


def test_fuzzy_decontam_pairs_vs_bruteforce(spark):
    """Asymmetric LSH near-dup decontam equals the brute-force cross-split
    exact Jaccard pair set (recall ~1 on the planted near-dups)."""
    from sketchlib.spark.dedup import fuzzy_decontam_pairs

    docs = _docs(spark)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    train = {d: t for d, t in rows.items() if d % 5 != 0}
    ev = {d: t for d, t in rows.items() if d % 5 == 0}
    want = {
        (t, e)
        for t in train for e in ev
        if _jaccard(train[t], ev[e]) >= 0.8
    }
    import pyspark.sql.functions as F

    got_df = fuzzy_decontam_pairs(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
        threshold=0.8,
    )
    got = {(r["train_id"], r["eval_id"]): r for r in got_df.collect()}
    assert set(got) == want
    assert len(got) > 0  # the split straddles planted near-dups
    # stats are exact integers + one exact division
    for (t, e), r in got.items():
        assert r["n_common"] <= min(r["n_train"], r["n_eval"])
        assert r["jaccard"] == r["n_common"] / (
            r["n_train"] + r["n_eval"] - r["n_common"])


def test_fuzzy_decontam_id_overlap_and_containment(spark):
    """Ids may collide across corpora (pairs are role-keyed, never a<b);
    containment_eval thresholds n_common/n_eval — an eval doc embedded in
    a long train doc scores 1.0 there but low Jaccard."""
    from sketchlib.spark.dedup import fuzzy_decontam_pairs

    eval_text = "alpha beta gamma delta epsilon"
    long_train = eval_text + " " + " ".join(f"w{i}" for i in range(40))
    train = spark.createDataFrame(
        [(1, long_train), (2, "totally different content here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, eval_text)], "doc_id long, text string",  # id collides with train
    )
    # full containment: every eval 3-gram appears in train doc 1.  MinHash
    # banding estimates JACCARD (~0.07 here), so containment discovery
    # needs the lower-threshold banding the docstring prescribes — r=1
    # (bands=num_perm) makes P[miss] = (1-J)^64 ~ 1e-2 per the curve, and
    # the seeded hash family makes the outcome deterministic for fixed
    # texts (verified found).
    got = fuzzy_decontam_pairs(
        train, ev, threshold=0.99, measure="containment_eval",
        bands=64, num_perm=64,
    ).collect()
    assert [(r["train_id"], r["eval_id"]) for r in got] == [(1, 1)]
    assert got[0]["containment_eval"] == 1.0
    # jaccard mode at the same threshold keeps nothing (union dominated
    # by the long side)
    got_j = fuzzy_decontam_pairs(
        train, ev, threshold=0.99, bands=64, num_perm=64).collect()
    assert got_j == []


def test_fuzzy_decontam_poly_kernel_matches_xxh(spark):
    """kernel="poly" signs both sides in the polynomial family; verified
    output is identical to the xxh kernel's (candidates differ family-
    wise, exact verification makes the result equal at recall ~1)."""
    import pyspark.sql.functions as F

    from sketchlib.spark.dedup import fuzzy_decontam_pairs

    docs = _docs(spark).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    ev = docs.filter(F.col("doc_id") % 5 == 0)
    a = {(r["train_id"], r["eval_id"], r["jaccard"]) for r in
         fuzzy_decontam_pairs(train, ev, threshold=0.8).collect()}
    b = {(r["train_id"], r["eval_id"], r["jaccard"]) for r in
         fuzzy_decontam_pairs(train, ev, threshold=0.8,
                              kernel="poly").collect()}
    assert a == b and len(a) > 0
