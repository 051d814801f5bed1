"""Dedup blocking eval harness (operators/dedup_eval.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.dedup_eval import candidate_eval


def _metrics(df):
    return {r["metric"]: (r["n"], r["value"]) for r in df.collect()}


def _py_shingles(text, n=3):
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_metrics_match_python_recomputation(spark):
    """P/R/F1 equal a from-scratch Python recomputation of truth
    (exact distinct-shingle Jaccard on the sample) and candidates
    (the operator's own band collisions at threshold-less capture)."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.neardup import (
        minhash_lsh_pairs,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sample = docs.filter(F.col("doc_id") % 2 == 0)
    texts = {
        r["doc_id"]: r["text"]
        for r in sample.select("doc_id", "text").collect()
    }
    ids = sorted(texts)
    truth = set()
    for i, a in enumerate(ids):
        sa = _py_shingles(texts[a])
        for b in ids[i + 1 :]:
            sb = _py_shingles(texts[b])
            u = len(sa | sb)
            if u and round(len(sa & sb) / u, 6) >= 0.3:
                truth.add((a, b))
    # candidate set = every band collision (threshold 0 keeps all)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(sample, threshold=0.0).collect()
    }
    hit = truth & cand
    got = _metrics(
        candidate_eval(docs, threshold=0.3, sample_mod=2)
    )
    assert got["precision"][0] == len(cand)
    assert got["recall"][0] == len(truth)
    assert got["f1"][0] == len(hit)
    assert got["precision"][1] == (
        len(hit) / len(cand) if cand else 0.0
    )
    assert got["recall"][1] == (len(hit) / len(truth) if truth else 0.0)
    denom = len(truth) + len(cand)
    assert got["f1"][1] == (2 * len(hit) / denom if denom else 0.0)


def test_zero_pairs_yields_zero_metrics(spark):
    docs = spark.createDataFrame(
        [
            (0, "aa bb cc dd"),
            (2, "ee ff gg hh"),
            (4, "ii jj kk ll"),
            (1, "aa bb cc dd"),  # dup of 0 but OUTSIDE the sample
        ],
        "doc_id bigint, text string",
    )
    got = _metrics(candidate_eval(docs, sample_mod=2))
    assert got["recall"] == (0, 0.0)
    assert got["f1"][1] == 0.0


def test_sample_restriction(spark):
    """Pairs straddling the sample boundary never count — the dup of
    doc 0 at odd id 1 is invisible to a mod-2 eval."""
    docs = spark.createDataFrame(
        [
            (0, "xx yy zz ww vv uu"),
            (1, "xx yy zz ww vv uu"),
            (2, "xx yy zz ww vv uu"),
        ],
        "doc_id bigint, text string",
    )
    got = _metrics(candidate_eval(docs, sample_mod=2))
    # only (0, 2) is inside the sample
    assert got["recall"][0] == 1
    assert got["precision"] == (1, 1.0)
    assert got["f1"] == (1, 1.0)


def test_prefix_filter_matches_naive_truth(spark):
    """The prefix-filtering lemma, fuzzed: for random small corpora
    (shared vocabulary, heavy shingle overlap — the adversarial regime
    for prefix pruning) the operator's truth-pair metrics must equal a
    from-scratch naive O(n²) Python computation of
    |{pairs : round(J, 6) >= t}| at several thresholds, including ones
    where t·|d| lands on integer boundaries."""
    import itertools
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from example_kafkastreams_spark.operators.dedup_eval import (
        candidate_eval,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(24):
        n = rng.randint(3, 18)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # exact duplicates and a near-duplicate to populate the truth set
    docs.append((24, docs[0][1]))
    docs.append((26, docs[2][1] + " extra tail words here"))

    def sh(text, k=3):
        toks = text.split(" ")
        return {
            " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
        }

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.3, 0.5, 0.7, 0.25):
        rows = {
            r.metric: r
            for r in candidate_eval(
                sdf, sample_mod=1, threshold=t
            ).collect()
        }
        n_truth = rows["recall"].n
        shs = {i: sh(x) for i, x in docs}
        want = sum(
            1
            for a, b in itertools.combinations(sorted(shs), 2)
            if shs[a]
            and shs[b]
            and (shs[a] & shs[b])
            and round(
                len(shs[a] & shs[b]) / len(shs[a] | shs[b]), 6
            ) >= t
        )
        assert n_truth == want, (t, n_truth, want)
