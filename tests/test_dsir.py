"""DSIR-style domain-relevance selection (operators/mixing.py)."""

from __future__ import annotations

import hashlib

from example_kafkastreams_spark.functions.portable import ilog2_py
from example_kafkastreams_spark.operators.mixing import (
    DSIR_BUCKETS,
    domain_relevance_scores,
    domain_relevance_select,
)

TARGET_VOCAB = "quantum theory entropy lattice spectrum"
OFFTOPIC = "sale discount shoes handbag coupon"

ROWS = (
    # target corpus: the reference domain
    [(i, "wiki", TARGET_VOCAB) for i in range(100, 104)]
    # pool: two on-topic docs, three off-topic docs
    + [
        (1, "web", "quantum entropy spectrum lattice"),
        (2, "web", "theory of the quantum lattice"),
        (3, "ads", OFFTOPIC),
        (4, "ads", OFFTOPIC + " shoes shoes"),
        (5, "web", "coupon handbag sale"),
    ]
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark, rows=None):
    return spark.createDataFrame(
        rows or ROWS, "doc_id bigint, source string, text string"
    )


def _py_weights_scores():
    tgt_toks, pool = [], {}
    for i, src, text in ROWS:
        toks = text.split()
        if src == "wiki":
            tgt_toks.extend(toks)
        else:
            pool[i] = (src, toks)
    bkt = lambda t: _h32(f"{t}:dsir") % DSIR_BUCKETS  # noqa: E731
    ct, cp = {}, {}
    for t in tgt_toks:
        ct[bkt(t)] = ct.get(bkt(t), 0) + 1
    for _, (_, toks) in pool.items():
        for t in toks:
            cp[bkt(t)] = cp.get(bkt(t), 0) + 1
    w = {
        b: ilog2_py(ct.get(b, 0) + 1) - ilog2_py(cp[b] + 1)
        for b in cp
    }
    scores = {
        i: (src, sum(w[bkt(t)] for t in toks))
        for i, (src, toks) in pool.items()
    }
    return w, scores


def test_weights_and_scores_match_pure_python(spark):
    weights, scores = domain_relevance_scores(_docs(spark), "wiki")
    got_w = {r["bucket"]: r["w"] for r in weights.collect()}
    got_s = {
        r["doc_id"]: (r["source"], r["score"]) for r in scores.collect()
    }
    want_w, want_s = _py_weights_scores()
    assert got_w == want_w
    assert got_s == want_s


def test_on_topic_docs_outrank_off_topic(spark):
    _, scores = domain_relevance_scores(_docs(spark), "wiki")
    sel = domain_relevance_select(scores, k=2)
    picked = {r["doc_id"] for r in sel.collect()}
    assert picked == {1, 2}
    ranks = {r["doc_id"]: r["rk"] for r in sel.collect()}
    assert sorted(ranks.values()) == [1, 2]


def test_target_docs_never_selected(spark):
    _, scores = domain_relevance_scores(_docs(spark), "wiki")
    assert scores.filter("source = 'wiki'").count() == 0


def test_partition_invariance(spark):
    docs = _docs(spark)
    _, s1 = domain_relevance_scores(docs, "wiki")
    _, s2 = domain_relevance_scores(docs.repartition(7), "wiki")
    assert sorted(map(tuple, s1.collect())) == sorted(
        map(tuple, s2.collect())
    )
