"""BM25 retrieval: scores match a pure-Python reference, ranking is
deterministic under repartitioning, and only candidate docs appear."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.retrieval import bm25_top_docs

DOCS = [
    (1, "spark runs fast joins fast"),
    (2, "slow scans hurt joins"),
    (3, "fast fast fast scans"),
    (4, "totally unrelated words here"),
    (5, "joins and scans and joins"),
]
QUERIES = ["fast joins", "scans"]


def _py_bm25(k1=1.2, b=0.75):
    toks = {d: t.split(" ") for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for q in QUERIES:
        scores = {}
        for d, tk in toks.items():
            s = 0.0
            for term in sorted(set(q.split())):
                tf = tk.count(term)
                if tf == 0:
                    continue
                df = sum(1 for v in toks.values() if term in v)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(tk) / avgdl)
                )
            if s > 0.0:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[q] = [(d, r + 1, s) for r, (d, s) in enumerate(ranked)]
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.query, r.doc_id): (r.rank, r.score)
        for r in bm25_top_docs(docs, QUERIES, top_k=10).collect()
    }
    want = _py_bm25()
    assert set(got) == {
        (q, d) for q, rows in want.items() for d, _, _ in rows
    }
    for q, rows in want.items():
        for d, rank, score in rows:
            grank, gscore = got[(q, d)]
            assert grank == rank, (q, d)
            assert abs(gscore - score) < 1e-9, (q, d)


def test_bm25_partition_independent(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = bm25_top_docs(docs, QUERIES, top_k=3).collect()
    b = bm25_top_docs(docs.repartition(7), QUERIES, top_k=3).collect()
    key = lambda rows: sorted((r.query, r.doc_id, r.rank, r.score) for r in rows)
    assert key(a) == key(b)


def test_bm25_only_candidates_and_topk(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = bm25_top_docs(docs, QUERIES, top_k=2).collect()
    # doc 4 shares no query term — never a candidate
    assert all(r.doc_id != 4 for r in out)
    for q in QUERIES:
        ranks = sorted(r.rank for r in out if r.query == q)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 2


def test_bm25_duplicate_queries_not_double_counted(spark):
    """A repeated query string must score exactly like a single copy —
    duplicate (query, term) rows would sum every term score twice."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    key = lambda df: sorted(
        (r.query, r.doc_id, r.rank, r.score) for r in df.collect()
    )
    once = key(bm25_top_docs(docs, ["fast joins"], top_k=5))
    twice = key(bm25_top_docs(docs, ["fast joins", "fast joins"], top_k=5))
    assert once == twice


def test_rrf_fuse_matches_python_reference(spark):
    from example_kafkastreams_spark.operators.retrieval import (
        rrf_fuse,
        term_overlap_top_docs,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bmr = bm25_top_docs(docs, QUERIES, top_k=3)
    ovr = term_overlap_top_docs(docs, QUERIES, top_k=3)
    fused = {
        (r.query, r.doc_id): (r.rank, r.score)
        for r in rrf_fuse([bmr, ovr], top_k=3).collect()
    }

    # pure-Python RRF over the two collected rankings
    contribs = {}
    for rdf in (bmr, ovr):
        for r in rdf.collect():
            contribs.setdefault((r.query, r.doc_id), 0.0)
            contribs[(r.query, r.doc_id)] += 1.0 / (60 + r.rank)
    want = {}
    for q in QUERIES:
        ranked = sorted(
            ((d, s) for (qq, d), s in contribs.items() if qq == q),
            key=lambda kv: (-kv[1], kv[0]),
        )[:3]
        for i, (d, s) in enumerate(ranked):
            want[(q, d)] = (i + 1, s)
    assert set(fused) == set(want)
    for key, (rank, score) in want.items():
        assert fused[key][0] == rank, key
        assert abs(fused[key][1] - score) < 1e-12, key


def test_rrf_single_ranker_preserves_order(spark):
    from example_kafkastreams_spark.operators.retrieval import rrf_fuse

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bmr = bm25_top_docs(docs, QUERIES, top_k=4)
    fused = rrf_fuse([bmr]).collect()
    orig = {(r.query, r.doc_id): r.rank for r in bmr.collect()}
    # 1/(k+rank) is strictly decreasing in rank: fusion of one ranker
    # is the identity on ranks
    assert {(r.query, r.doc_id): r.rank for r in fused} == orig


def test_term_overlap_is_exact_counts(spark):
    from example_kafkastreams_spark.operators.retrieval import (
        term_overlap_top_docs,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.query, r.doc_id): r.hits
        for r in term_overlap_top_docs(docs, QUERIES, top_k=10).collect()
    }
    toks = {d: t.split(" ") for d, t in DOCS}
    for q in QUERIES:
        for d, tk in toks.items():
            hits = sum(tk.count(t) for t in set(q.split()))
            if hits:
                assert got[(q, d)] == hits, (q, d)


def test_bm25_index_roundtrip_and_pruning(spark, tmp_path):
    """A query against the stored inverted index must equal the
    in-session scorer BIT-FOR-BIT (shared score expression; df and
    corpus stats are the same numbers), and the query's term set must
    prune the postings scan twice: bucket partitions + a pushed
    In(term) filter."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.retrieval import (
        bm25_index_query,
        bm25_index_write,
        bm25_top_docs,
    )
    from example_kafkastreams_spark.plans import explain_str, pushed_filters

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "bm25_idx")
    bm25_index_write(docs, path, num_buckets=8)

    qs = ["hash join", "scan filter"]
    got = bm25_index_query(spark, path, qs, top_k=5)
    want = bm25_top_docs(docs, qs, top_k=5)
    key = lambda df: sorted(
        (r.query, r.doc_id, r.rank, r.score) for r in df.collect()
    )
    assert key(got) == key(want)  # exact doubles, not approx

    pushed = " ".join(pushed_filters(got))
    assert "In(term" in pushed or "EqualTo(term" in pushed, pushed
    plan = explain_str(got)
    assert "__bucket" in plan  # partition filter on the term bucket


def _rowkey(df):
    return sorted((r.query, r.doc_id, r.rank, r.score) for r in df.collect())


def test_bm25_append_sink_serves_exactly(spark, tmp_path):
    """Incremental BM25 serving is EXACT: day-1 build + two appended
    micro-batches must serve bit-identically to the in-session scorer
    over the full corpus (df recomputed from pruned base∪delta, stat
    increments added), and a crash-replayed batch changes nothing."""
    import pyspark.sql.functions as F

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.retrieval import (
        bm25_index_append_sink,
        bm25_index_query,
        bm25_index_write,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    day1 = docs.filter(F.col("doc_id") % 3 != 0)
    path = str(tmp_path / "bm25_live")
    bm25_index_write(day1, path, num_buckets=8)
    sink = bm25_index_append_sink(spark, path, run_id="r1")
    b0 = docs.filter(F.col("doc_id") % 6 == 0)
    b1 = docs.filter(F.col("doc_id") % 6 == 3)
    sink(b0, 0)
    sink(b1, 1)

    qs = ["hash join", "scan filter"]
    want = _rowkey(bm25_top_docs(docs, qs, top_k=5))
    assert _rowkey(bm25_index_query(spark, path, qs, top_k=5)) == want
    sink(b1, 1)  # crash replay: dynamic overwrite rewrites the leaf
    assert _rowkey(bm25_index_query(spark, path, qs, top_k=5)) == want

    # single-write atomicity: the batch's stat increments derive from
    # the postings leaf itself — no separate stats_delta tree, hence
    # no crash window between two writes
    import os

    assert not os.path.isdir(os.path.join(path, "stats_delta"))


def test_bm25_index_compact_exact_and_crash_safe(spark, tmp_path):
    """Compaction folds non-frontier delta leaves into a fresh base:
    serve stays EXACT before, after, on a re-run, and even in the
    worst crash window (a folded leaf restored unpruned — its rows
    dedupe at serve, its stats are skipped by the folded_runs
    watermark)."""
    import hashlib
    import json
    import os
    import shutil

    import pyspark.sql.functions as F

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.retrieval import (
        bm25_index_append_sink,
        bm25_index_compact,
        bm25_index_query,
        bm25_index_write,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    day1 = docs.filter(F.col("doc_id") % 3 != 0)
    path = str(tmp_path / "bm25_live")
    bm25_index_write(day1, path, num_buckets=8)
    s1 = bm25_index_append_sink(spark, path, run_id="r1")
    s1(docs.filter(F.col("doc_id") % 6 == 0), 0)
    s1(docs.filter(F.col("doc_id") % 6 == 3), 1)

    qs = ["hash join", "scan filter"]
    want = _rowkey(bm25_top_docs(docs, qs, top_k=5))
    tok1 = hashlib.md5(b"r1").hexdigest()[:16]
    folded_leaf = os.path.join(
        path, "postings_delta", f"ingest_run={tok1}", "ingest_batch=0"
    )
    crash_copy = str(tmp_path / "leaf_backup")
    shutil.copytree(folded_leaf, crash_copy)

    bm25_index_compact(spark, path)
    assert _rowkey(bm25_index_query(spark, path, qs, top_k=5)) == want
    with open(os.path.join(path, "stats.json")) as f:
        st = json.load(f)
    assert st["folded_runs"][tok1] == 0  # batch 0 folded
    assert not os.path.isdir(folded_leaf)  # ...and pruned
    assert os.path.isdir(  # frontier leaf held back verbatim
        os.path.join(
            path, "postings_delta", f"ingest_run={tok1}", "ingest_batch=1"
        )
    )
    bm25_index_compact(spark, path)  # idempotent no-op
    assert _rowkey(bm25_index_query(spark, path, qs, top_k=5)) == want

    # worst crash window: the folded leaf reappears unpruned — its
    # postings duplicate the new base and its stats are already merged
    shutil.copytree(crash_copy, folded_leaf)
    assert _rowkey(bm25_index_query(spark, path, qs, top_k=5)) == want
    bm25_index_compact(spark, path)  # next entry prunes the leftover
    assert not os.path.isdir(folded_leaf)
    assert _rowkey(bm25_index_query(spark, path, qs, top_k=5)) == want


def test_bm25_prunes_below_the_tf_aggregate(spark):
    """The candidate pruning must happen MAP-SIDE, below any exchange:
    the query-term literal IN sits inside the token-array filter
    lambda, and no corpus-sized (doc, dl, term) tf aggregate exists at
    all — the run-length ``term_counts`` fold produces the already-
    unique tf rows in the same projection (round 11; before that the
    pin was "IN filter below the tf aggregate"). A regression to
    either the join-above-aggregate shape (no literal IN anywhere) or
    the exploded groupBy shape (an Aggregate keyed by doc_id) breaks
    this probe."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    lp = (
        bm25_top_docs(docs, QUERIES, top_k=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the literal prune survives optimization...
    assert " IN (" in lp or "lambdafunction" in lp, lp
    # ...and the corpus-sized tf aggregate is gone: the only Aggregate
    # keyed by doc_id is the candidate-sized (query, doc_id) fold
    agg_doc = lp.find("Aggregate [doc_id")
    assert agg_doc == -1, lp
    assert lp.find("Aggregate [query") != -1, lp


def test_all_terms_qrels_boolean_and(spark):
    """Relevance = contains EVERY distinct query term; partial
    matches and repeated terms don't qualify a doc."""
    from example_kafkastreams_spark.operators.retrieval import (
        all_terms_qrels,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b x"),     # both terms -> relevant
            (2, "a x y a"),   # missing b -> not
            (3, "b a a"),     # both -> relevant
            (4, "z z z"),     # neither -> not
        ],
        "doc_id long, text string",
    )
    got = {
        (r.query, r.doc_id)
        for r in all_terms_qrels(docs, ["a b"]).collect()
    }
    assert got == {("a b", 1), ("a b", 3)}


def test_retrieval_eval_exact_metrics(spark):
    """Hand-checkable ranking: rel docs at ranks 2 and 3 of k=3 with
    n_rel=2 give p=2/3, recall=1, mrr=1/2, AP=(1/2 + 2/3)/2 = 7/12;
    a query with no relevant docs scores 0 across the board."""
    from example_kafkastreams_spark.operators.retrieval import (
        retrieval_eval,
    )

    results = spark.createDataFrame(
        [
            ("q1", 20, 1), ("q1", 10, 2), ("q1", 30, 3),
            ("q2", 10, 1), ("q2", 20, 2),
        ],
        "query string, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", 10), ("q1", 30)], "query string, doc_id long"
    )
    rows = {r.query: r for r in retrieval_eval(results, qrels, k=3).collect()}
    r1 = rows["q1"]
    assert (r1.n_rel, r1.hits_at_k) == (2, 2)
    assert r1.p_at_k == 2.0 / 3.0
    assert r1.recall_at_k == 1.0
    assert r1.mrr_at_k == 0.5
    assert r1.ap_at_k == (1.0 / 2.0 + 2.0 / 3.0) / 2.0
    # nDCG: rel at ranks 2,3; DCG = g2 + g3 folded in rank order,
    # IDCG = ideal prefix for min(n_rel, k) = 2 — replay the exact
    # literal fold the operator splices
    import math

    g = [1.0 / math.log2(r + 1) for r in (1, 2, 3)]
    assert r1.ndcg_at_k == (0.0 + g[1] + g[2]) / (0.0 + g[0] + g[1])
    r2 = rows["q2"]
    assert (r2.n_rel, r2.hits_at_k) == (0, 0)
    assert (
        r2.p_at_k, r2.recall_at_k, r2.mrr_at_k, r2.ap_at_k,
        r2.ndcg_at_k,
    ) == (0.0, 0.0, 0.0, 0.0, 0.0)


def test_retrieval_eval_composes_with_ann(spark):
    """The eval harness is ranker-agnostic: scoring an ANN run
    against brute-force-derived qrels, its recall@k equals the
    direct overlap computation (the bench's ann_recall fold)."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators import knn as K
    from example_kafkastreams_spark.operators.retrieval import (
        retrieval_eval,
    )
    from tests.conftest import SMOKE

    emb = load_table(spark, SMOKE, "embeddings")
    truth = K.brute_force_knn(emb, num_queries=4, k=5)
    run = K.lsh_ann(emb, num_queries=4, k=5)
    got = {
        r.query: r
        for r in retrieval_eval(
            run,
            truth.select("query_id", "neighbor_id"),
            k=5,
            query_col="query_id",
            doc_col="neighbor_id",
            rank_col="knn_rank",
        ).collect()
    }
    want = {}
    t_rows, r_rows = truth.collect(), run.collect()
    for q in {r.query_id for r in t_rows}:
        ts = {r.neighbor_id for r in t_rows if r.query_id == q}
        rs = {r.neighbor_id for r in r_rows if r.query_id == q}
        want[q] = len(ts & rs) / len(ts)
    assert set(got) == set(want)
    for q, rec in want.items():
        assert got[q].n_rel == 5
        assert got[q].recall_at_k == rec


def test_retrieval_eval_universe_and_dup_labels(spark):
    """Round-9 review fixes: duplicate (query, doc) label rows must
    not inflate metrics past 1.0, and a judged query the run never
    returned inside the top k still emits a zero row."""
    from example_kafkastreams_spark.operators.retrieval import (
        retrieval_eval,
    )

    results = spark.createDataFrame(
        [("q1", 10, 1), ("q3", 40, 6)],
        "query string, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", 10), ("q1", 10), ("q2", 99), ("q3", 40)],
        "query string, doc_id long",
    )
    rows = {r.query: r for r in retrieval_eval(results, qrels, k=1).collect()}
    # duplicate label counted once
    r1 = rows["q1"]
    assert (r1.n_rel, r1.hits_at_k, r1.p_at_k, r1.ap_at_k) == (1, 1, 1.0, 1.0)
    # judged query with no returned rows -> zero row, not a dropped one
    r2 = rows["q2"]
    assert (r2.n_rel, r2.hits_at_k) == (1, 0)
    assert (r2.p_at_k, r2.recall_at_k, r2.mrr_at_k, r2.ap_at_k) == (
        0.0, 0.0, 0.0, 0.0,
    )
    # returned only past rank k -> present (query in results) but zero
    r3 = rows["q3"]
    assert (r3.n_rel, r3.hits_at_k, r3.recall_at_k) == (1, 0, 0.0)


# --- late-interaction MaxSim ------------------------------------------------

def _maxsim_reference(docs, queries, dim, n_hashes, chunk_size, stride, k):
    """Naive MaxSim: chunk, hash-featurize, per-token best chunk,
    clamp at zero, sum — plain Python."""
    from example_kafkastreams_spark.functions import portable as P

    def featurize(tokens):
        v = [0] * dim
        for t in tokens:
            tv = P.signed_feature_vec_py(t, n_hashes, dim)
            v = [a + b for a, b in zip(v, tv)]
        return v

    chunk_vecs = {}
    for doc_id, text in docs:
        toks = text.split()
        vecs = []
        for start in range(0, len(toks), stride):
            vecs.append(featurize(toks[start:start + chunk_size]))
        chunk_vecs[doc_id] = vecs
    out = {}
    for q in queries:
        scores = []
        for doc_id, _ in docs:
            s = 0.0
            for tok in q.split():
                tv = P.signed_feature_vec_py(tok, n_hashes, dim)
                n2t = sum(x * x for x in tv)
                best = 0.0
                for cv in chunk_vecs[doc_id]:
                    n2c = sum(x * x for x in cv)
                    d0 = sum(a * b for a, b in zip(tv, cv))
                    if d0 > 0 and n2c > 0:
                        best = max(best, d0 / math.sqrt(float(n2t) * n2c))
                s += best
            if s > 0:
                scores.append((doc_id, s))
        scores.sort(key=lambda t: (-t[1], t[0]))
        out[q] = scores[:k]
    return out


def test_maxsim_matches_python_reference(spark):
    from example_kafkastreams_spark.operators.retrieval import maxsim_top_docs

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha alpha alpha beta beta unrelated words here"),
        (3, "completely different vocabulary nothing shared at all"),
        (4, "gamma delta " + " ".join(f"w{i}" for i in range(40))),
    ]
    queries = ["alpha beta", "gamma", "missingtoken"]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.query, r.doc_id): (r.rank, r.score)
        for r in maxsim_top_docs(
            sdf, queries, top_k=3, dim=16, n_hashes=4,
            chunk_size=4, stride=3,
        ).collect()
    }
    want = _maxsim_reference(docs, queries, 16, 4, 4, 3, 3)
    for q, ranked in want.items():
        for rank, (doc_id, score) in enumerate(ranked, 1):
            assert (q, doc_id) in got, (q, doc_id)
            grank, gscore = got[(q, doc_id)]
            assert grank == rank
            assert abs(gscore - score) < 1e-12
    # exact row-set parity: nothing beyond the reference's rows
    want_keys = {(q, d) for q, rk in want.items() for d, _ in rk}
    assert set(got) == want_keys


def test_maxsim_passage_beats_pooled(spark):
    """The late-interaction property: one PURE matching passage (cos
    1.0 against the query token) outranks a doc with MORE total
    matches diluted across every chunk — per-token max picks the best
    passage where whole-document pooling would favor the raw count."""
    from example_kafkastreams_spark.operators.retrieval import maxsim_top_docs

    noise = " ".join(f"filler{i}" for i in range(28))
    diluted = " ".join(
        t for i in range(8) for t in ("alpha", f"x{i}", f"y{i}", f"z{i}")
    )
    docs = [
        (1, "alpha alpha alpha alpha " + noise),  # one pure chunk, 4 hits
        (2, diluted),                             # 8 hits, 1-in-4 per chunk
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r.score
        for r in maxsim_top_docs(
            sdf, ["alpha"], top_k=2, dim=32, n_hashes=4,
            chunk_size=4, stride=4,
        ).collect()
    }
    assert out[1] == 1.0  # cv = 4·tv exactly → cosine exactly 1
    assert out[1] > out[2]


def test_maxsim_partition_independent(spark):
    from example_kafkastreams_spark.operators.retrieval import maxsim_top_docs

    docs = [(i, f"tok{i % 7} alpha beta tok{i % 5} gamma") for i in range(40)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    a = maxsim_top_docs(sdf.repartition(1), ["alpha beta"], top_k=5,
                        dim=16, n_hashes=4, chunk_size=3, stride=2)
    b = maxsim_top_docs(sdf.repartition(16), ["alpha beta"], top_k=5,
                        dim=16, n_hashes=4, chunk_size=3, stride=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_maxsim_index_roundtrip_bit_identical(spark, tmp_path):
    """The artifact contract: loaded serve == in-session scorer,
    byte-for-byte on scores (integer vectors and exact doubles
    round-trip parquet unchanged)."""
    from example_kafkastreams_spark.operators.retrieval import (
        maxsim_index_query,
        maxsim_index_write,
        maxsim_top_docs,
    )

    docs = [
        (i, f"alpha tok{i % 7} beta tok{i % 5} gamma delta")
        for i in range(30)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    queries = ["alpha beta", "gamma"]
    fresh = sorted(
        map(
            tuple,
            maxsim_top_docs(
                sdf, queries, top_k=4, dim=16, n_hashes=4,
                chunk_size=3, stride=2,
            ).collect(),
        )
    )
    path = str(tmp_path / "msidx")
    maxsim_index_write(
        sdf, path, dim=16, n_hashes=4, chunk_size=3, stride=2
    )
    loaded = sorted(
        map(
            tuple,
            maxsim_index_query(spark, path, queries, top_k=4).collect(),
        )
    )
    assert fresh == loaded


def test_maxsim_append_sink_serves_exactly(spark, tmp_path):
    """Day-1 build + two appended micro-batches must serve
    bit-identically to the in-session scorer over the full corpus
    (MaxSim has no corpus-global stats, so incremental serving is
    exact by construction), and a crash-replayed batch changes
    nothing (dynamic-overwrite leaf rewrite)."""
    import pyspark.sql.functions as F

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.retrieval import (
        maxsim_index_append_sink,
        maxsim_index_query,
        maxsim_index_write,
        maxsim_top_docs,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    day1 = docs.filter(F.col("doc_id") % 3 != 0)
    path = str(tmp_path / "ms_live")
    maxsim_index_write(day1, path)
    sink = maxsim_index_append_sink(spark, path, run_id="r1")
    b0 = docs.filter(F.col("doc_id") % 6 == 0)
    b1 = docs.filter(F.col("doc_id") % 6 == 3)
    sink(b0, 0)
    sink(b1, 1)

    qs = ["hash join", "scan filter"]
    want = _rowkey(maxsim_top_docs(docs, qs, top_k=5))
    assert _rowkey(maxsim_index_query(spark, path, qs, top_k=5)) == want
    sink(b1, 1)  # crash replay
    assert _rowkey(maxsim_index_query(spark, path, qs, top_k=5)) == want
    # empty batch is a no-op
    sink(docs.filter(F.col("doc_id") < 0), 2)
    assert _rowkey(maxsim_index_query(spark, path, qs, top_k=5)) == want


def test_maxsim_rerank_reorders_not_unretrieves(spark):
    """Rerank semantics: output ⊆ stage-1 candidates; ranking by
    MaxSim (ties → doc id); BM25 hits with no colliding chunk stay in
    the pool at score 0."""
    from example_kafkastreams_spark.operators.retrieval import (
        bm25_top_docs,
        maxsim_rerank,
        maxsim_top_docs,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = maxsim_rerank(
        docs, QUERIES, k1=4, top_k=4, dim=16, n_hashes=4,
        chunk_size=3, stride=2,
    ).collect()
    cands = {
        (r.query, r.doc_id)
        for r in bm25_top_docs(docs, QUERIES, top_k=4).collect()
    }
    assert {(r.query, r.doc_id) for r in out} <= cands
    # per-pool ranking matches a corpus-wide maxsim restricted to the
    # pool (per-pair independence)
    full = {
        (r.query, r.doc_id): r.score
        for r in maxsim_top_docs(
            docs, QUERIES, top_k=100, dim=16, n_hashes=4,
            chunk_size=3, stride=2,
        ).collect()
    }
    for q in QUERIES:
        pool = [
            (full.get((q, d), 0.0), d)
            for (qq, d) in cands
            if qq == q
        ]
        want = sorted(pool, key=lambda t: (-t[0], t[1]))[:4]
        got = sorted(
            [(r.score, r.doc_id, r.rank) for r in out if r.query == q],
            key=lambda t: t[2],
        )
        assert [(s, d) for s, d, _ in got] == want
    # ranks contiguous from 1
    for q in QUERIES:
        ranks = sorted(r.rank for r in out if r.query == q)
        assert ranks == list(range(1, len(ranks) + 1))


def test_maxsim_rerank_accepts_precomputed_candidates(spark):
    from example_kafkastreams_spark.operators.retrieval import (
        bm25_top_docs,
        maxsim_rerank,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    cands = bm25_top_docs(docs, QUERIES, top_k=4)
    a = maxsim_rerank(
        docs, QUERIES, k1=4, top_k=4, dim=16, n_hashes=4,
        chunk_size=3, stride=2,
    )
    b = maxsim_rerank(
        docs, QUERIES, top_k=4, dim=16, n_hashes=4,
        chunk_size=3, stride=2, candidates=cands,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_maxsim_append_sink_streaming_golden(spark, tmp_path):
    """REAL readStream golden (the bloom/cms/rollup sink shape): day-1
    build, then document micro-batches through an actual file-backed
    streaming query into maxsim_index_append_sink — the served top-k
    must equal the in-session scorer over the full corpus, a
    driver-restart replay of an applied batch must be a no-op
    (dynamic-overwrite leaf rewrite), and the run must survive a
    checkpointed stream restart."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.retrieval import (
        maxsim_index_append_sink,
        maxsim_index_query,
        maxsim_index_write,
        maxsim_top_docs,
    )
    from example_kafkastreams_spark.streaming.sources import (
        file_stream,
        stage_replayable_batches,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    day1 = docs.filter(F.col("doc_id") % 3 != 0)
    path = str(tmp_path / "ms_live")
    maxsim_index_write(day1, path)

    delta = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    batches = [
        [(r.doc_id, r.text) for r in delta.filter(
            F.col("doc_id") % 6 == 0).collect()],
        [(r.doc_id, r.text) for r in delta.filter(
            F.col("doc_id") % 6 == 3).collect()],
    ]
    schema = T.StructType().add("doc_id", "long").add("text", "string")
    src = str(tmp_path / "in")
    stage_replayable_batches(spark, src, schema, batches)
    q = (
        file_stream(spark, src, schema, max_files_per_trigger=1)
        .writeStream.foreachBatch(
            maxsim_index_append_sink(spark, path, run_id="r1")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    qs = ["hash join", "scan filter"]
    want = sorted(
        map(tuple, maxsim_top_docs(docs, qs, top_k=5).collect())
    )
    assert sorted(
        map(tuple, maxsim_index_query(spark, path, qs, top_k=5).collect())
    ) == want

    # driver restart: a FRESH sink instance replays an applied batch —
    # the (run, batch) leaf rewrites itself, the serve is unchanged
    sink_b = maxsim_index_append_sink(spark, path, run_id="r1")
    replay = spark.createDataFrame(batches[1], schema)
    sink_b(replay, 1)
    assert sorted(
        map(tuple, maxsim_index_query(spark, path, qs, top_k=5).collect())
    ) == want

    # checkpointed restart with no new files: no-op, serve unchanged
    q2 = (
        file_stream(spark, src, schema, max_files_per_trigger=1)
        .writeStream.foreachBatch(
            maxsim_index_append_sink(spark, path, run_id="r1")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert sorted(
        map(tuple, maxsim_index_query(spark, path, qs, top_k=5).collect())
    ) == want


def test_maxsim_index_compaction_serve_identical(spark, tmp_path):
    """Compaction folds the delta leaves (frontier held back), the
    serve is bit-identical before/after, a post-compaction replay of
    the frontier batch changes nothing (max-based scoring is
    duplicate-insensitive), and re-compaction is idempotent."""
    import os

    import pyspark.sql.functions as F

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.retrieval import (
        maxsim_index_append_sink,
        maxsim_index_compact,
        maxsim_index_query,
        maxsim_index_write,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "ms_c")
    maxsim_index_write(docs.filter(F.col("doc_id") % 3 != 0), path)
    sink = maxsim_index_append_sink(spark, path, run_id="r1")
    batches = [
        docs.filter(F.col("doc_id") % 9 == 0),
        docs.filter(F.col("doc_id") % 9 == 3),
        docs.filter(F.col("doc_id") % 9 == 6),
    ]
    for i, b in enumerate(batches):
        sink(b.select("doc_id", "text"), i)

    qs = ["hash join", "scan filter"]
    before = sorted(
        map(tuple, maxsim_index_query(spark, path, qs, top_k=5).collect())
    )
    maxsim_index_compact(spark, path)
    delta_dir = os.path.join(path, "chunks_delta")
    runs = sorted(
        e for e in os.listdir(delta_dir) if e.startswith("ingest_run=")
    )
    # batches 0 and 1 folded; batch 2 is the run frontier, held back
    assert "ingest_run=__compacted__" in runs
    assert any("ingest_run=__compacted__" != r for r in runs)
    assert sorted(
        map(tuple, maxsim_index_query(spark, path, qs, top_k=5).collect())
    ) == before

    # frontier replay after compaction: leaf rewrite, serve unchanged
    sink(batches[2].select("doc_id", "text"), 2)
    assert sorted(
        map(tuple, maxsim_index_query(spark, path, qs, top_k=5).collect())
    ) == before

    # idempotent: nothing new to fold
    maxsim_index_compact(spark, path)
    assert sorted(
        map(tuple, maxsim_index_query(spark, path, qs, top_k=5).collect())
    ) == before

    # no deltas at all: a fresh static index is a no-op
    path2 = str(tmp_path / "ms_static")
    maxsim_index_write(docs.filter(F.col("doc_id") % 3 != 0), path2)
    assert maxsim_index_compact(spark, path2) is None


def test_mmr_prefers_diverse_over_redundant(spark):
    from example_kafkastreams_spark.operators.retrieval import (
        mmr_diversify,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta epsilon"),  # near-dup of 1
            (3, "zeta eta theta iota"),             # disjoint
        ],
        "doc_id bigint, text string",
    )
    shortlist = spark.createDataFrame(
        [("q", 1, 1, 10.0), ("q", 2, 2, 5.2), ("q", 3, 3, 5.0)],
        "query string, doc_id bigint, rank bigint, score double",
    )
    got = {
        r["pick"]: (r["doc_id"], r["mmr"])
        for r in mmr_diversify(shortlist, docs, k=3).collect()
    }
    # pick 1 = argmax rel; pick 2 must SKIP the near-duplicate doc 2
    # (0.5*5.2 - 0.5*0.8 = 2.2 < 0.5*5.0 - 0.5*0.0 = 2.5) and take
    # the disjoint doc 3; doc 2 arrives last
    assert got[1][0] == 1
    assert got[2][0] == 3
    assert got[3][0] == 2
    assert got[1][1] == 5.0
    assert got[2][1] == 2.5
    # pick 3's mmr pays the similarity to doc 1 (jaccard 4/5)
    assert abs(got[3][1] - (0.5 * 5.2 - 0.5 * 0.8)) < 1e-9


def test_mmr_short_shortlist_yields_fewer_picks(spark):
    from example_kafkastreams_spark.operators.retrieval import (
        mmr_diversify,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id bigint, text string"
    )
    shortlist = spark.createDataFrame(
        [("q", 1, 1, 2.0), ("q", 2, 2, 1.0)],
        "query string, doc_id bigint, rank bigint, score double",
    )
    rows = mmr_diversify(shortlist, docs, k=5).collect()
    assert sorted(r["pick"] for r in rows) == [1, 2]


def test_mmr_local_matches_unrolled(spark):
    # The single-task local greedy (default) must reproduce the
    # distributed unroll bitwise: same picks, same IEEE mmr doubles —
    # including score ties (broken on ascending doc id) and multiple
    # queries in one call.
    from example_kafkastreams_spark.operators.retrieval import (
        mmr_diversify,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota"),
            (4, "alpha zeta eta theta"),
            (5, "kappa lambda"),
        ],
        "doc_id bigint, text string",
    )
    shortlist = spark.createDataFrame(
        [
            ("q1", 1, 1, 10.0),
            ("q1", 2, 2, 5.2),
            ("q1", 3, 3, 5.2),  # tie with doc 2 → id asc
            ("q1", 4, 4, 4.9),
            ("q2", 4, 1, 3.0),
            ("q2", 5, 2, 3.0),  # tie at the top → id asc
            ("q2", 1, 3, 1.0),
        ],
        "query string, doc_id bigint, rank bigint, score double",
    )
    key = ["query", "doc_id", "pick"]
    loc = sorted(
        mmr_diversify(shortlist, docs, k=3, local=True).collect(),
        key=lambda r: [r[c] for c in key],
    )
    dist = sorted(
        mmr_diversify(shortlist, docs, k=3, local=False).collect(),
        key=lambda r: [r[c] for c in key],
    )
    assert len(loc) == len(dist) == 6
    for a, b in zip(loc, dist):
        assert a["query"] == b["query"]
        assert a["doc_id"] == b["doc_id"]
        assert a["pick"] == b["pick"]
        # bitwise: both sides multiplied the same 6-dp-rounded doubles
        assert a["mmr"] == b["mmr"], (a, b)
