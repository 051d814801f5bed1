"""Round-5 corpus operators: repetition metrics (dual-dialect),
benchmark decontamination (drop semantics + corpus-never-shuffles plan
shape), and corpus-trained LM scoring (probability laws, partition
invariance, broadcast model join). Oracle parity for q48/q64/q65 rides
the driver-sim sweep; these pin the operator semantics directly."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row, functions as F

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.functions import portable as P
from example_kafkastreams_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)
from example_kafkastreams_spark.operators.lm import bigram_model, lm_score
from example_kafkastreams_spark.plans import explain_str
from tests.conftest import SMOKE
from tests.oracle_utils import compare_typed, duckdb_run


# --- repetition metrics ---------------------------------------------------


def test_repetition_exprs_cross_dialect(spark):
    """Spark and DuckDB render bit-identical repetition metrics on the
    real corpus, including the short-doc NULL edge."""
    docs = load_table(spark, SMOKE, "documents")
    es = P.repetition_exprs("text", P.SPARK)
    got = docs.select(
        "doc_id", *[F.expr(e).alias(k) for k, e in es.items()]
    ).toPandas()
    ed = P.repetition_exprs("text", P.DUCK)
    want = duckdb_run(
        "SELECT doc_id, "
        + ", ".join(f"{e} AS {k}" for k, e in ed.items())
        + " FROM documents",
        SMOKE,
    )
    assert compare_typed(got, want) == []


def test_repetition_exprs_edges(spark):
    """Crafted docs pin the metric definitions: full repetition,
    stutter, and the sub-n-gram NULL guard."""
    df = spark.createDataFrame(
        [
            Row(i=0, text="a b a b a"),  # bigrams ab,ba,ab,ba -> dup 0.5
            Row(i=1, text="x x x"),      # all-stutter
            Row(i=2, text="one"),        # no bigrams -> NULLs
        ]
    )
    es = P.repetition_exprs("text", P.SPARK)
    rows = {
        r["i"]: r
        for r in df.select(
            "i", *[F.expr(e).alias(k) for k, e in es.items()]
        ).collect()
    }
    assert rows[0]["dup_bigram_frac"] == 0.5
    assert rows[0]["adjacent_dup_frac"] == 0.0
    assert rows[1]["adjacent_dup_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == 0.5
    assert rows[2]["dup_bigram_frac"] is None
    assert rows[2]["adjacent_dup_frac"] is None


# --- decontamination ------------------------------------------------------


def _mini_corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=2, text="one two three four five six seven"),
            Row(doc_id=3, text="alpha beta gamma delta epsilon eta"),
        ]
    )


def test_decontaminate_drops_overlapping_docs(spark):
    docs = _mini_corpus(spark)
    bench = spark.createDataFrame(
        # shares the 5-shingle "alpha beta gamma delta epsilon" with
        # docs 1 and 3, nothing with doc 2
        [Row(doc_id=100, text="alpha beta gamma delta epsilon theta")]
    )
    report = {
        r["doc_id"]: r["n_contaminated"]
        for r in contamination_report(docs, bench, n=5).collect()
    }
    assert report == {1: 1, 3: 1}
    kept = [r["doc_id"] for r in decontaminate(docs, bench, n=5).collect()]
    assert kept == [2]
    # min_hits above the overlap keeps everything
    kept_all = sorted(
        r["doc_id"] for r in decontaminate(docs, bench, n=5, min_hits=2).collect()
    )
    assert kept_all == [1, 2, 3]


def test_decontaminate_corpus_side_never_shuffles(spark):
    """The corpus never crosses a hash exchange: benchmark shingles and
    the contaminated-id list both broadcast. The only hashpartitioning
    exchange in the whole decontaminate plan is the benchmark-side
    distinct (small side by contract)."""
    docs = load_table(spark, SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    plan = explain_str(decontaminate(train, bench, n=5), "formatted")
    assert "BroadcastHashJoin" in plan
    # exchanges: benchmark distinct (1) + the hit-count partial agg over
    # matched grams only (1); none repartitions the corpus scan output
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges <= 2, plan


# --- LM scoring -----------------------------------------------------------


def test_bigram_model_is_a_distribution(spark):
    """Transition probabilities per prefix sum to 1 (float tolerance
    only for the CHECK's own summation — each p is a single exact
    division)."""
    docs = load_table(spark, SMOKE, "documents").limit(50)
    model = bigram_model(docs).withColumn(
        "prefix", F.split(F.col("gram"), " ")[0]
    )
    sums = model.groupBy("prefix").agg(F.sum("p").alias("s")).collect()
    assert sums and all(abs(r["s"] - 1.0) < 1e-9 for r in sums)


def test_lm_score_partition_invariant(spark):
    """The scaled-long accumulation makes the score exactly identical
    under any input partitioning — the determinism claim the driver
    hash relies on."""
    docs = load_table(spark, SMOKE, "documents").limit(80)
    a = lm_score(docs).toPandas()
    b = lm_score(docs.repartition(13)).toPandas()
    assert compare_typed(a, b) == []
    assert ((a["lm_score"] > 0) & (a["lm_score"] <= 1)).all()
    assert (a["top_bigram_count"] >= 1).all()


def test_lm_score_short_docs_absent(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="single"), Row(doc_id=2, text="two tokens here")]
    )
    out = lm_score(df).collect()
    assert [r["doc_id"] for r in out] == [2]
    assert out[0]["n_bigrams"] == 2


def test_lm_model_join_broadcasts(spark):
    docs = load_table(spark, SMOKE, "documents").limit(50)
    plan = explain_str(lm_score(docs), "simple")
    assert "BroadcastHashJoin" in plan


# --- incremental dedup ----------------------------------------------------


def test_incremental_dedup_composes_to_batch(spark):
    """Ingesting the corpus in two id-ordered deltas through
    incremental_exact_dedup yields exactly the one-shot
    exact_text_dedup result: same survivor (id, digest, n_copies per
    first-seen batch) semantics, and re-ingesting a batch against the
    grown index adds nothing (idempotent)."""
    from example_kafkastreams_spark.operators.neardup import (
        exact_text_dedup,
        incremental_exact_dedup,
    )

    docs = load_table(spark, SMOKE, "documents")
    d1 = docs.filter(F.col("doc_id") < 250)
    # the second delta REPLAYS 20 first-batch texts under new ids (the
    # testdata corpus has no exact dups of its own — q40 survivors =
    # docs — so cross-batch duplication must be injected to exercise
    # the anti join's drop path)
    replay = d1.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 1000
    )
    d2 = docs.filter(F.col("doc_id") >= 250).unionByName(replay)
    batch = exact_text_dedup(d1.unionByName(d2)).select(
        "doc_id", "content_hash"
    )
    idx1 = exact_text_dedup(d1)
    inc2 = incremental_exact_dedup(d2, idx1)
    assert inc2.count() == 250  # the 20 replays are dropped
    merged = idx1.select("doc_id", "content_hash").unionByName(
        inc2.select("doc_id", "content_hash")
    )
    assert compare_typed(merged.toPandas(), batch.toPandas()) == []
    # idempotent: the grown index rejects a replayed delta entirely
    grown = merged.select("content_hash")
    assert incremental_exact_dedup(d2, grown).count() == 0


def test_incremental_dedup_is_anti_join_on_digests(spark):
    from example_kafkastreams_spark.operators.neardup import (
        exact_text_dedup,
        incremental_exact_dedup,
    )

    docs = load_table(spark, SMOKE, "documents")
    idx = exact_text_dedup(docs.filter(F.col("doc_id") < 250))
    plan = explain_str(
        incremental_exact_dedup(docs.filter(F.col("doc_id") >= 250), idx),
        "formatted",
    )
    assert "LeftAnti" in plan
    # the join keys are digests; the delta's text column never appears
    # in a join or exchange operator line
    join_lines = [
        ln for ln in plan.splitlines()
        if "Join" in ln or "Exchange" in ln or "hashpartitioning" in ln
    ]
    assert join_lines and not any("text" in ln for ln in join_lines)


# --- passage-level dedup --------------------------------------------------


def test_dedup_chunks_passage_level(spark):
    """Chunk-level dedup drops boilerplate passages shared ACROSS
    distinct documents — the miss-case of doc-level dedup — keeping
    the smallest (doc_id, chunk_idx) and counting copies."""
    from example_kafkastreams_spark.operators.text_chunks import (
        chunk_documents,
        dedup_chunks,
    )

    boiler = " ".join(f"b{i}" for i in range(8))
    rows = [
        Row(doc_id=1, text=boiler + " " + " ".join(f"x{i}" for i in range(8))),
        Row(doc_id=2, text=boiler + " " + " ".join(f"y{i}" for i in range(8))),
        Row(doc_id=3, text=" ".join(f"z{i}" for i in range(16))),
    ]
    chunks = chunk_documents(
        spark.createDataFrame(rows), chunk_size=8, stride=8
    )
    out = dedup_chunks(chunks)
    # docs 1 and 2 share the identical first chunk (the boilerplate):
    # one survivor at (1, 1) with 2 copies; the distinct tails survive
    assert out.count() == chunks.count() - 1
    surv = {(r.doc_id, r.chunk_idx): r.n_copies for r in out.collect()}
    assert surv[(1, 1)] == 2 and (2, 1) not in surv
    assert surv[(2, 2)] == 1 and surv[(3, 1)] == 1
    # deterministic under repartitioning
    a = out.toPandas()
    b = dedup_chunks(chunks.repartition(7)).toPandas()
    assert compare_typed(a, b) == []


# --- stratified sampling --------------------------------------------------


def test_stratified_sample_exact_quota_and_determinism(spark):
    from example_kafkastreams_spark.operators.sampling import (
        stratified_sample,
    )

    docs = load_table(spark, SMOKE, "documents")
    out = stratified_sample(docs, "source", 7, "doc_id")
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {s: min(7, n) for s, n in sizes.items()}
    # exact same ROWS under a different partitioning
    a = out.toPandas()
    b = stratified_sample(docs.repartition(11), "source", 7, "doc_id").toPandas()
    assert compare_typed(a, b) == []


def test_stratified_sample_uses_window_group_limit(spark):
    """rank<=n must push a per-partition top-n below the stratum
    exchange (WindowGroupLimit) — without it a hot stratum sorts in
    one task and the operator does not scale."""
    from example_kafkastreams_spark.operators.sampling import (
        stratified_sample,
    )

    docs = load_table(spark, SMOKE, "documents")
    plan = explain_str(stratified_sample(docs, "source", 7, "doc_id"), "formatted")
    assert "WindowGroupLimit" in plan


def test_lm_score_external_model_oov_floor(spark):
    """An EXTERNAL model scores unseen grams as probability 0 while
    still counting them — an all-OOV doc scores 0.0 instead of
    vanishing, and n_bigrams stays 'the doc's bigram count'."""
    train = spark.createDataFrame([Row(doc_id=1, text="a b a b a")])
    model = bigram_model(train)
    new = spark.createDataFrame(
        [
            Row(doc_id=10, text="a b a"),   # fully in-vocab
            Row(doc_id=11, text="x y z"),   # fully OOV
            Row(doc_id=12, text="a b x"),   # half OOV
        ]
    )
    out = {r["doc_id"]: r for r in lm_score(new, model=model).collect()}
    assert set(out) == {10, 11, 12}
    assert out[11]["lm_score"] == 0.0 and out[11]["n_bigrams"] == 2
    assert out[12]["n_bigrams"] == 2
    assert 0 < out[12]["lm_score"] < out[10]["lm_score"]


# --- fuzzy decontamination ------------------------------------------------

_PARA_BASE = (
    "the quick brown fox jumps over the lazy dog and runs far on to the"
    " house of the old friend near the tall green tree by the long wide"
    " river bank today"
)


def _paraphrase(seed: int) -> str:
    # substitute every 5th token: NO shared 5-token run survives, but
    # the unigram shingle set stays ~80% intact
    out = _PARA_BASE.split()
    for i in range(0, len(out), 5):
        out[i] = f"sub{seed}{i}"
    return " ".join(out)


def test_fuzzy_decontamination_catches_paraphrase(spark):
    """The MinHash-band report flags a paraphrase that EXACT 5-gram
    overlap cannot see (every shared 5-token run is broken), and
    leaves an unrelated doc untouched."""
    from example_kafkastreams_spark.operators.decontam import (
        contamination_report_fuzzy,
        decontaminate_fuzzy,
    )

    bench = spark.createDataFrame([Row(doc_id=100, text=_PARA_BASE)])
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=_paraphrase(2)),
            Row(doc_id=2, text=" ".join(f"zzz{i}" for i in range(32))),
        ]
    )
    # exact decontamination is blind to this paraphrase
    assert contamination_report(corpus, bench, n=5).count() == 0
    hits = {
        r["doc_id"]: r["n_band_hits"]
        for r in contamination_report_fuzzy(
            corpus, bench, shingle_n=1
        ).collect()
    }
    assert set(hits) == {1} and 1 <= hits[1] <= 4
    kept = [
        r["doc_id"]
        for r in decontaminate_fuzzy(corpus, bench, shingle_n=1).collect()
    ]
    assert kept == [2]


# --- semantic dedup -------------------------------------------------------


def test_semantic_dedup_collapses_tight_clusters(spark):
    """SemDeDup composition: near-identical embeddings collapse to the
    min id of their transitive cluster; distant vectors survive; the
    result is partition-independent."""
    import math

    from example_kafkastreams_spark.operators.knn import semantic_dedup
    from pyspark.sql import types as T

    def unit(seed, dim=64):
        import random

        rng = random.Random(seed)
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def jitter(v, eps, seed):
        import random

        rng = random.Random(seed)
        w = [x + rng.gauss(0, eps) for x in v]
        n = math.sqrt(sum(x * x for x in w))
        return [x / n for x in w]

    a = unit(1)
    b = unit(2)
    rows = [
        (10, a),
        (11, jitter(a, 0.002, 3)),  # ~0.9999 cosine with 10
        (12, jitter(a, 0.002, 6)),  # cluster of three
        (20, b),
        (21, jitter(b, 0.002, 5)),
        (30, unit(6)),              # singleton
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = spark.createDataFrame(rows, schema)
    out = {r["vec_id"]: r for r in semantic_dedup(emb, threshold=0.98).collect()}
    assert set(out) == {10, 11, 12, 20, 21, 30}
    assert all(out[i]["kept_id"] == 10 for i in (10, 11, 12))
    assert all(out[i]["kept_id"] == 20 for i in (20, 21))
    assert out[30]["kept_id"] == 30 and out[30]["is_survivor"]
    assert sorted(i for i, r in out.items() if r["is_survivor"]) == [10, 20, 30]
    # partition-independent
    from example_kafkastreams_spark.operators.cache import (
        release_sketch_caches,
    )

    a_pd = semantic_dedup(emb, threshold=0.98).toPandas()
    release_sketch_caches()
    b_pd = semantic_dedup(emb.repartition(5), threshold=0.98).toPandas()
    release_sketch_caches()
    assert compare_typed(a_pd, b_pd) == []


def test_semantic_dedup_contracts_exact_duplicates(spark):
    """A k-way duplicated vector collapses through the exact-vector
    contraction: kept_id = min id across ALL copies and transitive
    near-neighbors, and the pair join sees one representative per
    distinct vector (C(k,2) cosine-1 pairs never materialize)."""
    import math
    import random

    from example_kafkastreams_spark.operators.cache import (
        release_sketch_caches,
    )
    from example_kafkastreams_spark.operators.knn import semantic_dedup
    from pyspark.sql import types as T

    rng = random.Random(7)
    v = [rng.gauss(0, 1) for _ in range(64)]
    n = math.sqrt(sum(x * x for x in v))
    v = [x / n for x in v]
    w = [x + rng.gauss(0, 0.002) for x in v]
    nw = math.sqrt(sum(x * x for x in w))
    w = [x / nw for x in w]
    other = [rng.gauss(0, 1) for _ in range(64)]
    no = math.sqrt(sum(x * x for x in other))
    other = [x / no for x in other]

    rows = [(100 + i, v) for i in range(10)]  # 10 exact copies
    rows += [(50, w), (200, other)]           # near-dup of v; unrelated
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            spark.createDataFrame(rows, schema), threshold=0.98
        ).collect()
    }
    release_sketch_caches()
    assert len(out) == 12
    # the near-dup id 50 < all copy ids, so IF 50 and the copies share
    # a bucket the whole cluster keeps 50; at minimum all 10 copies
    # share one kept_id and only one of them can survive
    copy_kept = {out[100 + i]["kept_id"] for i in range(10)}
    assert len(copy_kept) == 1
    survivors = [i for i, r in out.items() if r["is_survivor"]]
    assert 200 in survivors and len(survivors) <= 3


def test_pairs_with_semantic_matches_standalone_operators(spark):
    """The shared-scan composition behind q47's merged row produces
    EXACTLY bucketed_similar_pairs' top-n and semantic_dedup's labels
    — including on a corpus with exact-duplicate vectors, where the
    standalone operator contracts before the pair join and the
    composition relies on cosine-1 edges instead."""
    import math
    import random

    from example_kafkastreams_spark.operators.cache import (
        release_sketch_caches,
    )
    from example_kafkastreams_spark.operators.knn import (
        bucketed_similar_pairs,
        pairs_with_semantic,
        semantic_dedup,
    )
    from pyspark.sql import types as T

    rng = random.Random(11)

    def unit():
        v = [rng.gauss(0, 1) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    base = unit()
    rows = [(i, base) for i in (5, 6, 7)]          # exact duplicates
    rows += [(i * 10, unit()) for i in range(1, 9)]  # spread
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = spark.createDataFrame(rows, schema)

    top_c, sem_c = pairs_with_semantic(emb, top_n=5, threshold=0.9)
    top_c, sem_c = top_c.toPandas(), sem_c.toPandas()
    release_sketch_caches()
    top_s = bucketed_similar_pairs(emb, top_n=5).toPandas()
    release_sketch_caches()
    sem_s = semantic_dedup(emb, threshold=0.9).toPandas()
    release_sketch_caches()
    assert compare_typed(top_c, top_s) == []
    assert compare_typed(sem_c, sem_s) == []


# --- UDTF extension surface ----------------------------------------------


def test_chunk_udtf_matches_expression_path(spark):
    """The Arrow UDTF chunker (the §2.8 user-extension escape hatch)
    reproduces chunk_documents' exact layout via a SQL LATERAL join —
    pinning the extension path to the declared zero-shuffle operator."""
    from example_kafkastreams_spark.functions.udtfs import register_udtfs
    from example_kafkastreams_spark.operators.text_chunks import (
        chunk_documents,
    )

    register_udtfs(spark)
    docs = load_table(spark, SMOKE, "documents").limit(60)
    docs.createOrReplaceTempView("__udtf_docs")
    got = spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
           FROM __udtf_docs d, LATERAL chunk_text(d.text, 32, 24) c"""
    ).toPandas()
    want = chunk_documents(docs, chunk_size=32, stride=24).toPandas()
    assert compare_typed(got, want) == []


def test_exact_dedup_with_delta_matches_composition(spark):
    """The fused one-pass form equals exact_text_dedup on the full
    corpus AND incremental_exact_dedup(delta, index) — including
    cross-split duplicate groups falling on either side."""
    from example_kafkastreams_spark.operators.cache import (
        release_sketch_caches,
    )
    from example_kafkastreams_spark.operators.neardup import (
        exact_dedup_with_delta,
        exact_text_dedup,
        incremental_exact_dedup,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "shared text alpha"), (4, "shared text alpha"),  # both sides
        (2, "index only beta"), (5, "index only beta"),
        (3, "delta only gamma"), (6, "delta only gamma"),    # 6%3==0, 3: delta
        (9, "delta only gamma"),
        (7, "index solo"), (12, "delta solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cond = F.col("doc_id") % 3 == 0
    full_f, incr_f = exact_dedup_with_delta(docs, cond, persist=True)
    full_w = exact_text_dedup(docs)
    index = exact_text_dedup(docs.filter(~cond))
    incr_w = incremental_exact_dedup(docs.filter(cond), index)
    cols = ["content_hash", "doc_id", "n_copies"]
    assert compare_typed(
        full_f.select(cols).toPandas(), full_w.select(cols).toPandas()
    ) == []
    assert compare_typed(
        incr_f.select(cols).toPandas(), incr_w.select(cols).toPandas()
    ) == []
    release_sketch_caches()
    # sanity: 'delta only gamma' group (ids 3,6,9 all delta) survives
    # with min id 3 and n_copies 3; shared/index groups are absent
    got = {r.content_hash: r for r in incr_f.collect()}
    release_sketch_caches()
    assert sorted((r.doc_id, r.n_copies) for r in got.values()) == [
        (3, 3), (12, 1),
    ]


def test_exact_dedup_with_delta_tagged_matches_two_frame(spark):
    """The single-pass exploded form equals the two-frame variant's
    tagged union, row for row."""
    from example_kafkastreams_spark.operators.neardup import (
        exact_dedup_with_delta,
        exact_dedup_with_delta_tagged,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, SMOKE, "documents")
    cond = F.col("doc_id") % 3 == 0
    full, incr = exact_dedup_with_delta(docs, cond)
    cols = ["mode", "content_hash", "doc_id", "n_copies"]
    want = (
        full.select(F.lit("full").alias("mode"), "content_hash",
                    "doc_id", "n_copies")
        .unionByName(
            incr.select(F.lit("incr").alias("mode"), "content_hash",
                        "doc_id", "n_copies")
        )
        .select(cols)
        .toPandas()
    )
    got = (
        exact_dedup_with_delta_tagged(docs, cond).select(cols).toPandas()
    )
    assert compare_typed(got, want) == []


def test_assign_split_deterministic_and_leakage_safe(spark):
    """The shipped split: ratios approximately honored, assignment
    identical under repartitioning (pure content-hash), byte-identical
    texts ALWAYS share a split regardless of ids (the leakage
    property), and bad ratios refuse loudly."""
    import pytest

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.functions import portable as P
    from example_kafkastreams_spark.operators.sampling import assign_split

    docs = load_table(spark, SMOKE, "documents")
    out = assign_split(docs)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / n > 0.6  # 80% nominal, small-corpus slack

    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split)
         for r in assign_split(docs.repartition(7)).collect()}
    assert a == b

    # leakage: two ids carrying the same bytes share a split
    twins = spark.createDataFrame(
        [(1, "exactly the same document text"),
         (2, "exactly the same document text"),
         (3, "a different document body here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.split for r in assign_split(twins).collect()}
    assert got[1] == got[2]

    with pytest.raises(ValueError):
        assign_split(docs, [("train", 0.5), ("val", 0.1)])
    with pytest.raises(ValueError):
        P.split_assign("text", [("only", 1.0)], P.SPARK)
    with pytest.raises(ValueError):  # names are spliced into SQL
        P.split_assign("text", [("tr'ain", 0.5), ("val", 0.5)], P.SPARK)


def test_weighted_sample_deterministic_and_proportional(spark):
    """weight 0 keeps nothing, weight 1 keeps everything, the
    survivor set is identical under repartitioning and re-runs, and
    acceptance tracks the weight (higher-weight strata keep more)."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("double").alias("w01"),
        F.when(F.col("id") % 2 == 0, F.lit(0.1))
        .otherwise(F.lit(0.9))
        .alias("wmix"),
    )
    zero_one = weighted_sample(df, "w01", "k")
    kept = zero_one.select("k").collect()
    assert all(r.k % 2 == 1 for r in kept)          # w=0 rows all gone
    assert len(kept) == 1000                        # w=1 rows all kept

    a = sorted(r.k for r in weighted_sample(df, "wmix", "k").collect())
    b = sorted(
        r.k
        for r in weighted_sample(
            df.repartition(13), "wmix", "k"
        ).collect()
    )
    assert a == b                                    # layout-independent
    lo = sum(1 for k in a if k % 2 == 0)
    hi = sum(1 for k in a if k % 2 == 1)
    assert 50 < lo < 150 and 800 < hi < 1000         # ~0.1 / ~0.9

    # weights outside [0, 1] clamp rather than corrupt the threshold
    clamped = weighted_sample(
        df.withColumn("wbad", (F.col("k") - 1000).cast("double")), "wbad", "k"
    )
    kept_bad = {r.k for r in clamped.select("k").collect()}
    assert kept_bad == {k for k in range(1001, 2000)} | (
        kept_bad & set(range(1001))
    )  # w>=1 ids all kept; w<=0 ids all dropped
    assert not any(k <= 1000 for k in kept_bad)


def test_priority_sample_exact_k_and_weight_sensitivity(spark):
    """Priority sampling returns EXACTLY k rows, is repartition-
    invariant, and is weight-sensitive: a row whose weight dominates
    the total is (near-)certainly kept, and doubling every weight
    changes nothing (priorities scale monotonically)."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.operators.sampling import (
        priority_sample,
    )

    rows = [(i, 1.0 if i != 7 else 10000.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = priority_sample(df, "w", "id", 10).toPandas()
    assert len(got) == 10
    assert 7 in set(got["id"])  # the heavy row is kept

    again = priority_sample(df.repartition(13), "w", "id", 10).toPandas()
    assert sorted(got["id"]) == sorted(again["id"])

    doubled = priority_sample(
        df.withColumn("w", F.col("w") * 2), "w", "id", 10
    ).toPandas()
    assert sorted(got["id"]) == sorted(doubled["id"])


def test_priority_sample_take_ordered_plan(spark):
    """The physical plan must be TakeOrderedAndProject (per-partition
    local top-k, no global sort/exchange of the corpus)."""
    from example_kafkastreams_spark.operators.sampling import (
        priority_sample,
    )

    df = spark.range(1000).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS w")
    plan = (
        priority_sample(df, "w", "id", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_priority_sample_per_group(spark):
    """Exactly k per group (fewer when smaller), weight-sensitive
    within each group, repartition-invariant, and the global
    priority_sample restricted to one group's rows agrees with the
    per-group quota for that group; the rank<=k predicate triggers
    WindowGroupLimit."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.operators.sampling import (
        priority_sample,
        priority_sample_per_group,
    )

    rows = [
        (i, "g" + str(i % 3), 1.0 if i != 7 else 10000.0)
        for i in range(60)
    ] + [(100, "tiny", 1.0)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    got = priority_sample_per_group(df, "grp", "w", "id", 5).toPandas()
    sizes = got.groupby("grp").size().to_dict()
    assert sizes == {"g0": 5, "g1": 5, "g2": 5, "tiny": 1}
    assert 7 in set(got["id"])  # heavy row survives in its group

    again = priority_sample_per_group(
        df.repartition(13), "grp", "w", "id", 5
    ).toPandas()
    assert sorted(got["id"]) == sorted(again["id"])

    # agreement with the global operator on a single-group restriction
    g1 = df.filter(F.col("grp") == "g1")
    glob = sorted(r.id for r in priority_sample(g1, "w", "id", 5).collect())
    per = sorted(got[got["grp"] == "g1"]["id"])
    assert glob == list(per)

    plan = (
        priority_sample_per_group(df, "grp", "w", "id", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


# --- per-column table profiler ----------------------------------------------

def test_profile_columns_matches_duckdb(spark):
    import duckdb

    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.report import (
        profile_columns,
        profile_columns_sql,
    )

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    dtypes = {f.name: f.dataType.simpleString() for f in orders.schema.fields}
    got = {
        r["column_name"]: r.asDict()
        for r in profile_columns(orders).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'"
        )
        want = con.execute(
            profile_columns_sql("orders", dtypes)
        ).fetch_df().set_index("column_name").to_dict("index")
    finally:
        con.close()
    assert set(got) == set(want)
    for c in got:
        for k, v in want[c].items():
            gv = got[c][k]
            if v != v:  # NaN == SQL NULL pad
                assert gv is None, (c, k, gv)
            else:
                assert gv == v, (c, k, gv, v)


def test_profile_columns_nulls_and_single_pass(spark):
    import pandas as pd

    from example_kafkastreams_spark.operators.report import profile_columns

    pdf = pd.DataFrame(
        {
            "a": [1, None, 3, 3],
            "s": ["x", None, None, "yy"],
        }
    )
    df = spark.createDataFrame(pdf).selectExpr(
        "CAST(a AS BIGINT) AS a", "CAST(s AS STRING) AS s"
    )
    rows = {r["column_name"]: r for r in profile_columns(df).collect()}
    assert rows["a"]["n_rows"] == 4
    assert rows["a"]["n_null"] == 1
    assert rows["a"]["n_distinct"] == 2
    assert rows["a"]["min_num"] == 1.0 and rows["a"]["max_num"] == 3.0
    assert rows["a"]["min_str"] is None and rows["a"]["avg_len"] is None
    assert rows["s"]["n_null"] == 2
    assert rows["s"]["min_str"] == "x" and rows["s"]["max_str"] == "yy"
    assert rows["s"]["avg_len"] == 1.5
    # TWO single-shape aggregation passes (plain + exact-distinct)
    # joined on their 1-row results — the r11 split that avoids the
    # mixed-aggregate Expand plan — and still no per-COLUMN fan-out:
    # one Join total, no Union, and the Aggregate count is the two
    # passes (+1 for the distinct rewrite), never O(columns)
    plan = profile_columns(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 3
    assert plan.count("Join") == 1 and "Union" not in plan


def test_assign_split_grouped_never_spans_clusters(spark):
    """The grouped split's defining property: zero spanning clusters
    on a graph where the plain content-hash split DOES leak, and
    members take exactly their canonical's split."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.operators.sampling import (
        assign_split,
        assign_split_grouped,
    )

    docs = spark.createDataFrame(
        [(i, f"document body number {i} with words") for i in range(60)],
        "doc_id long, text string",
    )
    # clusters of 3: {0,1,2}, {3,4,5}, ... — different texts per
    # member, so the plain split scatters some cluster
    comp = spark.createDataFrame(
        [(i, (i // 3) * 3) for i in range(60)],
        "doc_id long, component_id long",
    )
    g = assign_split_grouped(docs, comp)
    rows = g.select("doc_id", "component_id", "split").collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, set()).add(r.split)
    assert all(len(v) == 1 for v in by_comp.values())
    # the plain split leaks on this data (sanity that the test bites)
    plain = assign_split(docs).join(comp, "doc_id").collect()
    by_comp_p = {}
    for r in plain:
        by_comp_p.setdefault(r.component_id, set()).add(r.split)
    assert any(len(v) > 1 for v in by_comp_p.values())
    # members take the canonical's split
    canon_split = {r.component_id: r.split for r in rows
                   if r.doc_id == r.component_id}
    assert all(r.split == canon_split[r.component_id] for r in rows)
