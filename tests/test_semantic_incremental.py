"""Incremental semantic dedup (knn.srp_bucket_index /
admit_against_srp_index) — VERDICT r6 item 3: the persistent
SRP-bucket rep table and the poisoned-component delta admission, held
to the same contract as the text band indexes: two-delta ingest ==
one-shot ``semantic_dedup`` closure on bridge-free corpora, exact
duplicates contract losslessly, the index stays delta-proportional."""

import math
import random

from pyspark.sql import functions as F, types as T

from example_kafkastreams_spark.operators.cache import (
    release_sketch_caches,
)
from example_kafkastreams_spark.operators.knn import (
    admit_against_srp_index,
    semantic_dedup,
    srp_bucket_index,
)

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

THRESHOLD = 0.95


def _unit(rng, dim=64):
    v = [rng.gauss(0, 1) for _ in range(dim)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _jitter(rng, c, eps=0.01):
    v = [x + rng.gauss(0, eps) for x in c]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _corpus(spark):
    """Bridge-free fixture: 4 well-separated clusters. ids 0-11 are
    day-1 (clusters 0,1 fully; cluster 2 partially), ids 20-31 are
    day-2 (rest of cluster 2 — near-dups of admitted content — plus
    cluster 3 and one exact duplicate of a day-1 vector)."""
    rng = random.Random(77)
    centers = [_unit(rng) for _ in range(4)]
    day1 = (
        [(i, _jitter(rng, centers[0])) for i in range(0, 4)]
        + [(i, _jitter(rng, centers[1])) for i in range(4, 8)]
        + [(i, _jitter(rng, centers[2])) for i in range(8, 12)]
    )
    day2 = (
        [(i, _jitter(rng, centers[2])) for i in range(20, 23)]
        + [(i, _jitter(rng, centers[3])) for i in range(23, 28)]
        + [(30, day1[0][1])]  # exact duplicate of vec 0
        + [(31, _unit(rng))]  # genuinely novel singleton
    )
    return day1, day2


def test_two_delta_ingest_equals_one_shot(spark):
    day1, day2 = _corpus(spark)
    full = spark.createDataFrame(day1 + day2, SCHEMA)
    one_shot = {
        r.vec_id
        for r in semantic_dedup(full, threshold=THRESHOLD)
        .filter("is_survivor")
        .collect()
    }
    release_sketch_caches()

    d1 = spark.createDataFrame(day1, SCHEMA)
    d2 = spark.createDataFrame(day2, SCHEMA)
    s1, i1 = admit_against_srp_index(d1, None, threshold=THRESHOLD)
    s1_ids = {r.vec_id for r in s1.collect()}
    idx1 = spark.createDataFrame(
        [(r.vec_id, r.embedding, r.bucket) for r in i1.collect()],
        "vec_id long, embedding array<float>, bucket int",
    )
    release_sketch_caches()
    s2, i2 = admit_against_srp_index(d2, idx1, threshold=THRESHOLD)
    s2_ids = {r.vec_id for r in s2.collect()}
    i2_rows = i2.collect()
    release_sketch_caches()

    assert s1_ids | s2_ids == one_shot
    # day-2 near-dups of admitted clusters (20-22) and the exact
    # duplicate (30) are dropped; novel content (23..27 -> min 23, 31)
    # is admitted
    assert s2_ids == {23, 31}
    # the index grows by the ADMITTED components' distinct vectors
    # only — delta-proportional, never a corpus rewrite
    assert {r.vec_id for r in i2_rows} == {23, 24, 25, 26, 27, 31}


def test_exact_duplicate_contracts_and_gates(spark):
    """An identical vector always lands in the same bucket, so the
    min-id contraction is lossless: a day-2 exact copy cross-collides
    at cosine 1 and drops."""
    rng = random.Random(3)
    v = _unit(rng)
    w = _unit(rng)
    d1 = spark.createDataFrame([(0, v)], SCHEMA)
    d2 = spark.createDataFrame([(10, v), (11, v), (12, w)], SCHEMA)
    _, i1 = admit_against_srp_index(d1, None, threshold=THRESHOLD)
    idx1 = spark.createDataFrame(i1.collect(), i1.schema)
    release_sketch_caches()
    s2, i2 = admit_against_srp_index(d2, idx1, threshold=THRESHOLD)
    assert {r.vec_id for r in s2.collect()} == {12}
    # the poisoned component {10, 11} contributes NOTHING to the index
    assert {r.vec_id for r in i2.collect()} == {12}
    release_sketch_caches()


def test_poisoned_component_dropped_wholesale(spark):
    """One cross-colliding member drops its whole within-delta
    component — including members that never touch the index."""
    rng = random.Random(9)
    c = _unit(rng)
    d1 = spark.createDataFrame([(0, _jitter(rng, c))], SCHEMA)
    # 10 near-dups index content; 11 near-dups 10 (same cluster)
    d2 = spark.createDataFrame(
        [(10, _jitter(rng, c)), (11, _jitter(rng, c)), (12, _unit(rng))],
        SCHEMA,
    )
    _, i1 = admit_against_srp_index(d1, None, threshold=THRESHOLD)
    idx1 = spark.createDataFrame(i1.collect(), i1.schema)
    release_sketch_caches()
    s2, _ = admit_against_srp_index(d2, idx1, threshold=THRESHOLD)
    assert {r.vec_id for r in s2.collect()} == {12}
    release_sketch_caches()


def test_index_is_distinct_vector_reps(spark):
    """srp_bucket_index: one row per distinct vector, min-id rep,
    bucket carried — and identical to what bootstrap admission
    appends for a clean corpus."""
    rng = random.Random(5)
    v, w = _unit(rng), _unit(rng)
    emb = spark.createDataFrame(
        [(3, v), (1, v), (2, w)], SCHEMA
    )
    rows = sorted(
        (r.vec_id, r.bucket) for r in srp_bucket_index(emb).collect()
    )
    assert [i for i, _ in rows] == [1, 2]
    release_sketch_caches()


def test_survivor_schema_matches_delta(spark):
    rng = random.Random(6)
    d = spark.createDataFrame([(0, _unit(rng))], SCHEMA)
    s, i = admit_against_srp_index(d, None)
    assert s.columns == ["vec_id", "embedding"]
    assert i.columns == ["vec_id", "embedding", "bucket"]
    release_sketch_caches()
