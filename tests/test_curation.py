"""Prototypicality pruning (operators/curation.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.curation import (
    cluster_assign,
    cluster_prune,
    cluster_prune_by_threshold,
)


def _emb(spark, sf="/root/testdata/sf0.001"):
    from example_kafkastreams_spark.catalog import load_table

    return load_table(spark, sf, "embeddings")


def _cent_df(emb, k=4):
    return emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )


def test_literal_and_dataframe_assignment_agree(spark):
    """The zero-shuffle spliced-literal argmax and the broadcast
    max_by agg are the same assignment — trained centroids are a
    literal substitution."""
    emb = _emb(spark)
    cents = [
        [float(x) for x in r[0]]
        for r in emb.filter(F.col("vec_id") < 4)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    a = {
        r["vec_id"]: (r["cluster"], round(r["proto"], 9))
        for r in cluster_assign(emb, cents=cents).collect()
    }
    b = {
        r["vec_id"]: (r["cluster"], round(r["proto"], 9))
        for r in cluster_assign(emb, cent_df=_cent_df(emb)).collect()
    }
    assert a == b


def test_literal_assignment_is_map_side(spark):
    """Trained-centroid assignment must not shuffle the corpus."""
    from example_kafkastreams_spark.plans.checks import count_exchanges

    emb = _emb(spark)
    cents = [
        [float(x) for x in r[0]]
        for r in emb.filter(F.col("vec_id") < 4).select("embedding").collect()
    ]
    assert count_exchanges(cluster_assign(emb, cents=cents)) == 0
    # ...and the threshold prune on top of it stays exchange-free
    pruned = cluster_prune_by_threshold(
        cluster_assign(emb, cents=cents), {0: 0.5, 1: 0.5, 2: 0.5, 3: 0.5}
    )
    assert count_exchanges(pruned) == 0


def test_prune_quota_and_direction(spark):
    emb = _emb(spark)
    assigned = cluster_assign(emb, cent_df=_cent_df(emb))
    res = cluster_prune(assigned, keep_frac=0.3, keep="hard").collect()
    by_cluster: dict = {}
    for r in res:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for rows in by_cluster.values():
        n = rows[0]["n_cluster"]
        kept = [r for r in rows if r["kept"]]
        assert len(kept) == math.ceil(0.3 * n)
        # hard keeps the LOWEST-proto rows: every kept proto <= every
        # dropped proto (ties broken by id inside the window)
        max_kept = max(r["proto"] for r in kept)
        dropped = [r["proto"] for r in rows if not r["kept"]]
        if dropped:
            assert max_kept <= min(dropped) + 1e-12
    easy = cluster_prune(assigned, keep_frac=0.3, keep="easy").collect()
    kept_hard = {r["vec_id"] for r in res if r["kept"]}
    kept_easy = {r["vec_id"] for r in easy if r["kept"]}
    assert kept_hard != kept_easy  # opposite ends of the ranking


def test_keep_frac_one_keeps_everything(spark):
    emb = _emb(spark)
    assigned = cluster_assign(emb, cent_df=_cent_df(emb))
    res = cluster_prune(assigned, keep_frac=1.0)
    assert res.filter(~F.col("kept")).count() == 0
    assert res.count() == emb.count()


def test_threshold_prune_matches_quota_via_histogram(spark):
    """The scale path: per-cluster cutoffs from the mergeable
    histogram's quantile bound reproduce a quota prune within the
    bucket-width error bound — kept counts land in [target, target +
    bucket mass]."""
    from example_kafkastreams_spark.operators.curation import (
        prune_thresholds,
    )

    emb = _emb(spark)
    assigned = cluster_assign(emb, cent_df=_cent_df(emb)).cache()
    try:
        # hard prune: keep below the 30th-percentile proto from ONE
        # grouped-histogram pass; the bucket's UPPER edge over-keeps
        # by at most one bucket's mass
        cuts = prune_thresholds(assigned, 0.3, keep="hard", n_buckets=64)
        kept = cluster_prune_by_threshold(assigned, cuts, keep="hard")
        per = {
            r["cluster"]: r["n"]
            for r in kept.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        totals = {
            r["cluster"]: r["n"]
            for r in assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for c, n in totals.items():
            target = math.ceil(0.3 * n)
            assert per.get(c, 0) >= target  # quantile edge never under-keeps
    finally:
        assigned.unpersist()


def test_bad_args_raise(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError):
        cluster_assign(emb)
    with pytest.raises(ValueError):
        cluster_assign(emb, cents=[[0.0]], cent_df=_cent_df(emb))
    assigned = cluster_assign(emb, cent_df=_cent_df(emb))
    with pytest.raises(ValueError):
        cluster_prune(assigned, 0.5, keep="sideways")
    with pytest.raises(ValueError):
        cluster_prune_by_threshold(assigned, {}, keep="sideways")


def test_grouped_histogram_equals_per_group(spark):
    """histogram_sketch_grouped == one histogram_sketch per group,
    in a single pass."""
    from example_kafkastreams_spark.operators.sketches import (
        histogram_sketch,
        histogram_sketch_grouped,
    )

    emb = _emb(spark)
    assigned = cluster_assign(emb, cent_df=_cent_df(emb)).cache()
    try:
        got = {
            (r["cluster"], r["bucket"]): r["cnt"]
            for r in histogram_sketch_grouped(
                assigned, ["cluster"], "proto", -1.0, 1.0, 64
            ).collect()
        }
        want = {}
        for c in [
            r["cluster"]
            for r in assigned.select("cluster").distinct().collect()
        ]:
            for r in histogram_sketch(
                assigned.filter(F.col("cluster") == c).select(
                    F.col("proto").alias("v")
                ),
                "v", -1.0, 1.0, 64,
            ).collect():
                want[(c, r["bucket"])] = r["cnt"]
        assert got == want
    finally:
        assigned.unpersist()


def test_prune_thresholds_easy_direction(spark):
    """easy keeps the TOP of the proto range: the easy cutoff's kept
    set and the hard cutoff's kept set at the same frac overlap only
    in the histogram-edge slack."""
    from example_kafkastreams_spark.operators.curation import (
        prune_thresholds,
    )

    emb = _emb(spark)
    assigned = cluster_assign(emb, cent_df=_cent_df(emb)).cache()
    try:
        hard = prune_thresholds(assigned, 0.3, keep="hard")
        easy = prune_thresholds(assigned, 0.3, keep="easy")
        for c in hard:
            assert easy[c] >= hard[c]  # easy cutoff sits above hard's
        kept_easy = cluster_prune_by_threshold(assigned, easy, "easy")
        # never under-keeps the 30% quota
        tot = dict(
            (r["cluster"], r["n"])
            for r in assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        per = dict(
            (r["cluster"], r["n"])
            for r in kept_easy.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for c, n in tot.items():
            assert per.get(c, 0) >= math.ceil(0.3 * n)
    finally:
        assigned.unpersist()


def test_more_centroids_than_vectors(spark):
    """k > |sample| centroid frames still assign every vector."""
    emb = _emb(spark).limit(3)
    cent = _emb(spark).filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    out = cluster_assign(emb, cent_df=cent)
    assert out.count() == 3
    assert out.filter(F.col("cluster").isNull()).count() == 0
