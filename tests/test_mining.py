"""Contrastive pair mining + deterministic ordering (operators/mining.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.mining import (
    contrastive_pairs,
    curriculum_bins,
    curriculum_order,
    epoch_shuffle_key,
)


def _comp(spark):
    # components: {1,2,3} (rep 1), {4,5} (rep 4), singletons 6..9
    rows = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)] + [
        (i, i) for i in range(6, 10)
    ]
    return spark.createDataFrame(rows, "doc_id long, component_id long")


def test_contrastive_positives_are_star_edges(spark):
    pairs = contrastive_pairs(_comp(spark), neg_per_anchor=0, num_buckets=1)
    pos = {(r.anchor, r.partner) for r in pairs.collect()}
    assert pos == {(1, 2), (1, 3), (4, 5)}


def test_contrastive_negatives_never_same_component(spark):
    comp = _comp(spark)
    pairs = contrastive_pairs(comp, neg_per_anchor=2, num_buckets=1)
    label = {r.doc_id: r.component_id for r in comp.collect()}
    negs = [r for r in pairs.collect() if not r.is_positive]
    assert negs
    for r in negs:
        assert label[r.anchor] != label[r.partner]
        assert r.anchor != r.partner
    # quota honored per anchor in the single full bucket
    from collections import Counter

    per_anchor = Counter(r.anchor for r in negs)
    assert all(v == 2 for v in per_anchor.values())


def test_contrastive_pairs_partition_invariant(spark):
    comp = _comp(spark)
    a = sorted(
        map(tuple, contrastive_pairs(
            comp, neg_per_anchor=1, num_buckets=2
        ).collect())
    )
    b = sorted(
        map(tuple, contrastive_pairs(
            comp.repartition(7), neg_per_anchor=1, num_buckets=2
        ).collect())
    )
    assert a == b


def test_hard_negative_pairs_excludes_component_and_ranks(spark):
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.knn import brute_force_knn
    from example_kafkastreams_spark.operators.mining import (
        hard_negative_pairs,
    )
    from tests.conftest import SMOKE

    emb = load_table(spark, SMOKE, "embeddings")
    # components: pair up ids (2i, 2i+1) — every even anchor's twin is
    # its component-mate and must NEVER appear as a negative
    comp = emb.select(
        F.col("vec_id").alias("doc_id"),
        (F.col("vec_id") - F.col("vec_id") % 2).alias("component_id"),
    )
    out = hard_negative_pairs(emb, comp, k=3, num_anchors=8)
    rows = out.collect()
    assert {r.anchor for r in rows} == set(range(8))
    for r in rows:
        assert r.partner != r.anchor
        assert (r.partner - r.partner % 2) != (r.anchor - r.anchor % 2)
    # per anchor: ranks 1..3, cosine non-increasing
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.anchor, []).append((r.neg_rank, r.cosine))
    for a, lst in by_anchor.items():
        lst.sort()
        assert [x[0] for x in lst] == [1, 2, 3]
        assert all(
            lst[i][1] >= lst[i + 1][1] for i in range(len(lst) - 1)
        )
    # the hard negatives are the brute-force top neighbors minus the
    # component: with singleton-ish components, rank-1 negatives match
    # the brute top-1 whenever that neighbor isn't the anchor's twin
    truth = {
        (r.query_id, r.knn_rank): r.neighbor_id
        for r in brute_force_knn(emb, num_queries=8, k=1).collect()
    }
    for a in range(8):
        top = truth[(a, 1)]
        if (top - top % 2) != (a - a % 2):
            got1 = [r.partner for r in rows
                    if r.anchor == a and r.neg_rank == 1]
            assert got1 == [top], (a, got1, top)


def test_epoch_shuffle_distinct_orders_per_epoch(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    o0 = [
        r.doc_id
        for r in df.orderBy(epoch_shuffle_key("doc_id", 0), "doc_id").collect()
    ]
    o0b = [
        r.doc_id
        for r in df.orderBy(epoch_shuffle_key("doc_id", 0), "doc_id").collect()
    ]
    o1 = [
        r.doc_id
        for r in df.orderBy(epoch_shuffle_key("doc_id", 1), "doc_id").collect()
    ]
    assert o0 == o0b          # reproducible
    assert o0 != o1           # epochs permute differently
    assert sorted(o0) == sorted(o1)


def test_curriculum_bins_and_order(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id").cast("double") / 100).alias("score"),
    )
    edges = curriculum_bins(df, "score", 4)
    assert len(edges) == 3
    out = curriculum_order(df, "score", edges)
    rows = {r.doc_id: r.curriculum_bin for r in out.collect()}
    # monotone: higher score -> same or later bin; all 4 bins used
    assert rows[0] == 0 and rows[99] == 3
    assert {rows[i] for i in range(100)} == {0, 1, 2, 3}
    for i in range(99):
        assert rows[i] <= rows[i + 1]
    # descending curriculum flips the bins
    desc = curriculum_order(df, "score", edges, ascending=False)
    drows = {r.doc_id: r.curriculum_bin for r in desc.collect()}
    assert drows[0] == 3 and drows[99] == 0


def test_ordering_keys_are_map_side(spark):
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.plans import count_exchanges
    from tests.conftest import SMOKE

    docs = load_table(spark, SMOKE, "documents").select("doc_id")
    keyed = docs.withColumn("k", epoch_shuffle_key("doc_id", 3))
    assert count_exchanges(keyed) == 0


def test_contrastive_pairs_explicit_buckets_skip_count_job(spark):
    """ADVICE r9 regression: an explicit num_buckets must skip the
    comp.count() job entirely (q57 feeds the bucket count from the
    cheap doc count for exactly this reason)."""
    comp = _comp(spark)
    counted = {"n": 0}
    orig = type(comp).count
    type(comp).count = lambda self: counted.__setitem__(
        "n", counted["n"] + 1
    ) or orig(self)
    try:
        pairs = contrastive_pairs(comp, neg_per_anchor=1, num_buckets=1)
        pairs.collect()
        assert counted["n"] == 0, "explicit num_buckets ran count()"
    finally:
        type(comp).count = orig
