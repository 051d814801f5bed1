"""Training-pair mining and deterministic data ordering.

Two pieces a large-scale embedding/LLM training pipeline runs after
the corpus funnel:

* contrastive pair mining — (anchor, positive) pairs from the
  near-dup component graph (documents the dedup pass PROVED similar),
  plus deterministic hash-bucketed negatives. The classic recipe for
  training retrieval/embedding models from an unlabeled corpus
  (in-batch negatives bootstrapped from near-duplicate supervision).
* epoch shuffle / curriculum order — reproducible global data orders:
  a per-epoch pseudorandom permutation key, and a coarse-to-fine
  curriculum key (difficulty bin, then hash). Both are pure column
  expressions — the ORDER is a property of the key, so a consumer can
  range-partition by it (one exchange) or bucket it into shards with
  zero global sort.

Everything is md5-derived (functions.portable.token_hash32), so every
key is reproducible across engines, runs, and partitionings — no
rand(), no shuffle-order dependence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..functions import portable as P


def _hash32(col_expr: str) -> Column:
    return F.expr(P.token_hash32(col_expr, P.SPARK))


def contrastive_pairs(
    comp: DataFrame,
    neg_per_anchor: int = 1,
    num_buckets: int | None = None,
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Mine (anchor, partner, is_positive) training pairs from a
    connected-components labeling (operators.components output:
    ``id_col`` + ``component_id``).

    Positives are the component star edges — each non-representative
    member paired with its component minimum (the same k−1
    contraction the dedup graph uses, so no C(k,2) blowup). Negatives
    are mined WITHOUT a cartesian: nodes hash into ``num_buckets``
    pseudo-random buckets (seeded, content-independent), each anchor
    meets only its own bucket's candidates, same-component and
    self pairs are excluded, and the ``neg_per_anchor`` survivors per
    anchor are picked by pair-hash rank — fully deterministic under
    any partitioning. Bucket size ≈ N/``num_buckets`` bounds the
    join's per-anchor fan-out, so negative mining is
    O(N·bucket_size), never O(N²).

    Default ``num_buckets`` targets ~64 candidates per bucket. Anchors
    in an underfilled bucket (everyone a component-mate) yield fewer
    negatives — acceptable for training-pair mining; widen buckets if
    exact quotas matter.
    """
    pos = comp.filter(F.col(id_col) != F.col("component_id")).select(
        F.col("component_id").alias("anchor"),
        F.col(id_col).alias("partner"),
        F.lit(True).alias("is_positive"),
    )

    if num_buckets is None:
        # one count job; the labeling is persisted — skipped entirely
        # when the caller supplies the bucket count (q57 feeds it from
        # the cheap doc count precisely to avoid this job)
        num_buckets = max(1, comp.count() // 64)
    bucket = (
        _hash32(f"concat(CAST({id_col} AS STRING), ':b{seed}')")
        % num_buckets
    )
    nodes = comp.select(
        F.col(id_col), F.col("component_id"), bucket.alias("__bucket")
    )
    a = nodes.alias("a")
    c = nodes.alias("c")
    cand = a.join(
        c,
        (F.col("a.__bucket") == F.col("c.__bucket"))
        & (F.col(f"a.{id_col}") != F.col(f"c.{id_col}"))
        & (F.col("a.component_id") != F.col("c.component_id")),
    ).select(
        F.col(f"a.{id_col}").alias("anchor"),
        F.col(f"c.{id_col}").alias("partner"),
    )
    pair_rank = W.partitionBy("anchor").orderBy(
        _hash32(
            f"concat(CAST(anchor AS STRING), ':', "
            f"CAST(partner AS STRING), ':n{seed}')"
        ),
        F.col("partner"),
    )
    neg = (
        cand.withColumn("__r", F.row_number().over(pair_rank))
        .filter(F.col("__r") <= neg_per_anchor)
        .drop("__r")
        .withColumn("is_positive", F.lit(False))
    )
    return pos.unionByName(neg)


def hard_negative_pairs(
    emb: DataFrame,
    comp: DataFrame,
    k: int = 2,
    num_anchors: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    comp_id_col: str = "doc_id",
) -> DataFrame:
    """Hard negatives for contrastive training: per anchor, the top-k
    COSINE-nearest vectors that are NOT in the anchor's near-dup
    component — the most-confusable non-duplicates, the pairs that
    actually move an embedding model (random negatives are trivially
    separable). ``contrastive_pairs`` gives the cheap random picks;
    this gives the curriculum's hard end.

    Shape: the anchor side broadcasts (bounded by ``num_anchors``),
    the corpus streams through the scored join once, and the top-k is
    the house two-phase rank — no per-key corpus sort. Component
    labels join onto both sides as (id, component) pairs (label-sized,
    not vector-sized). For corpora too big for brute-force scoring,
    shortlist first (matryoshka_knn / pca_knn / the ANN family) and
    anti-join components after — the exclusion composes with any
    scorer.
    """
    from .knn import _two_phase_topk

    lab = comp.select(
        F.col(comp_id_col).alias("__id"),
        F.col("component_id").alias("__comp"),
    )
    e = emb.join(
        lab, emb[id_col] == lab["__id"], "left"
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.coalesce(F.col("__comp"), F.col(id_col)).alias("__comp"),
    )
    q = e.filter(
        F.col(id_col) < num_anchors
        if num_anchors is not None
        else F.lit(True)
    ).select(
        F.col(id_col).alias("anchor"),
        F.col(vec_col).alias("qv"),
        F.col("__comp").alias("qc"),
    )
    c = e.select(
        F.col(id_col).alias("partner"),
        F.col(vec_col).alias("cv"),
        F.col("__comp").alias("cc"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("partner") != F.col("anchor"))
        & (F.col("cc") != F.col("qc")),
    ).withColumn("__cos", F.expr(P.cosine("qv", "cv", P.SPARK)))
    return _two_phase_topk(
        scored,
        "anchor",
        [F.col("__cos").desc(), F.col("partner")],
        k,
        rank_name="neg_rank",
    ).select(
        "anchor",
        "partner",
        F.expr(P.round_dbl("__cos", 6, P.SPARK)).alias("cosine"),
        "neg_rank",
    )


def epoch_shuffle_key(
    id_col: str = "doc_id", epoch: int = 0
) -> Column:
    """Deterministic per-epoch permutation key: hash32(id:epoch).
    Sorting (or range-bucketing) by it reshuffles the corpus every
    epoch with zero state — the multi-epoch training-order convention.
    """
    return _hash32(
        f"concat(CAST({id_col} AS STRING), ':e{int(epoch)}')"
    )


def curriculum_bins(
    df: DataFrame, score_col: str, n_bins: int
) -> list[float]:
    """Exact bin edges (interior percentiles) for a curriculum over
    ``score_col`` — ONE aggregation job collecting n_bins−1 doubles
    (bounded by construction)."""
    probs = [i / n_bins for i in range(1, n_bins)]
    [row] = df.agg(
        F.expr(
            f"percentile({score_col}, array("
            + ",".join(f"CAST('{p!r}' AS DOUBLE)" for p in probs)
            + "))"
        ).alias("edges")
    ).collect()
    return [float(x) for x in row["edges"]]


def curriculum_order(
    df: DataFrame,
    score_col: str,
    edges: list[float],
    id_col: str = "doc_id",
    ascending: bool = True,
) -> DataFrame:
    """Coarse-to-fine curriculum key: ``curriculum_bin`` (0-based CASE
    over literal ``edges`` — easy→hard when ascending) and
    ``curriculum_key`` (the within-bin deterministic hash shuffle).
    Pure map-side expressions; consumers order or shard by
    (curriculum_bin, curriculum_key). Edges are LITERALS (from
    ``curriculum_bins`` or domain knowledge), so the assignment is
    reproducible and the plan stays scan-fused."""
    b = F.lit(len(edges))
    for i in reversed(range(len(edges))):
        b = F.when(F.col(score_col) <= F.lit(edges[i]), i).otherwise(b)
    if not ascending:
        b = F.lit(len(edges)) - b
    return df.withColumn("curriculum_bin", b.cast("int")).withColumn(
        "curriculum_key", epoch_shuffle_key(id_col, 0)
    )
