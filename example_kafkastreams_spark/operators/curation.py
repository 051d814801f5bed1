"""Cluster-based data curation — prototypicality pruning over an
embedding column.

Sorscher et al. 2022 ("Beyond neural scaling laws: beating power law
scaling via data pruning"): rank every example by how PROTOTYPICAL it
is — cosine similarity to its cluster centroid — and keep a fraction
per cluster. With abundant data, pruning the most prototypical
(easy, redundant) examples beats random subsetting; with scarce data,
keep the easy ones. Per-cluster quotas keep the kept set covering the
whole distribution instead of collapsing onto dense modes — the same
reason SemDeDup (``knn.semantic_dedup``) works per-bucket.

Spark shapes, by stage:

- **Assignment** is the IVF cell pick. With trained/literal centroids
  (``cents``) it is ``ivf_flat_encode``'s spliced-literal argmax — a
  pure map-side expression, ZERO corpus shuffle. With a centroid
  DataFrame (the deterministic-sample convention the oracle can
  re-derive) it is a broadcast join + ``max_by`` hash agg: the
  |corpus|×|centroids| scored rows collapse map-side (centroids were
  broadcast), so the one exchange carries one row per vector.
- **Ranking** (``cluster_prune``) is a per-cluster ``row_number`` —
  one exchange keyed by cluster. At 100 TB with small k this skews
  (one task per cluster); the scale path is
  ``cluster_prune_by_threshold``: derive a per-cluster score cutoff
  from a BOUNDED summary (``sketches.histogram_build`` per cluster —
  k·B rows — gives a quantile whose bucket bounds the error, or an
  exact per-cluster count + a sampled quantile), then prune with a
  MAP-SIDE filter against the broadcast cutoffs — no per-cluster sort
  of the corpus ever happens.

Cross-engine determinism: the cosine fold is the portable expression
(identical IEEE op sequence in Spark and DuckDB), argmax ties fall to
the lowest centroid id in both engines, and the keep rank carries the
id tie-break — so the kept SET is bit-reproducible, which is what the
q47 ``prune`` branch hash-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions import portable as P

__all__ = [
    "cluster_assign",
    "cluster_prune",
    "cluster_prune_by_threshold",
    "prune_thresholds",
]


def cluster_assign(
    emb: DataFrame,
    cents: list[list[float]] | None = None,
    cent_df: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, proto) — nearest-centroid cluster id and the
    cosine to it (the prototypicality score).

    ``cents`` (trained literals) → zero-shuffle spliced-literal argmax
    (the ``ivf_flat_encode`` plan). ``cent_df`` (columns ``cid``,
    ``cv`` — e.g. a deterministic sample of the corpus) → broadcast
    join + map-side-collapsing ``max_by``. Exactly one must be given.
    """
    if (cents is None) == (cent_df is None):
        raise ValueError("pass exactly one of cents / cent_df")
    if cents is not None:
        cos_arr = "array(" + ", ".join(
            P.cosine(vec_col, P.vec_literal(c, P.SPARK), P.SPARK)
            for c in cents
        ) + ")"
        return emb.select(
            F.col(id_col),
            F.expr(
                f"CAST(array_position({cos_arr}, array_max({cos_arr}))"
                " - 1 AS BIGINT)"
            ).alias("cluster"),
            F.expr(f"array_max({cos_arr})").alias("proto"),
        )
    cos = F.expr(P.cosine("__v", "cv", P.SPARK))
    return (
        emb.select(F.col(id_col), F.col(vec_col).alias("__v"))
        .join(F.broadcast(cent_df))
        .groupBy(id_col)
        .agg(
            F.max_by(F.col("cid"), F.struct(cos, -F.col("cid"))).alias(
                "cluster"
            ),
            F.max(cos).alias("proto"),
        )
    )


def cluster_prune(
    assigned: DataFrame,
    keep_frac: float,
    keep: str = "hard",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster quota prune of a ``cluster_assign`` result: keep
    ``ceil(keep_frac · |cluster|)`` examples per cluster — the LEAST
    prototypical first when ``keep="hard"`` (the abundant-data regime
    where redundant easy examples waste tokens), the MOST prototypical
    first when ``keep="easy"`` (the scarce-data regime). Returns every
    row with ``keep_rank``, ``n_cluster`` and a ``kept`` flag so
    callers audit the decision; filter on ``kept`` to prune.

    The window is one exchange keyed by cluster; see module docstring
    for the skew-free threshold variant at scale."""
    if keep not in ("hard", "easy"):
        raise ValueError(f"keep must be 'hard' or 'easy', got {keep!r}")
    order = (
        F.col("proto").asc() if keep == "hard" else F.col("proto").desc()
    )
    w = W.partitionBy("cluster").orderBy(order, F.col(id_col))
    return (
        assigned.withColumn("keep_rank", F.row_number().over(w))
        .withColumn(
            "n_cluster", F.count(F.lit(1)).over(W.partitionBy("cluster"))
        )
        .withColumn(
            "kept",
            F.col("keep_rank")
            <= F.ceil(F.lit(float(keep_frac)) * F.col("n_cluster")),
        )
    )


def prune_thresholds(
    assigned: DataFrame,
    keep_frac: float,
    keep: str = "hard",
    n_buckets: int = 256,
) -> dict[int, float]:
    """Per-cluster score cutoffs for ``cluster_prune_by_threshold``,
    from ONE ``histogram_sketch_grouped`` pass (exchange ≤ k·n_buckets
    rows — the 100 TB replacement for the per-cluster window sort).
    ``keep="hard"`` returns each cluster's keep_frac-quantile UPPER
    bucket edge (keeping proto <= it never under-keeps the quota;
    over-keep bounded by one bucket's mass), ``"easy"`` the mirrored
    (1-keep_frac) LOWER edge. The collect is bounded by construction:
    clusters × buckets rows."""
    from .sketches import histogram_quantile, histogram_sketch_grouped

    if keep not in ("hard", "easy"):
        raise ValueError(f"keep must be 'hard' or 'easy', got {keep!r}")
    rows = histogram_sketch_grouped(
        assigned, ["cluster"], "proto", lo=-1.0, hi=1.0,
        n_buckets=n_buckets,
    ).collect()
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(int(r["cluster"]), []).append(
            {"bucket": r["bucket"], "cnt": r["cnt"]}
        )
    cuts: dict[int, float] = {}
    for c, hist in per.items():
        if keep == "hard":
            cuts[c] = histogram_quantile(
                hist, float(keep_frac), -1.0, 1.0, n_buckets
            )[1]
        else:
            cuts[c] = histogram_quantile(
                hist, 1.0 - float(keep_frac), -1.0, 1.0, n_buckets
            )[0]
    return cuts


def cluster_prune_by_threshold(
    assigned: DataFrame,
    thresholds: dict[int, float],
    keep: str = "hard",
) -> DataFrame:
    """The 100 TB prune: map-side filter against per-cluster score
    cutoffs (from a bounded summary — per-cluster histogram quantile
    or sampled percentile — computed WITHOUT sorting the corpus).
    ``keep="hard"`` keeps proto <= cutoff, ``"easy"`` keeps >=. The
    cutoffs ride the plan as a literal CASE over ≤ k clusters; no
    exchange at all."""
    if keep not in ("hard", "easy"):
        raise ValueError(f"keep must be 'hard' or 'easy', got {keep!r}")
    cut = F.coalesce(
        *[
            F.when(F.col("cluster") == int(c), F.lit(float(t)))
            for c, t in sorted(thresholds.items())
        ]
    ) if thresholds else F.lit(None).cast("double")
    cond = F.col("proto") <= cut if keep == "hard" else F.col("proto") >= cut
    return assigned.filter(cond)
