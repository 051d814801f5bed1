"""Deterministic stratified sampling — exact per-stratum quotas.

Training pipelines carve reproducible per-domain holdouts ("exactly N
docs per source for eval") and balanced subsets. `sampleBy` gives
fractions with seed-dependent Bernoulli draws; this operator gives an
EXACT quota, engine-reproducible: rows rank within their stratum by
md5(id) — a stable pseudo-random order any engine can replay — and
rank ≤ n survives.

Scale shape: the rank is a per-stratum window, which would naively
sort each stratum in one task (hot stratum = straggler). Spark ≥3.5's
WindowGroupLimit rewrite saves exactly this pattern: a rank ≤ n
predicate right above a window pushes a per-map-partition top-n below
the exchange, so the stratum shuffle carries at most n·partitions
rows per stratum instead of the stratum. The plan test asserts the
rewrite fires — without it this operator would be a 100 TB
scale-killer, with it the shuffle is quota-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as P


def assign_split(
    df: DataFrame,
    ratios: list[tuple[str, float]] | dict[str, float] | None = None,
    content_col: str = "text",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic, leakage-safe train/val/test assignment — the
    split a training-data release ships next to its data card.

    Each row gets a named split from the 32-bit hash of its CONTENT
    column against exact precomputed integer thresholds
    (``functions.portable.split_assign``): no rand(), no TABLESAMPLE,
    so the assignment is identical across engines, runs, and
    partitionings — and because the hash is over content,
    byte-identical documents land in the SAME split regardless of
    their ids (hashing the id instead would scatter exact duplicates
    across train and eval — the classic leakage bug this operator
    exists to prevent; near-duplicate leakage is the dedup/
    decontamination stages' job upstream). Ratios default to the
    80/10/10 convention. Pure map-side column expression: the 100 TB
    assignment is scan-fused, zero shuffle."""
    if ratios is None:
        ratios = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    if isinstance(ratios, dict):
        ratios = list(ratios.items())
    return df.withColumn(
        split_col, F.expr(P.split_assign(content_col, ratios, P.SPARK))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, deterministically.

    The per-stratum order is md5 of the id (unique by contract, so no
    ties): re-running, repartitioning, or re-implementing in another
    engine selects the SAME rows. Output keeps the input schema.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n_per_stratum)
        .drop("__rank")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
) -> DataFrame:
    """Deterministic IMPORTANCE sampling: each row accepted
    independently with probability = its ``weight_col`` value
    (clamped to [0, 1]) — the quality-weighted subsampling a
    training-data pipeline runs instead of uniform downsampling
    (upweight high-quality documents, downweight boilerplate) without
    rand()'s seed/partitioning dependence.

    Acceptance = hash32(id) < floor(weight · 2³²): the same exact
    integer-threshold construction as ``mix_sources``/``assign_split``
    but with a PER-ROW threshold, so any weight expression both
    engines compute bit-identically (ratios of exact values, spliced
    literals) yields the same survivor set everywhere. Pure map-side
    filter — scan-fused, zero shuffle at any scale. Re-running with
    the same weights reselects the SAME rows (a stable sample under
    re-ingestion); to redraw, salt the id upstream."""
    w = F.least(
        F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)),
        F.lit(1.0),
    )
    thr = F.floor(w * F.lit(4294967296.0)).cast("bigint")
    h = F.expr(P.token_hash32(f"CAST({id_col} AS STRING)", P.SPARK))
    return df.filter(h < thr)


def priority_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup 2007): EXACTLY ``k``
    rows, selected weight-sensitively — the budget-exact complement of
    ``weighted_sample`` (which gives each row an independent
    acceptance probability and therefore only an EXPECTED size).
    Heavy rows are (near-)certain to be kept, light rows keep a
    weight-proportional chance; with the (k+1)-th priority as the
    estimator threshold the sample supports unbiased subset-sum
    estimates — the principled way to carve "the best N documents'
    worth" from a weighted corpus.

    Priority = weight / u with u the row's deterministic uniform
    integer, hash32(id) + 1 ∈ [1, 2³²]; the top k priorities (ties
    broken by id) survive. One IEEE division of a double by an exact
    integer — correctly rounded in every engine, so the selected SET
    is engine-/run-/partitioning-identical; no rand(), no libm
    (the exponential-jump A-ES formulation needs pow/log — this
    rational form is the cross-engine-exact equivalent regime).

    Scale shape: orderBy(...).limit(k) compiles to
    TakeOrderedAndProject — each map partition keeps its local top-k
    and only k·partitions candidate rows reach the driver-side merge;
    no global sort, no full-corpus exchange, at any scale."""
    u = (
        F.expr(P.token_hash32(f"CAST({id_col} AS STRING)", P.SPARK))
        + F.lit(1)
    )
    prio = F.col(weight_col).cast("double") / u
    return (
        df.withColumn("__prio", prio)
        .orderBy(F.col("__prio").desc(), F.col(id_col))
        .limit(k)
        .drop("__prio")
    )


def priority_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """``priority_sample`` PER STRATUM: exactly ``k`` rows from every
    group (fewer when the group is smaller), weight-sensitively —
    "the best N documents' worth per source", the quota-AND-quality
    carve that combines ``stratified_sample``'s exact quotas with
    priority sampling's weight sensitivity. Same deterministic
    priority = weight / (hash32(id) + 1), rank within the group by
    (priority DESC, id), keep rank ≤ k.

    Scale shape: the rank ≤ k predicate over the partitioned window
    triggers Spark's WindowGroupLimit rewrite (the
    ``stratified_sample`` plan discipline) — each map partition
    pre-prunes to k rows per group below the exchange, so the group
    shuffle carries at most k·partitions rows per group, never the
    stratum."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (
        F.expr(P.token_hash32(f"CAST({id_col} AS STRING)", P.SPARK))
        + F.lit(1)
    )
    prio = F.col(weight_col).cast("double") / u
    w = Window.partitionBy(group_col).orderBy(
        F.col("__prio").desc(), F.col(id_col)
    )
    return (
        df.withColumn("__prio", prio)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__prio", "__rk")
    )


def assign_split_grouped(
    docs: DataFrame,
    components: DataFrame,
    ratios: list[tuple[str, float]] | dict[str, float] | None = None,
    id_col: str = "doc_id",
    content_col: str = "text",
    comp_col: str = "component_id",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe GROUPED split — the FIX for what
    ``report.split_leakage_report`` audits: ``assign_split`` keeps
    byte-identical documents together, but a NEAR-duplicate pair can
    still straddle train/eval because two slightly-different texts
    hash apart. Here the near-dup CLUSTER is the unit of assignment:
    every member takes the split of its cluster CANONICAL's content
    hash, so no cluster can span a boundary BY CONSTRUCTION (zero
    spanning clusters — q57's ``gsplit`` branch ships the proof row).

    The canonical's CONTENT (not its id) keys the hash, so the
    assignment survives re-ingestion under new ids as long as the
    canonical text does — the same release-stability argument as
    ``assign_split``. Exchanges: two id-keyed joins (docs ⨝ labels,
    labels ⨝ canonical splits); the canonical-split frame is
    component-sized. Returns ``docs`` + (comp_col, split_col).

    Contract: ``components`` must cover every doc (the
    ``connected_components(nodes=docs)`` output does — isolated docs
    label themselves); a doc absent from the label table silently
    drops from the assignment, which is never what a release wants."""
    if ratios is None:
        ratios = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    if isinstance(ratios, dict):
        ratios = list(ratios.items())
    canon = components.filter(
        F.col(id_col) == F.col(comp_col)
    ).select(comp_col)
    canon_txt = docs.join(
        canon, docs[id_col] == canon[comp_col]
    ).select(comp_col, content_col)
    csplit = canon_txt.select(
        comp_col,
        F.expr(P.split_assign(content_col, ratios, P.SPARK)).alias(
            split_col
        ),
    )
    return docs.join(components.select(id_col, comp_col), id_col).join(
        csplit, comp_col
    )
