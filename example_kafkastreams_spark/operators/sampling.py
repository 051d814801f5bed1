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
