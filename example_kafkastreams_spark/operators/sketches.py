"""Cardinality sketches — cross-engine-EXACT approximate distincts.

``approx_count_distinct`` (HyperLogLog) can never be oracle-checked:
Spark's and DuckDB's HLL implementations hash differently and round
differently. KMV (k minimum values; Bar-Yossef et al. 2002) can: the
sketch is "the k smallest distinct hash values", the hash is the
dual-dialect ``portable.token_hash32`` (identical BIGINTs in both
engines), and the estimator ``(k-1)·2³² / h_k`` is one exact integer
product and one IEEE division — bit-equal across engines by
construction. Relative standard error ≈ 1/√(k−2) (~13% at k=64).

Scale shape (the reason to sketch at all): a local
``dense_rank() ≤ k`` per input partition prunes to the rows covering
each partition's k smallest DISTINCT hashes BEFORE any exchange
(dense_rank, not row_number — duplicates of one small hash must not
evict a larger distinct hash from the local top-k), so the global
distinct+sort touches ≤ partitions·k candidate values, never the
corpus. Exact distinct-count of the same column shuffles every value;
the sketch shuffles a bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions import portable as P

HASH_SPACE = float(2**32)


def kmv_distinct(
    values: DataFrame,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """One row: (k_used, kth_hash, est_distinct) for the distinct
    cardinality of ``value_col``.

    ``k_used`` is the number of distinct hashes found (< ``k`` means
    the sketch saw the whole domain and ``est_distinct`` is exact —
    the standard small-cardinality degenerate case).
    """
    h = P.token_hash32(value_col, P.SPARK)
    # NULL values hash to NULL and would sort FIRST under Spark's
    # ascending NULL ordering, inflating k_used — drop them (a NULL is
    # not a distinct value in count-distinct semantics either)
    hashed = values.select(F.expr(h).alias("__h")).filter(
        F.col("__h").isNotNull()
    )
    local = W.partitionBy(F.spark_partition_id()).orderBy("__h")
    cand = (
        hashed.withColumn("__r", F.dense_rank().over(local))
        .filter(F.col("__r") <= k)
        .select("__h")
        .distinct()
    )
    top = cand.orderBy("__h").limit(k)
    return top.agg(
        F.count(F.lit(1)).cast("int").alias("k_used"),
        F.max("__h").alias("kth_hash"),
    ).select(
        "k_used",
        "kth_hash",
        F.when(
            F.col("k_used") < k, F.col("k_used").cast("double")
        )
        .otherwise(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE)
            / F.col("kth_hash").cast("double")
        )
        .alias("est_distinct"),
    )


def kmv_distinct_sql(value_sql: str, k: int = 64) -> str:
    """DuckDB twin of ``kmv_distinct`` over ``value_sql`` (a CTE/table
    with one column ``v``): same hashes, same estimator, same bits."""
    h = P.token_hash32("v", P.DUCK)
    return f"""
    SELECT k_used, kth_hash,
           CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
                ELSE CAST({float(k - 1)!r} AS DOUBLE)
                     * CAST({HASH_SPACE!r} AS DOUBLE)
                     / CAST(kth_hash AS DOUBLE)
           END AS est_distinct
    FROM (
      SELECT CAST(count(*) AS INTEGER) AS k_used, max(h) AS kth_hash
      FROM (
        SELECT DISTINCT {h} AS h FROM ({value_sql}) ORDER BY h LIMIT {k}
      )
    )
    """


def count_min_counters(
    values: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch counters: (d, bucket, cnt), depth·width rows.

    Each value emits ``depth`` (row, bucket) coordinates map-side —
    bucket_d = token_hash32(d || ':' || v) % width — and ONE hash
    aggregation builds every counter (partial agg collapses the
    per-partition mass before the exchange, which carries at most
    depth·width rows per partition). Counters are EXACT integers, so
    the sketch is deterministic and cross-engine reproducible —
    unlike sampled sketches, a CM sketch's content depends only on
    the multiset, never on partitioning.
    """
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    (
                        F.expr(
                            P.token_hash32(
                                f"CONCAT('{d}:', {value_col})", P.SPARK
                            )
                        )
                        % width
                    ).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("__c")
    return (
        values.filter(F.col(value_col).isNotNull())
        .select(coords)
        .select(F.col("__c.d").alias("d"), F.col("__c.bucket").alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimates(
    values: DataFrame,
    value_col: str,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(probe value, cms_est, exact_cnt) per probe — the point-query
    side of the sketch: est = min over d of counter[d][bucket_d(v)],
    always ≥ the true count (CM's one-sided guarantee; equality when
    no collision). ``probes`` is a small one-column frame (broadcast);
    the exact count joins in for quality reporting."""
    counters = count_min_counters(values, value_col, depth, width)
    pb = probes.select(
        F.col(probes.columns[0]).alias("__pv")
    ).distinct()
    coords = pb.select(
        "__pv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            F.expr(
                                P.token_hash32(
                                    f"CONCAT('{d}:', __pv)", P.SPARK
                                )
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__c"),
    ).select(
        "__pv",
        F.col("__c.d").alias("d"),
        F.col("__c.bucket").alias("bucket"),
    )
    est = (
        coords.join(counters, ["d", "bucket"], "left")
        .groupBy("__pv")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
    exact = (
        values.join(F.broadcast(pb), F.col(value_col) == F.col("__pv"))
        .groupBy("__pv")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return est.join(exact, "__pv", "left").select(
        F.col("__pv").alias("probe"),
        "cms_est",
        F.coalesce("exact_cnt", F.lit(0)).alias("exact_cnt"),
    )
