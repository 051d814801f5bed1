"""Bucketed batch tables — the persistent form of co-partitioning.

SURVEY.md §4: the reference's whole optimization is keeping both topics
partitioned by the same key so join state is partition-local
(ClickstreamJoinExample.scala:184-189). The batch/warehouse analog is
hash-bucketed storage: two tables bucketed by the join key into the
same bucket count join with ZERO exchanges — the scan itself delivers
co-located partitions (plan-asserted in tests).

At 100 TB this is the difference between shuffling the fact table on
every join and shuffling it once at ingest: bucket the big tables on
their dominant join/agg key (`user_id` for events, `l_orderkey` for
lineitem) and every downstream equi-join/groupBy on that key skips its
exchange. ``sortBy`` within buckets additionally enables merge-join
without a sort step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed on
    ``bucket_cols`` (registered in the session catalog — bucket
    metadata only survives through the catalog, not bare paths)."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
