"""Index maintenance: compaction for the persistent dedup indexes.

The idempotent ingest sinks (pipelines.corpus_ingest_with_index /
corpus_ingest_with_neardup_index) write one
``ingest_run=…/ingest_batch=…`` parquet partition per micro-batch —
exactly-once under replay, but after thousands of batches every
per-batch index re-read pays a many-small-files listing, and the
zero-exchange bucketed-index join (plan-proved in
tests/test_incremental_neardup.py) is only reachable via a bucketed
rewrite no sink performs. ``compact_index`` is that rewrite, callable
BETWEEN runs: dedup the accumulated rows to their canonical
representatives, publish a hash-bucketed catalog table for
exchange-free delta joins, and swap the path artifact for a
single-partition compacted copy so streaming sinks (which read the
PATH, where bucket metadata cannot live) keep working unchanged.

Applies to every index grain this engine persists:
* digest index   — (doc_id, content_hash); key = content_hash
* MinHash bands  — (doc_id, sig, band_idx, band_key); key = the rest
* SimHash bands  — (doc_id, simhash, band_idx, band_val); key = rest
* window hashes  — (whash); key = whash (no id column)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.bucketed import read_bucketed, write_bucketed

# Synthetic partition token for the compacted path artifact. A real
# sink token is a 16-hex digest/uuid slice, so no batch's
# own-partition replay-exclusion filter can ever match this value.
COMPACTED_RUN = "__compacted__"

_INGEST_PARTS = ("ingest_run", "ingest_batch")


def compact_index(
    spark: SparkSession,
    index_path: str,
    bucket_cols: list[str],
    key_cols: list[str] | None = None,
    id_col: str | None = "doc_id",
    num_buckets: int = 32,
    table_name: str | None = None,
) -> DataFrame:
    """Compact the index at ``index_path``; returns the bucketed
    catalog frame (join it exchange-free on ``bucket_cols``).

    1. **Dedup to canonical reps.** Rows are grouped on ``key_cols``
       (default: every column except ``id_col`` and the ingest
       partition columns) keeping the MIN ``id_col`` — the same
       min-id representative convention the band-index builders use,
       so admission decisions over the compacted index are identical
       (ids are never read by admission, only distinct keys, but the
       canonical form keeps re-compaction idempotent). Indexes with
       no id column (the whash index) compact to ``distinct()``.
    2. **Bucketed catalog table** (``table_name``, default derived
       from the path): hash-bucketed on ``bucket_cols`` so the index
       side of every future delta join needs no exchange.
    3. **Path swap.** The path artifact is rewritten as ONE
       ``ingest_run=__compacted__/ingest_batch=0`` partition (plain
       parquet if the source had no ingest partitions) via
       write-to-temp + directory rename, so a crash before the swap
       leaves the original fully intact. Streaming sinks keep reading
       the path with no code change; their dynamic-partition-overwrite
       appends land beside the compacted partition and the next
       compaction folds them in.

    Rename-based swap is atomic on a POSIX filesystem; on an object
    store run compaction only while no ingest query is writing (the
    "between runs" contract).
    """
    df = spark.read.parquet(index_path)
    had_parts = all(c in df.columns for c in _INGEST_PARTS)
    body = df.drop(*_INGEST_PARTS) if had_parts else df

    if id_col is not None and id_col in body.columns:
        keys = key_cols or [c for c in body.columns if c != id_col]
        compacted = (
            body.groupBy(*keys)
            .agg(F.min(id_col).alias(id_col))
            # restore the original column order — readers (and the
            # bucketed twin) see the exact pre-compaction schema
            .select(*body.columns)
        )
    else:
        compacted = (
            body.select(*(key_cols or body.columns)).distinct()
        )

    if table_name is None:
        base = os.path.basename(os.path.normpath(index_path))
        table_name = "idx_" + "".join(
            ch if ch.isalnum() else "_" for ch in base
        )
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    shutil.rmtree(os.path.join(warehouse, table_name), ignore_errors=True)
    write_bucketed(compacted, table_name, bucket_cols, num_buckets)

    # path swap: temp write, then two renames — readers either see the
    # old many-partition layout or the compacted one, never a mix
    tmp = index_path.rstrip("/") + ".__compact_tmp__"
    old = index_path.rstrip("/") + ".__pre_compact__"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    # num_buckets output files, clustered on the join keys (NOT one
    # file: a 100 TB corpus's digest index is itself large) — same
    # clustering as the catalog twin, just without bucket metadata
    clustered = compacted.repartition(
        num_buckets, *[F.col(c) for c in bucket_cols]
    )
    if had_parts:
        (
            clustered.select(
                "*",
                F.lit(COMPACTED_RUN).alias("ingest_run"),
                F.lit(0).alias("ingest_batch"),
            )
            .write.partitionBy(*_INGEST_PARTS)
            .parquet(tmp)
        )
    else:
        clustered.write.parquet(tmp)
    os.rename(index_path.rstrip("/"), old)
    os.rename(tmp, index_path.rstrip("/"))
    shutil.rmtree(old, ignore_errors=True)

    return read_bucketed(spark, table_name)
