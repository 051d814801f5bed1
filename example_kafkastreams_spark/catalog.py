"""Table loaders over the driver-generated parquet testdata.

Reading parquet with the schema left to the footer (not inferSchema-style
guessing) keeps column pruning + predicate pushdown intact: Catalyst
prunes ``ReadSchema`` to referenced columns and pushes comparison
filters into the scan. ``load_table`` is the single entry point so every
operator/query reads through the same code path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .schemas import TABLE_NAMES, TESTDATA_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # The testdata parquet stores timestamps as TIMESTAMP(NANOS), which
    # vanilla Spark rejects (PARQUET_TYPE_ILLEGAL). nanosAsLong is a
    # runtime-settable SQL conf, so set it here rather than relying on the
    # session factory — load_table must work under ANY caller-provided
    # session (e.g. the correctness driver's).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The generator has shipped two physical timestamp shapes across
    # rounds, and load_table must accept BOTH under any caller-provided
    # session (the correctness driver builds its own):
    #   * timestamp[us] with isAdjustedToUTC=false (current): with
    #     inferTimestampNTZ disabled the SCAN ITSELF emits TimestampType
    #     (raw micros read as UTC instants — identical values to the
    #     legacy path below under the pinned-UTC session). Crucially this
    #     keeps timestamp predicates pushable into the parquet scan
    #     (PushedFilters shows GreaterThanOrEqual(ts, ...)), which a
    #     post-scan NTZ->LTZ cast would forfeit — at 100 TB that is the
    #     difference between pruning row groups and reading them all.
    #   * TIMESTAMP(NANOS) (rounds 1-2): with nanosAsLong they arrive as
    #     int64 ns; convert via integer DIV 1000 — the same
    #     floor-to-micros truncation DuckDB applies, so oracle comparison
    #     is exact.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(table_path(sf_dir, name))
    for field in TESTDATA_SCHEMAS[name].fields:
        if not isinstance(field.dataType, T.TimestampType):
            continue
        read_type = df.schema[field.name].dataType
        if isinstance(read_type, T.LongType):
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"{field.name} DIV 1000"))
            )
        elif isinstance(read_type, T.TimestampNTZType):
            # Fallback if a future Spark drops the infer conf: cast keeps
            # wall-clock values for any session timezone.
            df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register each table as a temp view for the SQL entry points."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
