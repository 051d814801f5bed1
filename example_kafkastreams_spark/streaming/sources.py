"""Streaming sources/sinks (SURVEY.md §2.1 S1-S6, Spark-first).

The reference consumes/produces Kafka topics with Kryo-serialized
case classes (Kafka.scala:62-92); our engine standardizes on
Structured Streaming DataFrames with JSON payloads:

- S1/S2 ``kafka_stream``      — readStream kafka → parse → event-time col
- S3/S4 ``kafka_sink``        — to_json(struct(*)) → writeStream kafka
- S5    ``memory_sink``       — console/log consumer analog (tests)
- S6    ``rate_events``       — synthetic generator analog (rate source)
-       ``file_stream``       — replayable file-backed topic analog; the
                                unit tests feed golden sequences this way

``parse_kafka_records`` is a pure DataFrame→DataFrame transformation so
it is unit-testable without a broker: the Kafka source schema (key,
value: binary; timestamp) is what it consumes, whether those rows come
from readStream.format("kafka") or a batch fixture.

Event-time mapping: the reference's FailOnInvalidTimestamp
(Kafka.scala:35,45,84) crashes on invalid timestamps; our analog keeps
the Kafka record timestamp as ``ts`` and a strict ``from_json`` whose
NULL results can be asserted on (fail-fast filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: T.StructType,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1: subscribe → keyed stream with event-time column ``ts``."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_records(raw, value_schema)


def parse_kafka_records(raw: DataFrame, value_schema: T.StructType) -> DataFrame:
    """(key, value: binary, timestamp) → typed columns + ``ts``.

    The Kafka record timestamp becomes the event-time column (reference:
    context().timestamp(), ClickstreamJoinExample.scala:334).
    """
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col("timestamp").alias("ts"),
    ).select("key", "v.*", "ts")


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str,
    trigger_seconds: int = 5,
):
    """S3: keyed JSON sink; 5 s trigger mirrors the reference's commit
    interval (Kafka.scala:51,85)."""
    payload_cols = [c for c in df.columns if c != key_col]
    out = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replayable file-backed stream; one file ≈ one micro-batch when
    ``max_files_per_trigger=1`` (how the golden tests stage batches)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def rate_events(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """S6 analog: deterministic synthetic event stream from the rate
    source (reference: scripted producers,
    ClickstreamJoinExample.scala:115-161)."""
    return spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load().select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 100).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("value") % 3 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("value") % 1000 / 10.0).alias("value"),
    )


def start_memory_sink(
    df: DataFrame,
    name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """S5 analog for tests: results land in an in-memory table.

    Default micro-batch trigger (not availableNow: stateful
    applyInPandasWithState queries do not terminate under it) — drive
    with ``query.processAllAvailable()`` then ``stop()``.
    """
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
