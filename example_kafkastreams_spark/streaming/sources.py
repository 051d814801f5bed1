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

import datetime as _dt

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


def parse_kafka_records(
    raw: DataFrame, value_schema: T.StructType, strict: bool = False
) -> DataFrame:
    """(key, value: binary, timestamp) → typed columns + ``ts``.

    The Kafka record timestamp becomes the event-time column (reference:
    context().timestamp(), ClickstreamJoinExample.scala:334).

    ``strict=True`` is the ``FailOnInvalidTimestamp`` analog
    (Kafka.scala:35,45,84 — the reference CRASHES on records it cannot
    interpret): FAILFAST parsing kills the job on a malformed payload
    instead of silently flowing NULL fields downstream (the PERMISSIVE
    default yields a struct of NULLs, which callers can assert on).
    """
    options = {"mode": "FAILFAST"} if strict else {}
    parsed = raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(
            F.col("value").cast("string"), value_schema, options
        ).alias("v"),
        F.col("timestamp").alias("ts"),
    )
    return parsed.select("key", "v.*", "ts")


def kafka_sink_payload(df: DataFrame, key_col: str) -> DataFrame:
    """The sink's wire shape: (key: string, value: JSON string).

    Factored out of ``kafka_sink`` so the payload contract is testable
    without a broker: the round-trip
    ``parse_kafka_records(kafka_sink_payload(df))`` must reproduce df
    (the contract test pins this, including NULL fields — ``to_json``
    omits them, ``from_json`` restores them as NULLs).
    """
    payload_cols = [c for c in df.columns if c != key_col]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )


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
    out = kafka_sink_payload(df, key_col)
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


# --- scripted generators (S6: the reference's designed test fixtures) -----

#: Schema of the deduplication generator's records.
DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

#: Page-view / event schemas of the clickstream generator.
CLICK_PV_SCHEMA = T.StructType(
    [
        T.StructField("client_id", T.StringType()),
        T.StructField("pv_id", T.StringType()),
        T.StructField("pv_value", T.StringType()),
        T.StructField("pv_ts", T.TimestampType()),
    ]
)
CLICK_EV_SCHEMA = T.StructType(
    [
        T.StructField("client_id", T.StringType()),
        T.StructField("pv_id", T.StringType()),
        T.StructField("ev_id", T.StringType()),
        T.StructField("ev_value", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def _at(epoch: _dt.datetime, seconds: float) -> _dt.datetime:
    return epoch + _dt.timedelta(seconds=seconds)


def scripted_duplicates(epoch: _dt.datetime = _EPOCH):
    """The reference's deduplication generator as data
    (DeduplicationExample.scala:70-94): one key sent at +0/+1/+3/+7 s
    (all within the 15 s window ⇒ only the first emits) and again at
    +17 s (window anchored at the last emission has expired ⇒ emits).
    Rows are (k, v, ts) matching ``DEDUP_SCHEMA``.
    """
    return [
        ("001", "v0", _at(epoch, 0.0)),
        ("001", "v1", _at(epoch, 1.0)),
        ("001", "v3", _at(epoch, 3.0)),
        ("001", "v7", _at(epoch, 7.0)),
        ("001", "v17", _at(epoch, 17.0)),
    ]


def scripted_clickstream(epoch: _dt.datetime = _EPOCH):
    """The reference's clickstream generator as data
    (ClickstreamJoinExample.scala:115-161): returns (page_views,
    events) row lists matching ``CLICK_PV_SCHEMA``/``CLICK_EV_SCHEMA``.

    Designed behaviors (comments at ClickstreamJoinExample.scala:126-158):
    impressions right after pv1 join; ev1 is double-sent (dedup
    fodder); a click 10 s later is still inside the 15 s join window;
    pv2's first event arrives *before* pv2 (out-of-order ⇒ unmatched
    under look-back semantics); "add to cart" comes 30 s after pv1 —
    outside the window, unmatched.
    """
    pvs = [
        ("bob", "pv1", "/", _at(epoch, 0.0)),
        ("bob", "pv2", "/offer?id=1234", _at(epoch, 10.2)),
    ]
    evs = [
        ("bob", "pv1", "ev0", "show header", _at(epoch, 0.1)),
        ("bob", "pv1", "ev1", "show ads", _at(epoch, 0.1)),
        ("bob", "pv1", "ev1", "show ads", _at(epoch, 0.1)),  # duplicate
        ("bob", "pv1", "ev2", "show recommendation", _at(epoch, 0.1)),
        ("bob", "pv1", "ev3", "click recommendation", _at(epoch, 10.1)),
        ("bob", "pv2", "ev0", "show header", _at(epoch, 10.1)),  # out-of-order
        ("bob", "pv1", "ev2", "add to cart", _at(epoch, 30.3)),  # late
    ]
    return pvs, evs


def stage_replayable_batches(spark: SparkSession, path: str, schema, batches):
    """Materialize scripted rows as one parquet file per micro-batch,
    mtime-ordered, so ``file_stream(..., max_files_per_trigger=1)``
    replays them as a deterministic stream — the brokerless analog of
    the reference's producer threads (Kafka.scala:89-92)."""
    import glob
    import os
    import shutil

    os.makedirs(path, exist_ok=True)
    for i, rows in enumerate(batches):
        f = os.path.join(path, f"batch_{i:03d}.parquet")
        tmp_dir = f + ".tmpdir"
        # Spark writes a directory; the file source wants plain files —
        # lift the single part file out.
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp_dir)
        [part] = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))
        os.rename(part, f)
        shutil.rmtree(tmp_dir)
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))


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
