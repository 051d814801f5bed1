"""Source-format coverage: the engine's tables round-trip through CSV
and JSON files with explicit schemas (no inference — at 100 TB schema
inference is an extra full pass and a correctness hazard), and the
strict Kafka parse path crashes on malformed payloads exactly like the
reference's FailOnInvalidTimestamp extractor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from example_kafkastreams_spark.catalog import load_table
from example_kafkastreams_spark.streaming.sources import parse_kafka_records
from tests.conftest import SMOKE

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _events_subset(spark):
    return (
        load_table(spark, SMOKE, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(500)
    )


def _assert_same(a, b):
    ra = [tuple(r) for r in a.orderBy("event_id").collect()]
    rb = [tuple(r) for r in b.orderBy("event_id").collect()]
    assert ra == rb


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    df = _events_subset(spark)
    path = str(tmp_path / "events_csv")
    df.write.mode("overwrite").option("header", True).option(
        "timestampFormat", TS_FMT
    ).csv(path)
    back = (
        spark.read.schema(df.schema)
        .option("header", True)
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )
    assert back.schema == df.schema
    _assert_same(df, back)


def test_json_roundtrip_explicit_schema(spark, tmp_path):
    df = _events_subset(spark)
    path = str(tmp_path / "events_json")
    df.write.mode("overwrite").option("timestampFormat", TS_FMT).json(path)
    back = (
        spark.read.schema(df.schema)
        .option("timestampFormat", TS_FMT)
        .json(path)
    )
    assert back.schema == df.schema
    _assert_same(df, back)


def test_strict_parse_crashes_on_malformed(spark):
    schema = T.StructType([T.StructField("pv_id", T.StringType())])
    raw_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )
    import datetime as dt

    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    ok = spark.createDataFrame([(b"k", b'{"pv_id": "a"}', ts)], raw_schema)
    bad = spark.createDataFrame([(b"k", b"not json {", ts)], raw_schema)

    assert parse_kafka_records(ok, schema, strict=True).count() == 1
    # lenient: NULL fields flow through (caller asserts); strict: crash
    assert parse_kafka_records(bad, schema).collect()[0].pv_id is None
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        parse_kafka_records(bad, schema, strict=True).collect()


def test_orc_roundtrip(spark, tmp_path):
    """ORC round-trips bit-exactly with types preserved (it is
    Spark-native like parquet — no schema handed in, the file carries
    it), and the columnar format serves predicate pushdown: the plan
    shows a PushedFilters entry for a value filter."""
    src = _events_subset(spark)
    path = str(tmp_path / "events_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    _assert_same(src, back)

    plan = (
        back.filter(F.col("value") > 100.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "value" in plan.split(
        "PushedFilters:"
    )[1][:120]
